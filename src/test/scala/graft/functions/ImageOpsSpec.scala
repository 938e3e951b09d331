package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.ImageGen

class ImageOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val imgs = ImageGen.table(spark, 120, 4).toDF().cache()

  test("decodeMeta: distributed decode matches stored metadata") {
    val metas = ImageFunctions.decodeMeta(imgs).collect()
    assert(metas.length === 120)
    val src = imgs.select("image_id", "w", "h", "fmt", "phash")
      .as[(String, Int, Int, String, Long)].collect().map(r => r._1 -> r).toMap
    metas.foreach { m =>
      val (_, w, h, fmt, ph) = src(m.image_id)
      assert(m.ok)
      assert(m.w === w && m.h === h)
      assert(m.fmt_sniffed === fmt, s"${m.image_id}: sniffed ${m.fmt_sniffed} want $fmt")
      assert(m.phash === ph)
    }
  }

  test("thumbnails: 8x8 PNG, deterministic across runs") {
    val t1 = ImageFunctions.thumbnails(imgs).collect().map(t => t.image_id -> t.bytes.toSeq).toMap
    val t2 = ImageFunctions.thumbnails(imgs).collect().map(t => t.image_id -> t.bytes.toSeq).toMap
    assert(t1 === t2)
    val one = ImageGen.decode(t1("img_0000000003").toArray)
    assert(one.getWidth === 8 && one.getHeight === 8)
  }

  test("extractFeatures: sane ranges; identical content -> identical dhash") {
    val f = ImageFunctions.extractFeatures(imgs).collect()
    assert(f.length === 120)
    f.foreach { x =>
      assert(x.mean_r >= 0 && x.mean_r <= 255)
      assert(x.mean_g >= 0 && x.mean_g <= 255)
      assert(x.mean_b >= 0 && x.mean_b <= 255)
    }
    val again = ImageFunctions.extractFeatures(imgs).collect()
    assert(f.map(x => x.image_id -> x.dhash).toMap === again.map(x => x.image_id -> x.dhash).toMap)
    // gradient direction is identical for all generated images -> similar dhash
    // but phash-distinct content must not produce all-equal features
    assert(f.map(_.mean_b).distinct.length > 10)
  }

  test("DCT pHash: planted PNG/JPEG pairs near, distinct blocks far, exact banded retrieval") {
    val blocks = ImageGen.blockTable(spark, 60)
    val ph = ImageFunctions.dctHashes(blocks).collect()
      .map(r => r.image_id -> r.phash_dct).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val intra = (0 until 60).map(i => ham(ph(f"blk_$i%06d_o"), ph(f"blk_$i%06d_v")))
    val inter = (0 until 59).map(i => ham(ph(f"blk_$i%06d_o"), ph(f"blk_${i + 1}%06d_o")))
    assert(intra.max <= 4, s"recompression noise should stay tiny, max=${intra.max}")
    assert(inter.min > 10, s"distinct blocks must stay far, min=${inter.min}")
    // banded retrieval at the tight radius returns EXACTLY the planted pairs
    val pairs = graft.operators.Dedup.imageNearDup(blocks, maxHamming = 4, algo = "phash")
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    val want = (0 until 60).map(i => (f"blk_$i%06d_o", f"blk_$i%06d_v")).toSet
    assert(pairs === want)
  }

  test("verifyPayload: all generated rows pass; corrupted caption fails") {
    val checks = ImageFunctions.verifyPayload(imgs).collect()
    assert(checks.length === 120 && checks.forall(_.pass))
    val corrupted = imgs.withColumn("caption",
      when(col("image_id") === "img_0000000007", lit("tampered")).otherwise(col("caption")))
    val c2 = ImageFunctions.verifyPayload(corrupted).collect()
    assert(c2.count(!_.pass) === 1)
    assert(c2.find(!_.pass).get.image_id === "img_0000000007")
  }

  test("AV feature stub: deterministic, marked stubbed, real distributed plumbing") {
    val f1 = ImageFunctions.extractAvFeatures(imgs).collect()
    val f2 = ImageFunctions.extractAvFeatures(imgs.repartition(7)).collect()
    assert(f1.map(x => x.media_id -> x.fingerprint).toMap === f2.map(x => x.media_id -> x.fingerprint).toMap)
    assert(f1.forall(_.stubbed))
    assert(f1.forall(x => x.duration_s >= 0 && x.duration_s < 30))
  }

  test("frame sampling stub: 1→N fan-out, deterministic across partitioning, bounded") {
    val fps = 2.0
    val a = ImageFunctions.sampleFrames(imgs, fps = fps).collect()
    val b = ImageFunctions.sampleFrames(imgs.repartition(7), fps = fps).collect()
    // the fan-out is a pure function of the payload — identical rows (incl.
    // frame bytes) under any partitioning
    def key(s: ImageFunctions.SampledFrame) = (s.media_id, s.frame_idx)
    assert(a.map(s => key(s) -> s.frame.toSeq).toMap === b.map(s => key(s) -> s.frame.toSeq).toMap)
    // frame count per media = min(maxFrames, max(1, floor(duration*fps)))
    val durations = ImageFunctions.extractAvFeatures(imgs).collect()
      .map(f => f.media_id -> f.duration_s).toMap
    val counts = a.groupBy(_.media_id).view.mapValues(_.length)
    assert(counts.forall { case (id, n) =>
      n == math.min(64, math.max(1, math.floor(durations(id) * fps).toInt)) })
    // frame indices are dense 0..n-1 with ts = idx/fps; all marked stubbed
    assert(a.forall(s => s.ts_s == s.frame_idx / fps && s.stubbed))
    assert(a.groupBy(_.media_id).values.forall { fs =>
      fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length) })
    // distinct frames within one media (the fake varies by index)
    assert(a.groupBy(_.media_id).values.forall { fs =>
      fs.map(_.frame.toSeq).distinct.length == fs.length })
  }

  test("FrameDecoder seam: a custom decoder drops in without changing the job shape") {
    // a 3-second fixed-duration "decoder" that derives frames from the raw
    // payload head — stands in for a real codec-backed implementation and
    // proves the production boundary is the `decoder` argument only
    object FixedDecoder extends ImageFunctions.FrameDecoder {
      override def stubbed: Boolean = false
      override def probe(id: String, bytes: Array[Byte]): ImageFunctions.AvProbe =
        ImageFunctions.AvProbe(3.0, -20.0, bytes.length.toLong)
      override def frameAt(p: ImageFunctions.AvProbe, bytes: Array[Byte],
                           idx: Int, tsS: Double): Array[Byte] =
        bytes.slice(idx, idx + 4)
    }
    val fs = ImageFunctions.sampleFrames(imgs, fps = 1.0, decoder = FixedDecoder).collect()
    assert(fs.forall(!_.stubbed))
    assert(fs.groupBy(_.media_id).values.forall(_.length == 3)) // floor(3.0 * 1.0)
    val feats = ImageFunctions.extractAvFeatures(imgs, decoder = FixedDecoder).collect()
    assert(feats.forall(f => f.duration_s == 3.0 && !f.stubbed))
  }

  test("imageGateColumns: each gate fires independently; null caption safe; scan-local") {
    val rows = Seq(
      ("ok", 512, 512, "png", 512 * 512 * 3L, "a fine caption"),
      ("small", 32, 512, "png", 512 * 32 * 3L, "a fine caption"),
      ("aspect", 900, 128, "jpeg", 900 * 128 * 3L, "a fine caption"),
      ("thumb", 512, 512, "jpeg", 1000L, "a fine caption"),
      ("badfmt", 512, 512, "bmp", 512 * 512 * 3L, "a fine caption"),
      ("nocap", 512, 512, "png", 512 * 512 * 3L, "   "),
      ("nullcap", 512, 512, "png", 512 * 512 * 3L, null: String),
      ("longcap", 512, 512, "png", 512 * 512 * 3L,
        (1 to 200).map("w" + _).mkString(" "))
    ).toDF("id", "w", "h", "fmt", "n_bytes", "caption")
    val q = rows.select(col("id") +: ImageFunctions.imageGateColumns(
      col("w"), col("h"), col("fmt"), col("n_bytes"), col("caption")): _*)
    val m = q.collect().map(r => r.getString(0) -> r).toMap
    assert(m("ok").getAs[Boolean]("keep"))
    assert(!m("small").getAs[Boolean]("res_ok"))
    assert(m("aspect").getAs[Boolean]("res_ok") && !m("aspect").getAs[Boolean]("aspect_ok"))
    assert(!m("thumb").getAs[Boolean]("bpp_ok"))
    assert(!m("badfmt").getAs[Boolean]("fmt_ok") && m("badfmt").getAs[Boolean]("bpp_ok"))
    assert(!m("nocap").getAs[Boolean]("caption_ok"))
    assert(!m("nullcap").getAs[Boolean]("caption_ok"), "null caption must gate, not NPE")
    assert(!m("longcap").getAs[Boolean]("caption_ok"), "token bound is inclusive-max")
    Seq("small", "aspect", "thumb", "badfmt", "nocap", "nullcap", "longcap")
      .foreach(id => assert(!m(id).getAs[Boolean]("keep"), id))
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"metadata gates must be scan-local:\n$plan")
  }
}
