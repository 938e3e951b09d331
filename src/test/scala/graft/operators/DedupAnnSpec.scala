package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup: groups hash collisions correctly; keeper is min id") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    val got = Dedup.exact(d).select("keeper", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 1L)))
  }

  test("crossSourceDupMatrix: unordered source pairs, diagonal = within-source, totals match") {
    val d = Seq(
      (1L, "alpha bravo charlie delta echo", "beta"),
      (2L, "alpha bravo charlie delta echo", "alpha"),   // cross-source dup of 1
      (3L, "alpha bravo charlie delta echo", "beta"),    // within-beta dup of 1, cross of 2
      (4L, "zulu yankee xray whiskey victor", "gamma")   // no dup
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(d)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("alpha", "beta", 2L), ("beta", "beta", 1L)))
    // totals: matrix mass == raw pair count, regardless of labelling
    val nPairs = Dedup.lshPairs(d.select($"doc_id", $"text")).count()
    assert(got.toSeq.map(_._3).sum === nPairs)
  }

  test("containmentPairs: subset scores 1.0 where the jaccard gate would discard it") {
    val a = (1 to 8).map(i => s"q$i").mkString(" ")
    val b = a + " " + (0 until 10).map(i => s"z0_$i").mkString(" ")
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // jaccard = 8/18 ≈ 0.44 — below the 0.5 lshPairs gate
    assert(Dedup.lshPairs(d).count() === 0L)
    val got = Dedup.containmentPairs(d).as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)), s"subset must score containment 1.0: $got")
    // symmetric near-identical pair still scores (containment ⊇ jaccard hits)
    val e = Seq((1L, a), (2L, a + " tail")).toDF("doc_id", "text")
    val both = Dedup.containmentPairs(e).as[(Long, Long, Double)].collect()
    assert(both.nonEmpty && both.head._3 === 1.0)
  }

  test("multimodalDupPairs: a pair must agree in BOTH modalities") {
    val rows = Seq(
      (1L, "alpha bravo charlie delta echo", 0x0L),
      (2L, "alpha bravo charlie delta echo", 0x3L),     // text dup, hamming 2 → kept
      (3L, "alpha bravo charlie delta echo", 0xFFFFFL), // text dup, hamming 20/18 → cut
      (4L, "zulu yankee xray whiskey victor", 0x0L)     // sig match, text differs → no candidate
    ).toDF("doc_id", "text", "phash")
    val got = Dedup.multimodalDupPairs(rows, "doc_id", "text", "phash")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 2)))
  }

  test("shingles: sliding 3-grams, short docs empty") {
    val d = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a b c", "b c d", "c d e"))
    assert(got(2L) === Seq.empty)
  }

  test("minhash LSH pairs ⊇ all true near-dup pairs at jaccard >= 0.8 (recall on planted dups)") {
    // plant near-duplicates: copy docs with 1 word changed
    val base = docs.limit(60).as[(Long, String, String, String, Long)].collect()
      .map(r => (r._1, r._2))
    val planted = base.map { case (id, t) =>
      val w = t.split(" ")
      w(w.length / 2) = "MUTATED"
      (id + 100000L, w.mkString(" "))
    }
    val all = (base ++ planted).toSeq
    val df = all.toDF("doc_id", "text")
    val got = Dedup.lshPairs(df, minJaccard = 0.5)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect().toSet
    val want = Dedup.bruteForceJaccard(all, 0.5)
    // LSH candidates verified with exact jaccard must equal brute force whenever
    // a pair shares at least one minhash band; for planted dups (jac ~0.95+)
    // band collision probability is ~1 — require full recall on those
    val plantedPairs = want.filter { case (a, b, j) => b - a == 100000L && j >= 0.8 }
    assert(plantedPairs.nonEmpty)
    assert(plantedPairs.subsetOf(got), "missed planted near-duplicates")
    // and NO false positives below the threshold
    assert(got.forall(_._3 >= 0.5))
    // verified pairs must carry exact jaccard values
    got.foreach { case (a, b, j) =>
      val wj = want.find(w => w._1 == a && w._2 == b)
      wj.foreach(w => assert(math.abs(w._3 - j) < 1e-12))
    }
  }

  test("lshPairsWeighted: boilerplate-only twins drop, content twins survive") {
    // 10 content-twin pairs (12 shared content tokens + 3 unique each), every
    // doc carrying the same 20-token site template: under plain Jaccard a
    // cross pair scores 18/48 = 0.375 (template-only), under rarity weights
    // (template df = all docs -> w = 1; content df = 2 -> w = 10) it
    // collapses to ~0.05 while twins keep ~0.53
    val boiler = "the terms of service apply all rights reserved copyright" +
      " example corp contact us at example dot com for more info"
    val docs = (0 until 10).flatMap { i =>
      val shared = (1 to 12).map(k => s"c${i}x$k").mkString(" ")
      Seq((2L * i, s"$shared a${i}p1 a${i}p2 a${i}p3 $boiler"),
        (2L * i + 1, s"$shared b${i}p1 b${i}p2 b${i}p3 $boiler"))
    }.toDF("doc_id", "text")
    val twins = (0 until 10).map(i => (2L * i, 2L * i + 1)).toSet
    // plain verify at 0.3 admits template-only cross pairs (deterministic
    // md5 fixture: at least some cross pairs band-collide)
    val plain = Dedup.lshPairs(docs, minJaccard = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(twins.subsetOf(plain))
    assert((plain -- twins).nonEmpty, "fixture must produce template-only candidates")
    // weighted verify keeps EXACTLY the content twins
    val weighted = Dedup.lshPairsWeighted(docs, minWeightedJaccard = 0.5)
      .as[(Long, Long, Double, Double)].collect()
    assert(weighted.map(r => (r._1, r._2)).toSet === twins)
    weighted.foreach { case (a, b, jac, wjac) =>
      assert(wjac > 0.5 && wjac < 0.6, s"($a,$b) wjac=$wjac")
      assert(jac > wjac, "template tokens inflate the plain score")
    }
    // partitioning invariance (exact long sums, order-free)
    val repart = Dedup.lshPairsWeighted(docs.repartition(7), minWeightedJaccard = 0.5)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(repart === weighted.toSet)
  }

  test("banded minhash (16×4): recall follows the 1-(1-j^r)^b S-curve on planted pairs") {
    // planted pairs with EXACT token-set Jaccard (ngram=1 → shingles are the
    // tokens): s shared + d/d distinct per side → J = s/(s+2d); tokens are
    // pair-unique so no cross-pair collisions. Theory at (b=16, r=4):
    // J=0.5 → 0.64, J=0.7 → 0.988, J=0.9 → ~1. The md5-slice mode cannot
    // express this knob (4 single-perm bands); this is the production path.
    val levels = Seq((0.5, 30, 15), (0.7, 42, 9), (0.9, 54, 3))
    val nPairs = 100
    val rows = levels.zipWithIndex.flatMap { case ((_, s, d), li) =>
      (0 until nPairs).flatMap { i =>
        val tag = s"l${li}p$i"
        val shared = (0 until s).map(k => s"${tag}s$k")
        val xs = (0 until d).map(k => s"${tag}x$k")
        val ys = (0 until d).map(k => s"${tag}y$k")
        val idA = li * 1000000L + i * 2L
        Seq((idA, (shared ++ xs).mkString(" ")), (idA + 1, (shared ++ ys).mkString(" ")))
      }
    }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.lshPairsBanded(df, bands = 16, rows = 4, ngram = 1, minJaccard = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // only planted pairs can pass the exact-Jaccard verify (cross-pair J = 0)
    assert(got.forall { case (a, b) => b == a + 1 && a % 2 == 0 })
    def recall(li: Int): Double =
      (0 until nPairs).count(i => got.contains((li * 1000000L + i * 2L, li * 1000000L + i * 2L + 1))) / nPairs.toDouble
    val (r05, r07, r09) = (recall(0), recall(1), recall(2))
    assert(r05 > 0.45 && r05 < 0.85, s"J=0.5 recall $r05 off the 0.64-theory band")
    assert(r07 >= 0.92, s"J=0.7 recall $r07 below the 0.988-theory band")
    assert(r09 >= 0.99, s"J=0.9 recall $r09 should be ~1")
    assert(r05 < r07 && r07 <= r09, "recall must be monotone in Jaccard")
    // multiprobe: leave-one-out slots lift per-band collision from j^r to
    // j^r + r·j^(r−1)(1−j) — at (16, 4) the J=0.5 recall moves from the
    // 0.64 band to 1−(1−0.3125)^16 ≈ 0.9975, at unchanged hashing cost
    val gotMp = Dedup.lshPairsBanded(df, bands = 16, rows = 4, ngram = 1,
        minJaccard = 0.4, multiprobe = true)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(gotMp.forall { case (a, b) => b == a + 1 && a % 2 == 0 },
      "exact-Jaccard verify must still reject cross-pair candidates")
    assert(got.subsetOf(gotMp), "multiprobe candidates must be a superset")
    def recallMp(li: Int): Double =
      (0 until nPairs).count(i =>
        gotMp.contains((li * 1000000L + i * 2L, li * 1000000L + i * 2L + 1))) / nPairs.toDouble
    val m05 = recallMp(0)
    assert(m05 >= 0.95, s"multiprobe J=0.5 recall $m05 below the ~0.9975-theory band")
    assert(m05 > r05, "multiprobe must lift J=0.5 recall over the plain banding")
    assert(recallMp(1) >= 0.99 && recallMp(2) >= 0.99)
  }

  test("contamination: hit fractions vs hand oracle; dirty docs (null/short text) report zeros") {
    val trainDocs = Seq[(java.lang.Long, String)](
      (1L, "a b c d"), // shingles {a b c, b c d}; "a b c" is in the eval set
      (2L, "a b"),     // too short for a 3-gram
      (3L, null)       // null text
    ).toDF("doc_id", "text")
    val evalDocs = Seq((10L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.contamination(trainDocs, evalDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((0L, 0L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("contaminationExact: planted verbatim passages flagged; near-miss and mid-token not") {
    // exactly 8 tokens → exactly ONE passage (= the whole eval text), so
    // each train doc exercises exactly one branch of the contract
    val evalDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy"))
      .toDF("doc_id", "text")
    val trainDocs = Seq[(java.lang.Long, String)](
      // contains the 8-token passage verbatim (token-aligned) → hit
      (1L, "intro words the quick brown fox jumps over the lazy trailing"),
      // shares the anchor 3-gram (candidate!) but diverges before token 8 →
      // the substring verify rejects it
      (2L, "the quick brown fox jumps over the hungry dog tonight"),
      // anchor contract: the passage appears only at a mid-token offset
      // ("wordsthe quick…" has no token-aligned "the quick brown" 3-gram)
      // → never a candidate, not flagged on either engine
      (3L, "wordsthe quick brown fox jumps over the lazy"),
      (4L, "completely unrelated content about something else entirely okay"),
      (5L, null),
      (6L, "a b") // too short for an anchor gram
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationExact(trainDocs, evalDocs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, false)))
    assert(got(3L)._2 === false,
      "mid-token occurrence must not be a hit (token-aligned anchor contract)")
    assert(got(4L) === ((0L, false)))
    assert(got(5L) === ((0L, false)))
    assert(got(6L) === ((0L, false)))
  }

  test("paragraphDedup: first occurrence survives, duplicates removed, order preserved") {
    val docs = Seq[(java.lang.Long, String)](
      (5L, "unique five\nshared boilerplate\nanother five"),
      (2L, "first two\nshared boilerplate\nsecond two"), // min doc → keeps it
      (7L, "shared boilerplate"), // loses its ONLY paragraph → empty text
      (9L, "solo paragraph"),
      (11L, null),
      // blank lines are STRUCTURE: every doc keeps its separators even
      // though the empty paragraph "duplicates" corpus-wide
      (13L, "alpha thirteen\n\nbeta thirteen"),
      (15L, "gamma fifteen\n\ndelta fifteen")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getLong(3))).toMap
    assert(got(2L) === (("first two\nshared boilerplate\nsecond two", 3, 3L)))
    assert(got(5L) === (("unique five\nanother five", 3, 2L)),
      "duplicate paragraph must vanish while order is preserved")
    assert(got(7L) === (("", 1, 0L)), "all-duplicate doc keeps empty text")
    assert(got(9L) === (("solo paragraph", 1, 1L)))
    // null text == "" == one blank paragraph — structural, kept
    assert(got(11L) === (("", 1, 1L)))
    assert(got(13L) === (("alpha thirteen\n\nbeta thirteen", 3, 3L)),
      "blank separators must survive in every doc, not just the first")
    assert(got(15L) === (("gamma fifteen\n\ndelta fifteen", 3, 3L)))
  }

  test("repetition columns: null text reports (0, 0, 0.0), repeated grams counted") {
    val docs = Seq[(java.lang.Long, String)](
      (1L, "x y x y x y x y"), // 6 grams, 2 distinct -> rep 2/3
      (2L, null)
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id") +:
        graft.functions.TextFunctions.repetitionColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((6L, 2L, 1.0 - 2.0 / 6.0)))
    assert(got(2L) === ((0L, 0L, 0.0)))
  }

  test("simhash columnar expression ≡ scalar kernel") {
    // collect ONE limited sample and derive both sides from it — an
    // unordered limit() run twice may pick different row subsets
    val sample = docs.limit(50).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val viaExpr = Dedup.simhash(sample.toSeq.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    sample.foreach { case (id, t) =>
      assert(viaExpr(id) === Dedup.simhash64(t), s"doc $id drifted")
    }
  }

  test("simhash: identical docs distance 0; near-dups small; random docs large") {
    val a = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again")
    val b = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again")
    assert(a === b)
    val c = Dedup.simhash64("the quick brown fox jumps over the lazy cat again and again")
    assert(java.lang.Long.bitCount(a ^ c) <= 16, "near-dup should be close in hamming")
    val d = Dedup.simhash64("completely unrelated words talking about database engines")
    assert(java.lang.Long.bitCount(a ^ d) > 10, "unrelated should be far")
  }

  test("simhashPairs: pigeonhole banding finds ALL pairs within maxHamming") {
    // synthetic signatures with controlled hamming distances
    val sigs = Seq(
      (1L, 0x0123456789abcdefL),
      (2L, 0x0123456789abcdeeL), // hamming 1 from #1
      (3L, 0x0123456789abcd00L), // hamming ~6 from #1
      (4L, 0xfedcba9876543210L))
    val df = sigs.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(df, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got === want)
    assert(want === Set((1L, 2L, 1)))
  }

  test("ANN brute-force top-k == driver oracle on real embeddings table") {
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 100 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val got = AnnSearch.bruteTopK(embs, probes, k = 5)
      .select("probe_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val want = AnnSearch.bruteForce(table, probeRows, 5)
    assert(got === want)
  }

  test("ANN LSH top-k: recall@5 >= 0.6 vs brute force (uniform-random worst case)") {
    // the driver embeddings are uniform random (true top-5 cosine ≈ 0.32), the
    // hardest case for LSH: per-plane collision p ≈ 0.60, so recall per band
    // = p^planes; planes=4, bands=12 → expected recall ≈ 1-(1-0.133)^12 ≈ 0.82.
    // On near-dup-bearing data (cos ≥ 0.95, the dedup use case) a single
    // 8-plane band already collides with p ≈ 0.66 — see the near-dup test.
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 50 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val got = AnnSearch.lshTopK(embs, probes, k = 5, dim = 64, planes = 4, bands = 12)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = AnnSearch.bruteForce(table, probeRows, 5).map(t => (t._1, t._2))
    val recall = want.count(got.contains).toDouble / want.size
    assert(recall >= 0.6, s"recall=$recall")
    // multiprobe (flip each sign bit once, probe side only) strictly widens
    // the candidate set -> recall must not drop, and on this worst-case
    // fixture it should clearly improve
    val gotMp = AnnSearch.lshTopK(embs, probes, k = 5, dim = 64, planes = 4, bands = 12,
        multiprobe = true)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recallMp = want.count(gotMp.contains).toDouble / want.size
    assert(recallMp >= recall, s"multiprobe recall=$recallMp < single recall=$recall")
    assert(recallMp >= 0.8, s"multiprobe recall=$recallMp")
  }

  test("IVF ANN top-k: recall@5 >= 0.5 at nprobe/nlist = 1/4 cost") {
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 50 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val got = AnnSearch.ivfTopK(embs, probes, k = 5, nlist = 16, nprobe = 4)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = AnnSearch.bruteForce(table, probeRows, 5).map(t => (t._1, t._2))
    val recall = want.count(got.contains).toDouble / want.size
    assert(recall >= 0.5, s"recall=$recall") // uniform-random embeddings: hardest case
    // determinism: same result twice
    val again = AnnSearch.ivfTopK(embs, probes, k = 5, nlist = 16, nprobe = 4)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === got)
  }

  test("PQ kernels: encode is per-subspace argmin, ADC equals the naive table sum") {
    import org.apache.spark.sql.graft.PqCodebooks
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // m=2 subspaces of dsub=2, ksub=3 hand-built codebooks
    val books = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(5.0, 5.0)),
      Array(Array(0.0, 1.0), Array(2.0, 2.0), Array(9.0, 0.0)))
    val pq = new PqCodebooks(2, 3, 2, books)
    def arr(xs: Double*) = new GenericArrayData(xs.toArray)
    val v = arr(0.9, 1.2, 8.5, 0.4) // sub0 → centroid 1, sub1 → centroid 2
    val code = pq.encode(v, isFloat = false)
    assert(code.toSeq === Seq(1.toByte, 2.toByte))
    val q = arr(1.0, 0.0, 3.0, 3.0)
    val lut = pq.lut(q, isFloat = false)
    // naive: ||q_s - centroid||² per (s, c)
    val naive = for (s <- 0 until 2; c <- 0 until 3) yield {
      val off = s * 2
      (0 until 2).map(i => math.pow(Seq(1.0, 0.0, 3.0, 3.0)(off + i) - books(s)(c)(i), 2)).sum
    }
    assert((0 until 6).map(lut.getDouble) === naive)
    val adc = org.apache.spark.sql.graft.PqKernels.adc(code, lut)
    assert(adc === naive(1) + naive(5)) // code picks (s0,c1) and (s1,c2)
  }

  test("PQ ANN: rerank recall@5 >= 0.6 vs brute force; ADC path deterministic") {
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 50 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val want = AnnSearch.bruteForce(table, probeRows, 5).map(t => (t._1, t._2))
    // two-stage: ADC shortlist of 50 (10% of the table), exact cosine re-rank
    val got = AnnSearch.pqTopK(embs, probes, k = 5, m = 8, ksub = 16, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = want.count(got.contains).toDouble / want.size
    assert(recall >= 0.6, s"recall=$recall") // uniform-random: hardest case for PQ
    // probes are table rows: the probe's own vector has ADC = its quantization
    // error (small) and exact cos = 1 → must be its own rank-1 hit
    val self = AnnSearch.pqTopK(embs, probes, k = 1, m = 8, ksub = 16, rerank = 50)
      .where(col("rnk") === 1).select("probe_id", "vec_id")
      .as[(Long, Long)].collect()
    val selfHit = self.count(t => t._1 == t._2).toDouble / probeRows.size
    assert(selfHit >= 0.9, s"self-hit fraction $selfHit")
    // codes-only ADC path: content-derived end to end → rerun-identical
    val a1 = AnnSearch.pqTopK(embs, probes, k = 5, m = 8, ksub = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    val a2 = AnnSearch.pqTopK(embs, probes, k = 5, m = 8, ksub = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a1 === a2 && a1.nonEmpty)
  }

  test("IVF-PQ ANN: residual codes + list pruning; recall within the IVF bound; deterministic") {
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 50 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val want = AnnSearch.bruteForce(table, probeRows, 5).map(t => (t._1, t._2))
    val got = AnnSearch.ivfPqTopK(embs, probes, k = 5, nlist = 16, nprobe = 4,
        m = 8, ksub = 16, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = want.count(got.contains).toDouble / want.size
    // candidates are capped by the coarse quantizer's nprobe/nlist pruning
    // (the exact-scored IVF test pins >= 0.5 on this uniform-random worst
    // case); the PQ shortlist + exact re-rank should not lose much more
    assert(recall >= 0.4, s"recall=$recall")
    // the exact-scored IVF path is this operator's recall CEILING — the PQ
    // stage can only lose candidates within the visited lists
    val ivfExact = AnnSearch.ivfTopK(embs, probes, k = 5, nlist = 16, nprobe = 4)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfRecall = want.count(ivfExact.contains).toDouble / want.size
    assert(recall <= ivfRecall + 1e-9,
      s"IVF-PQ recall $recall cannot exceed its exact-scored ceiling $ivfRecall")
    // rerun-identical (content-derived end to end)
    val again = AnnSearch.ivfPqTopK(embs, probes, k = 5, nlist = 16, nprobe = 4,
        m = 8, ksub = 16, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === got)
  }

  test("IVF-PQ multiprobe: margin probes beat single-probe recall at equal nprobe") {
    val table = embs.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val probeRows = table.filter(_._1 % 25 == 0)
    val probes = probeRows.toDF("probe_id", "pvec")
    val want = AnnSearch.bruteForce(table, probeRows, 5).map(t => (t._1, t._2))
    def recall(mp: Boolean) = {
      val got = AnnSearch.ivfPqTopK(embs, probes, k = 5, nlist = 16, nprobe = 1,
          m = 8, ksub = 16, rerank = 50, multiprobe = mp)
        .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
      want.count(got.contains).toDouble / want.size
    }
    val (sp, mp) = (recall(false), recall(true))
    // with rerank >= k the multiprobe candidate set is a strict superset per
    // probe (same home lists + margin extras), so recall is monotone; at
    // nprobe=1 on uniform-random vectors the boundary extras must also
    // recover a measurable share of cross-boundary neighbors
    assert(mp >= sp, s"multiprobe recall $mp < single $sp")
    assert(mp > sp + 0.05, s"margin probes must measurably lift recall: $sp -> $mp")
    // deterministic
    assert(recall(true) === mp)
  }

  test("typedParse: reference ClazzUtils sniffing cascade semantics") {
    import graft.functions.TextFunctions.typedParse
    val d = Seq("true", "FALSE", "x", "7", "4711", "123456", "9999999999",
      "3.14", "2,5", "2020-01-02 03:04:05", "hello world", "-42")
      .toDF("s").select(col("s"), typedParse(col("s")).as("t"))
      .select(col("s"), col("t.kind"), col("t.bool_v"), col("t.long_v"), col("t.double_v"))
    val m = d.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("true") === "boolean" && m("FALSE") === "boolean")
    assert(m("x") === "char")
    assert(m("7") === "byte")      // narrowest-type rule, ClazzUtils.java:88-142
    assert(m("4711") === "short")
    assert(m("123456") === "int")
    assert(m("9999999999") === "long")
    assert(m("-42") === "byte")
    assert(m("3.14") === "double" && m("2,5") === "double")
    assert(m("2020-01-02 03:04:05") === "timestamp")
    assert(m("hello world") === "string")
    val vals = d.collect().map(r => r.getString(0) ->
      (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(vals("true")._1.contains(true))
    assert(vals("4711")._2.contains(4711L))
    assert(vals("2,5")._3.contains(2.5))
  }

  test("image near-dup: banded dHash pairs == brute force; planted png/jpeg pairs recovered") {
    import spark.implicits._
    val imgs = graft.sources.ImageGen.blockTable(spark, 40)
    val got = Dedup.imageNearDup(imgs, maxHamming = 10)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    // completeness oracle: driver-side popcount over the collected signatures
    val sigs = graft.functions.ImageFunctions.extractFeatures(imgs)
      .select("image_id", "dhash").as[(String, Long)].collect()
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (ia, ib)).toSet
    assert(got === want)
    // every planted (png original, jpeg re-encode) pair is within threshold
    (0 until 40).foreach { i =>
      assert(got.contains((f"blk_$i%06d_o", f"blk_$i%06d_v")), s"missing planted pair $i")
    }
    // distinct source images never collide (fixture has ~32-bit expected distance)
    assert(got.size === 40)
  }

  test("connectedComponents == union-find on random pair graphs (+ a long chain)") {
    val rnd = new scala.util.Random(5)
    // random sparse graph + a 40-node path (forces many propagation rounds)
    // + self-loop pairs: node 2000 appears ONLY as (2000, 2000) and must
    // still be labelled root=self; node 0 is self-paired AND in real edges
    val pairs: Seq[(Long, Long)] =
      (0 until 150).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(p => p._1 != p._2) ++
      (1000L until 1040L).sliding(2).map(w => (w(1), w(0))).toSeq ++
      Seq((2000L, 2000L), (0L, 0L))
    // force the DISTRIBUTED star path (test graphs sit far below the
    // small-graph driver-fallback threshold) so the round bounds below
    // exercise the star iteration, not the union-find fast path
    spark.conf.set("spark.graft.cc.smallGraphMaxEdges", "0")
    val (labels, rounds) = try
      Dedup.connectedComponentsWithRounds(pairs.toDF("a", "b"))
    finally spark.conf.unset("spark.graft.cc.smallGraphMaxEdges")
    val got = labels.as[(Long, Long)].collect().toMap
    val want = Dedup.bruteComponents(pairs)
    assert(got === want)
    // the default (small-graph driver union-find) path is label-identical
    val (labelsSmall, roundsSmall) = Dedup.connectedComponentsWithRounds(pairs.toDF("a", "b"))
    assert(roundsSmall === 0, "small graph should take the driver union-find path")
    assert(labelsSmall.as[(Long, Long)].collect().toMap === want)
    // the point of large-star/small-star: round count scales with log n,
    // NOT with component diameter — the 40-node path (diameter 39) would
    // take 39+ label-propagation rounds; 2·log₂(40) ≈ 11 bounds the stars
    // (+1 for the convergence-detecting no-op round)
    assert(rounds <= 12, s"star CC took $rounds rounds on a 40-node chain (O(log n) broken)")
    // cluster summary: sizes per root match, chain collapses to one cluster
    val cs = Dedup.dupClusters(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val wantSizes = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(cs === wantSizes)
    assert(cs(1000L) === 40L)
    // both sides of the inter-pass-distinct threshold converge to identical
    // labels within the same round bound (the skip is a plan change only):
    // the default run above took the skip path (test graphs are far below
    // 2^22 edges); threshold 0 forces the always-distinct path
    spark.conf.set("spark.graft.cc.interDistinctMinEdges", "0")
    spark.conf.set("spark.graft.cc.smallGraphMaxEdges", "0")
    try {
      val (labels2, rounds2) = Dedup.connectedComponentsWithRounds(pairs.toDF("a", "b"))
      assert(labels2.as[(Long, Long)].collect().toMap === want)
      assert(rounds2 <= 12, s"always-distinct star CC took $rounds2 rounds")
    } finally {
      spark.conf.unset("spark.graft.cc.interDistinctMinEdges")
      spark.conf.unset("spark.graft.cc.smallGraphMaxEdges")
    }
  }

  test("embedding near-dup: planted duplicate vectors found") {
    val base = embs.limit(40).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val planted = base.map { case (id, v) =>
      val w = v.clone(); w(0) = w(0) + 0.001f // nearly identical
      (id + 10000L, w)
    }
    val df = (base ++ planted).toSeq.toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(df, minCosine = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val wantPairs = base.map { case (id, _) => (id, id + 10000L) }.toSet
    assert(wantPairs.subsetOf(got), s"missing ${wantPairs.diff(got).size} planted near-dup pairs")
  }

  test("langId kernel == declarative column formulation on the full documents table") {
    import spark.implicits._
    val both = docs.select(
      graft.functions.TextFunctions.langId(col("text")).as("fast"),
      graft.functions.TextFunctions.langIdDeclarative(col("text")).as("ref"))
    assert(both.where(col("fast") =!= col("ref")).count() === 0)
  }

  test("langId: detects crafted multilingual docs; token/quality/fingerprint stats") {
    val fixture = Seq(
      (1L, "the cat is in the house and it is warm with food for winter"),
      (2L, "der hund ist nicht zu haus und ich bin mit der katze"),
      (3L, "le chat est dans la maison et les oiseaux pour que dans"),
      (4L, "el gato es una casa los perros de la noche por con para"),
      (5L, "这 是 一个 测试 文档 我 有 和 不 人"),
      (6L, "zzz qqq vvv www uuu")).toDF("doc_id", "text")
    val got = fixture.select(col("doc_id"), graft.functions.TextFunctions.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en"); assert(got(2L) === "de"); assert(got(3L) === "fr")
    assert(got(4L) === "es"); assert(got(5L) === "zh"); assert(got(6L) === "und")
    val stats = graft.functions.TextFunctions.withTextStats(
      fixture.withColumnRenamed("text", "text")).collect()
    assert(stats.forall(r => r.getAs[Double]("quality") > 0 && r.getAs[Double]("quality") <= 1))
    assert(stats.forall(r => r.getAs[String]("fp16").length == 16))
  }

  test("semanticDedup: planted duplicates collapse; within-cluster pairs == brute force; deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val planted = e.where(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(slice(transform(col("embedding"), v => v + lit(0.001f)), 1, 1),
          slice(col("embedding"), 2, 1000)).as("embedding"))
    val all = e.unionByName(planted)
    val out = Dedup.semanticDedup(all, minCosine = 0.999, nlist = 16)
    val rows = out.as[(Long, Long, Long, Boolean, Boolean)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.length.toLong === all.count(), "one output row per input row")
    assert(!rows.exists(_._5), "no cluster should hit the cap at this scale")
    // every planted copy loses to its source (component-min keeper)
    val plantedIds = rows.map(_._1).filter(_ >= 1000000L)
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { p =>
      assert(!byId(p)._4, s"planted copy $p must not be kept")
      assert(byId(p)._3 === p - 1000000L, s"planted copy $p must root at its source")
      assert(byId(p - 1000000L)._4, s"source of $p must be the keeper")
    }
    // exhaustive within-cluster parity: a pair is connected iff same
    // cluster AND exact cosine >= threshold — replay on the driver
    val vecs = all.as[(Long, Array[Float])].collect().toMap
    val clusterOf = rows.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toArray.sorted
    val wantPairs = for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      if clusterOf(ids(i)) == clusterOf(ids(j)) &&
        cos(vecs(ids(i)), vecs(ids(j))) >= 0.999
    } yield (ids(i), ids(j))
    val wantRoots = Dedup.bruteComponents(wantPairs.toSeq)
    rows.foreach { case (id, _, root, kept, _) =>
      val wantRoot = wantRoots.getOrElse(id, id)
      assert(root === wantRoot, s"root mismatch for $id")
      assert(kept === (wantRoot == id))
    }
    // content-derived ⇒ identical across partitionings
    val out7 = Dedup.semanticDedup(all.repartition(7, col("vec_id")),
      minCosine = 0.999, nlist = 16)
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    assert(out7 === rows.toSet)
  }

  test("domainCap: md5-order keepers, cap enforced, partitioning-invariant") {
    // 3 hosts with 25/7/1 docs, cap 5: big host capped to its 5
    // md5-smallest ids, small hosts pass through whole
    val docs = spark.range(33).select(
      col("id").as("doc_id"),
      when(col("id") < 25, "a.com").when(col("id") < 32, "b.org")
        .otherwise("c.net").as("domain"))
    val kept = Dedup.domainCap(docs, maxPerDomain = 5)
      .as[(Long, String)].collect().toSet
    val perDomain = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(perDomain("a.com").size === 5 && perDomain("b.org").size === 5
      && perDomain("c.net") === Set(32L))
    // brute-force replay of the salted-md5 order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantA = (0L until 25L).sortBy(i => md5hex(s"${i}dom") + "#" + i).take(5).toSet
    assert(perDomain("a.com") === wantA, "keepers must be the md5-smallest ids")
    // deterministic across partitionings
    val kept11 = Dedup.domainCap(docs.repartition(11, col("doc_id")), 5)
      .as[(Long, String)].collect().toSet
    assert(kept11 === kept)
    // scale shape: k-bounded aggregate, no Window, no Sort
    val q = Dedup.domainCap(docs, 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Window"), s"domainCap must not plan a Window:\n$plan")
    assert(plan.contains("partial_topk_by"),
      s"domainCap must combine k-entry buffers map-side:\n$plan")
  }
}
