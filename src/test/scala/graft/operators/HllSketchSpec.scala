package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark
import org.apache.spark.sql.graft.{HllSketch, TextFunctionsImpl}

/**
 * HyperLogLog guarantees. Unlike MG/KLL, the HLL register array is a pure
 * function of the input value SET (merge = pointwise max: commutative,
 * associative, idempotent), so the strongest assertion here is EXACT
 * register equality across adversarial partitionings — not just an error
 * band. The classic ~1.04/√m standard error is asserted against true
 * cardinalities on top.
 */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("HllSketch unit: relative error within 3 standard errors across cardinalities") {
    val p = 12
    val se = 1.04 / math.sqrt((1 << p).toDouble)
    for (n <- Seq(100, 1000, 10000, 200000)) {
      val s = new HllSketch(p)
      (0 until n).foreach(i => s.add(u(s"item_$i")))
      val err = math.abs(s.estimate - n) / n.toDouble
      assert(err <= 3 * se, f"n=$n est=${s.estimate} err=$err%.4f > ${3 * se}%.4f")
    }
  }

  test("HllSketch merge: register-EXACT under any partitioning; idempotent on overlap") {
    val p = 10
    val items = (0 until 50000).map(i => s"v$i")
    val whole = new HllSketch(p)
    items.foreach(s => whole.add(u(s)))
    // adversarial split: sorted halves + 7 interleaved shards, merged in a
    // mixed order — the register array must be IDENTICAL to the single pass
    val parts = Seq(items.take(25000), items.drop(25000)) ++
      (0 until 7).map(r => items.zipWithIndex.filter(_._2 % 7 == r).map(_._1))
    val merged = new HllSketch(p)
    parts.foreach { chunk =>
      val s = new HllSketch(p)
      chunk.foreach(x => s.add(u(x)))
      merged.mergeFrom(s)
    }
    // note: parts covers every item at least once and half of them twice —
    // idempotence means the duplicates change nothing
    assert(merged.regs.toSeq === whole.regs.toSeq)
    assert(merged.estimate === whole.estimate)
  }

  test("hll_count aggregate tracks exact COUNT(DISTINCT) per group (q30's sketch twin)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .as[(String, Long)].collect().toMap
    val ref = events.repartition(7).groupBy("event_type")
      .agg(TextFunctionsImpl.hll_count(col("user_id").cast("string"), 12).as("d"))
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 13)) {
      val est = events.repartition(parts).groupBy("event_type")
        .agg(TextFunctionsImpl.hll_count(col("user_id").cast("string"), 12).as("d"))
        .as[(String, Long)].collect().toMap
      exact.foreach { case (et, n) =>
        val e = est(et)
        assert(math.abs(e - n) / n.toDouble <= 3 * 1.04 / math.sqrt(4096.0),
          s"$et: est $e vs exact $n at parts=$parts")
      }
      assert(est === ref,
        "HLL estimates must be partitioning-invariant (register determinism)")
    }
  }

  test("hll_count via SQL registration") {
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("hll_docs")
    val est = spark.sql("SELECT hll_count(CAST(doc_id AS STRING), 12) FROM hll_docs")
      .as[Long].head()
    val n = spark.table("hll_docs").count()
    assert(math.abs(est - n) / n.toDouble <= 3 * 1.04 / math.sqrt(4096.0))
  }
}
