package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark
import org.apache.spark.sql.graft.{BloomKernel, TextFunctionsImpl}

/**
 * Bloom-filter semi-join pre-filter guarantees: ZERO false negatives under
 * any partitioning (OR-merge is commutative/associative/idempotent — like
 * the HLL registers, the bitset is a pure function of the key set), a
 * false-positive rate near nominal, and the intended end-to-end effect: the
 * pre-filtered join returns exactly the exact join's rows while the scan
 * side shrinks by orders of magnitude.
 */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("kernel: no false negatives; FPR within 2x nominal; partitioning-invariant bytes") {
    val n = 20000
    val m = BloomKernel.numBits(n, 0.01)
    val k = BloomKernel.numHashes(n, m)
    val words = new Array[Long]((m >>> 6).toInt)
    (0 until n).foreach(i => BloomKernel.add(words, m, k, u(s"key_$i")))
    val bloom = BloomKernel.serialize(words, m, k)
    // zero false negatives — the property the join correctness rests on
    (0 until n).foreach(i => assert(BloomKernel.contains(bloom, u(s"key_$i"))))
    // false-positive rate near nominal on disjoint probes
    val fp = (0 until 50000).count(i => BloomKernel.contains(bloom, u(s"other_$i")))
    assert(fp / 50000.0 <= 0.02, s"FPR ${fp / 50000.0} > 2x nominal 0.01")
  }

  test("bloom_build aggregate: byte-identical across partitionings; end-to-end pre-filter") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").cast("string").as("k"))
    def build(parts: Int): Array[Byte] = urgent.repartition(parts)
      .agg(TextFunctionsImpl.bloom_build(col("k"), 10000L, 0.01).as("b"))
      .head().getAs[Array[Byte]](0)
    val bloom = build(1)
    assert(java.util.Arrays.equals(bloom, build(13)),
      "bloom bytes must be partitioning-invariant (OR-merge determinism)")

    // the pattern: scan-local pre-filter of the big side, then the exact join
    val preFiltered = lineitem.where(TextFunctionsImpl.bloom_contains(
      lit(bloom), col("l_orderkey").cast("string")))
    val exact = lineitem.join(urgent.select(col("k").cast("long").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    val exactRows = exact.count()
    val prefRows = preFiltered.count()
    // zero false negatives: the exact join over the pre-filtered side loses nothing
    assert(preFiltered.join(
      urgent.select(col("k").cast("long").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .count() === exactRows)
    // and the pre-filter actually prunes (survivors ≈ matches + fpp slack)
    val total = lineitem.count()
    assert(prefRows < total, "pre-filter must prune non-matching rows")
    assert(prefRows <= exactRows + (total * 0.03).toLong,
      s"survivors $prefRows far above matches $exactRows + fpp slack")
  }

  test("malformed bloom bytes fail loudly, never Unsafe-read out of bounds") {
    // bloom_contains is user-facing SQL — arbitrary caller bytes must hit
    // the header validation, not undefined Unsafe reads
    for (bad <- Seq(Array[Byte](1), new Array[Byte](12), {
      val b = new Array[Byte](20) // m = 0 in the header
      b
    }, {
      val b = new Array[Byte](20)
      // header claims a huge m that the 20-byte payload cannot hold
      org.apache.spark.unsafe.Platform.putLong(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, 1L << 40)
      org.apache.spark.unsafe.Platform.putInt(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8, 5)
      b
    })) {
      intercept[IllegalArgumentException](BloomKernel.contains(bad, u("x")))
    }
    // oversized builds fail at construction, not with wrapped allocations
    intercept[IllegalArgumentException](
      org.apache.spark.sql.graft.BloomBuildAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 4000000000L, 0.001))
  }

  test("bloom_build / bloom_contains via SQL registration") {
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("bloom_orders")
    val rows = spark.sql(
      """WITH b AS (SELECT bloom_build(CAST(o_orderkey AS STRING), 1000, 0.01) AS f
                    FROM bloom_orders WHERE o_orderkey < 100)
         SELECT count(*) FROM bloom_orders, b
         WHERE bloom_contains(b.f, CAST(o_orderkey AS STRING)) AND o_orderkey < 100""")
      .as[Long].head()
    val want = spark.table("bloom_orders").where(col("o_orderkey") < 100).count()
    assert(rows === want, "SQL-surfaced bloom must keep every true member")
  }
}
