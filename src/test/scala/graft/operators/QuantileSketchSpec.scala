package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import org.apache.spark.sql.graft.{QSketch, TextFunctionsImpl}

/**
 * KLL-style quantile sketch guarantees, asserted against exact order
 * statistics — rank-error bounds must hold under ANY partitioning /
 * processing order even though the exact outputs are order-dependent
 * (which is why this operator is guarantee-tested here rather than
 * hash-compared against DuckDB like its exact twin q43).
 */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact rank of v in sorted data (count of values <= v). */
  private def rankOf(sorted: Array[Double], v: Double): Long =
    sorted.count(_ <= v).toLong

  test("QSketch unit: rank error within the eps bound on adversarial orders") {
    val n = 100000
    val k = 128
    val data = Array.tabulate(n)(i => (i * 37 % n).toDouble) // permuted 0..n-1
    val orders = Map(
      "ascending" -> data.sorted,
      "descending" -> data.sorted.reverse,
      "interleaved" -> Array.tabulate(n)(i =>
        if (i % 2 == 0) (i / 2).toDouble else (n - 1 - i / 2).toDouble),
      "permuted" -> data)
    val sortedAll = data.sorted
    // deterministic alternating compaction: observed error stays well inside
    // eps = 2 * log2(n/k) / k (documented bound, ~1.5% here); each level-i
    // compaction perturbs a rank by <= 2^i and parities cancel
    val eps = 2.0 * (math.log(n.toDouble / k) / math.log(2.0)) / k
    val qs = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    orders.foreach { case (name, arr) =>
      val s = new QSketch(k)
      arr.foreach(s.add)
      assert(s.n === n)
      val got = s.quantiles(qs)
      qs.zip(got).foreach { case (q, v) =>
        val err = math.abs(rankOf(sortedAll, v) - q * n) / n.toDouble
        assert(err <= eps, f"$name: q=$q value=$v rank error $err%.5f > eps $eps%.5f")
      }
      // returned values are actual stream values, never interpolated
      got.foreach(v => assert(v == v.floor && v >= 0 && v < n))
    }
  }

  test("QSketch merge: partition-wise sketches merge within the additive bound") {
    val n = 80000
    val k = 128
    val data = Array.tabulate(n)(i => ((i * 7919) % n).toDouble)
    val sortedAll = data.sorted
    // adversarial split: one partition gets the low half, one the high half,
    // plus 11 interleaved shards — merge order mixed sizes
    val parts: Seq[Array[Double]] =
      Seq(sortedAll.take(n / 2), sortedAll.drop(n / 2)) ++
        (0 until 11).map(r => data.zipWithIndex.filter(_._2 % 11 == r).map(_._1))
    val merged = new QSketch(k)
    parts.foreach { p =>
      val s = new QSketch(k)
      p.foreach(s.add)
      merged.mergeFrom(s)
    }
    assert(merged.n === n * 2L) // low/high halves + 11 shards = 2 full copies
    val eps = 2.0 * (math.log(merged.n.toDouble / k) / math.log(2.0)) / k
    val doubled = (sortedAll ++ sortedAll).sorted
    Array(0.1, 0.5, 0.9).foreach { q =>
      val v = merged.quantiles(Array(q))(0)
      val err = math.abs(rankOf(doubled, v) - q * merged.n) / merged.n.toDouble
      assert(err <= eps, f"merged q=$q rank error $err%.5f > $eps%.5f")
    }
  }

  test("per-language median via kll_quantiles tracks the exact percentile (q43 twin)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lang", TextFunctionsImpl.lang_id(col("text")))
      .withColumn("quality", length(col("text")).cast("double"))
    val exact = docs.groupBy("lang")
      .agg(expr("percentile(quality, 0.5)").as("med"))
      .as[(String, Double)].collect().toMap
    val sketch = docs.repartition(13).groupBy("lang")
      .agg(TextFunctionsImpl.kll_quantiles(col("quality"), 128, Seq(0.5)).as("qv"))
      .select(col("lang"), element_at(col("qv"), 1).as("med"))
      .as[(String, Double)].collect().toMap
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    exact.foreach { case (lang, em) =>
      val sm = sketch(lang)
      // rank-translate the error: the sketch median's exact rank must be
      // within eps of n/2 for that language's value multiset
      val vals = docs.where(col("lang") === lang).select("quality")
        .as[Double].collect().sorted
      val eps = math.max(2.0 * (math.log(math.max(counts(lang), 256).toDouble / 128) /
        math.log(2.0)) / 128, 1.0 / counts(lang))
      val err = math.abs(vals.count(_ <= sm) - counts(lang) / 2.0) / counts(lang).toDouble
      assert(err <= math.max(eps, 0.02),
        f"$lang: sketch median $sm vs exact $em, rank err $err%.4f")
    }
  }

  test("kll_quantiles via SQL registration") {
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("kll_docs")
    val r = spark.sql(
      """SELECT kll_quantiles(CAST(length(text) AS DOUBLE), 64, 0.25, 0.5, 0.75) AS q
         FROM kll_docs""").select(explode(col("q"))).as[Double].collect()
    assert(r.length === 3 && r(0) <= r(1) && r(1) <= r(2))
  }
}
