package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark
import org.apache.spark.sql.graft.{MGSummary, TextFunctionsImpl}

/**
 * Misra-Gries heavy-hitters guarantees, asserted against exact counts —
 * membership and bounds hold under ANY partitioning/processing order even
 * though the raw estimates are order-dependent (which is why this operator
 * is guarantee-tested here rather than hash-compared against DuckDB like
 * its exact twin q44).
 */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("MGSummary unit: counts never overshoot; heavy items survive; merge bounds add") {
    val cap = 4
    val items = Seq.fill(40)("hot") ++ (0 until 60).map(i => s"x$i")
    val a = new MGSummary(cap)
    items.take(50).foreach(s => a.add(u(s), 1))
    val b = new MGSummary(cap)
    items.drop(50).foreach(s => b.add(u(s), 1))
    a.mergeFrom(b)
    assert(a.n === 100)
    val est = a.counts.map { case (k, v) => k.toString -> v }.toMap
    // "hot" has true freq 40 > n/(cap+1) = 20 — must be present
    assert(est.contains("hot"), s"heavy hitter evicted: $est")
    // estimates never exceed the truth, and undershoot by at most n/(cap+1)
    assert(est("hot") <= 40 && 40 - est("hot") <= 100 / (cap + 1))
    est.foreach { case (k, e) =>
      val truth = items.count(_ == k)
      assert(e <= truth, s"$k overcounted: $e > $truth")
    }
  }

  test("MGSummary weighted add: a heavy item arriving as ONE weighted insert survives") {
    // regression: the residual weight after decrement rounds must be
    // INSERTED, not discarded — discarding broke the membership guarantee
    // for w > 1 (capacity=2, {a:1, b:1}, then add(c, 1000))
    val s = new MGSummary(2)
    s.add(u("a"), 1); s.add(u("b"), 1)
    s.add(u("c"), 1000)
    assert(s.n === 1002)
    val est = s.counts.map { case (k, v) => k.toString -> v }.toMap
    assert(est.contains("c"), s"weighted heavy hitter evicted: $est")
    assert(est("c") <= 1000 && 1000 - est("c") <= 1002 / 3 + 1)
  }

  test("freq_topk aggregate: guarantees hold on the real corpus under adversarial partitioning") {
    val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(size(split(col("text"), " ")) >= 3)
      .select(explode(TextFunctionsImpl.shingle_make(col("text"), lit(3))).as("ngram"))
    val truth = sh.groupBy("ngram").count().as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val cap = 64
    for (parts <- Seq(1, 13)) { // single-partition and skewed-shuffle orders
      val got = sh.repartition(parts)
        .select(explode(TextFunctionsImpl.freq_topk(col("ngram"), cap, cap)).as("m"))
        .select(col("m.item"), col("m.est")).as[(String, Long)].collect().toMap
      val eps = n / (cap + 1)
      // every item with true frequency > eps must be in the summary
      truth.filter(_._2 > eps).keys.foreach { hh =>
        assert(got.contains(hh), s"parts=$parts: heavy hitter '$hh' missing (freq=${truth(hh)}, eps=$eps)")
      }
      // every estimate is a lower bound within eps of the truth
      got.foreach { case (item, e) =>
        val t = truth.getOrElse(item, 0L)
        assert(e <= t, s"parts=$parts: '$item' overcounted $e > $t")
        assert(t - e <= eps, s"parts=$parts: '$item' undercounted beyond the bound: $t - $e > $eps")
      }
      assert(got.nonEmpty)
    }
  }

  test("freq_topk via SQL registration matches the programmatic form's guarantees") {
    graft.functions.GeoFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("freq_docs")
    val rows = spark.sql(
      """SELECT m.item AS item, m.est AS est
         FROM (SELECT explode(freq_topk(ngram, 32, 10)) AS m
               FROM (SELECT explode(shingle_make(text, 3)) AS ngram
                     FROM freq_docs WHERE size(split(text, ' ')) >= 3))""")
      .as[(String, Long)].collect()
    assert(rows.length === 10 && rows.forall(_._2 > 0))
  }
}
