package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/**
 * TF-IDF keyword extraction vs a driver-side exact replay — Spark's `log`
 * evaluates via StrictMath.log (verified in the catalyst bytecode; HotSpot's
 * Math.log intrinsic may differ by 1 ulp), so the replay uses StrictMath too
 * and the comparison is bit-deterministic (cross-ENGINE ln() parity is the
 * reason this operator has no DuckDB row; cross-IMPLEMENTATION parity with
 * the identical StrictMath is exact).
 */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidfTopTerms == exact driver replay (ranks, tf, df)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val n = rows.length.toDouble
    val termsPerDoc = rows.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty)
    }
    val df = termsPerDoc.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val want = termsPerDoc.flatMap { case (id, ts) =>
      ts.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .map { case (term, tf) =>
          (term, tf, df(term), tf.toDouble * StrictMath.log(n / df(term).toDouble)) }
        .sortBy { case (term, _, _, s) => (-s, term) }
        .take(3).zipWithIndex
        .map { case ((term, tf, dfv, _), i) => (id, term, tf, dfv, i + 1) }
    }.toSet
    val got = TextFunctions.tfidfTopTerms(docs)
      .as[(Long, String, Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("topNgramMass: mass is a true fraction — self-overlapping grams clamp to 1.0") {
    val docs = Seq(
      (1L, "a a a a"),          // "a a" occurs 3x overlapping: unclamped 1.5
      (2L, "x y x y z"),        // top "x y" 2x, total grams 4, T=5 → 0.8
      (3L, "w")                 // no 2-gram
    ).toDF("doc_id", "text")
    val got = TextFunctions.topNgramMass(docs, n = 2).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(3))).toMap
    assert(got(1L) === ((Some("a a"), 1.0)), "overlap must clamp to a fraction")
    assert(got(2L) === ((Some("x y"), 0.8)))
    assert(got(3L) === ((None, 0.0)))
  }
}
