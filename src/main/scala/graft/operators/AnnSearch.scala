package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: brute-force cosine top-k — probes broadcast against the full
 * table, dot products computed with `zip_with`/`aggregate` (built-in
 * higher-order functions; no UDF, stays codegen-compatible).
 *
 * Scale path: LSH-bucketed search — random-hyperplane sign bits bucket the
 * table; probes only score their own bucket (+ optionally multiprobe
 * neighbouring buckets by flipping one bit). At 10^12 rows the bucket column
 * is also the table's cluster key, so a probe touches one partition range.
 */
object AnnSearch {

  /** Σ aᵢ·bᵢ as double (element-wise cast BEFORE multiply for stable precision). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /**
   * Brute-force cosine top-k: every probe scores every row.
   * probes: (probe_id, pvec); table: (idCol, vecCol). Output:
   * (probe_id, vec_id, cos, rnk) with deterministic (cos desc, vec_id asc).
   */
  def bruteTopK(table: DataFrame, probes: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = table.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(probes.select(col("probe_id"), col("pvec"))))
      .withColumn("cos", cosine(col(vecCol), col("pvec")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("probe_id"), col(idCol), col("cos"), col("rnk"))
  }

  /**
   * LSH-bucketed top-k: banded sign-bit buckets (see [[Dedup.lshBuckets]]);
   * a probe scores the union of its band buckets — ~bands/2^planes of the
   * brute-force candidate volume, recall governed by the band-collision bound.
   */
  def lshTopK(table: DataFrame, probes: DataFrame, k: Int,
              dim: Int = 64, planes: Int = 8, bands: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = table.select(col(idCol), col(vecCol),
      posexplode(Dedup.lshBuckets(col(vecCol), dim, planes, bands)).as(Seq("band", "bucket")))
    val p = probes.select(col("probe_id"), col("pvec"),
      posexplode(Dedup.lshBuckets(col("pvec"), dim, planes, bands)).as(Seq("band", "bucket")))
    val scored = t.join(broadcast(p), Seq("band", "bucket"))
      .select(col("probe_id"), col("pvec"), col(idCol), col(vecCol)).distinct()
      .withColumn("cos", cosine(col(vecCol), col("pvec")))
      .select(col("probe_id"), col(idCol), col("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Driver-side oracle. */
  def bruteForce(table: Seq[(Long, Array[Float])], probes: Seq[(Long, Array[Float])],
                 k: Int): Set[(Long, Long, Int)] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0.0) 0.0 else d / n
    }
    probes.flatMap { case (pid, pv) =>
      table.map { case (vid, v) => (vid, cos(v, pv)) }
        .sortBy { case (vid, c) => (-c, vid) }.take(k).zipWithIndex
        .map { case ((vid, _), i) => (pid, vid, i + 1) }
    }.toSet
  }
}
