package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Parallelism floor for NARROW, compute-heavy inputs (guide §2.5 "input
 * skew: one huge unsplittable file … repartition immediately after the
 * read"): when a scan yields fewer partitions than the cluster's default
 * parallelism — a single-split parquet file runs every downstream kernel
 * evaluation on one task — redistribute once before the CPU-heavy pass.
 *
 * Deliberately NOT applied to text/tokenize pipelines: there the shuffled
 * payload is the corpus text and the measured cost of the exchange exceeds
 * the single-task kernel time (see OPTIMIZATION_r07.md "negative results").
 * Use only where the rows are a few scalars and the per-row kernel work is
 * large (point × broadcast-geometry scoring). A no-op — no exchange added —
 * whenever the input is already at least default-parallel, i.e. any real
 * multi-split table at scale.
 *
 * CALLER CONTRACT: pass scan-shaped inputs only (scan + projections/
 * filters). The partition probe reads `df.rdd`, and under AQE that
 * finalizes the plan — for an input containing its own Exchange the
 * upstream stages would EXECUTE at plan-construction time and run again on
 * the real action. The sole current caller (Setback.broadcastExact) feeds
 * a scan projection.
 */
object Spread {
  def floor(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
