package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream — the standard first step of
 * behavioral / telemetry training-data pipelines (sequence construction,
 * per-session features, session-level sampling).
 *
 * Two surfaces with IDENTICAL semantics (SessionizeSpec proves it, including
 * the exact-boundary case):
 *
 *  - [[sessions]]: per-session aggregates via Spark's native `session_window`
 *    aggregation — the idiomatic Spark-first form: ONE shuffle on the entity
 *    key, sessions merged inside the aggregation operator
 *    (UpdatingSessionsIterator), no window function, streaming-capable (the
 *    same call under `readStream` + watermark is the streaming session
 *    operator, StreamSpec).
 *  - [[label]]: per-EVENT session ids via lag + running count — needed when
 *    downstream joins attach session ids back onto events. This is
 *    genuinely order-dependent, so the per-entity sort is semantic, not
 *    accidental: ONE shuffle on the entity key, sort bounded per entity.
 *    It is also the formulation the q70 DuckDB oracle replays.
 *
 * Boundary semantics (pinned EMPIRICALLY to `session_window`, asserted in
 * SessionizeSpec): an event at EXACTLY prev + gap still MERGES into the
 * session — Spark merges touching windows, not just overlapping ones. The
 * lag form therefore flags `diff > gap`, strictly. Gap arithmetic is in
 * integral microseconds, so there is no floating-point boundary to disagree
 * on. (Timestamps read from parquet are TIMESTAMP_NTZ; the micros
 * conversion casts to session-tz timestamp first — diffs are offset
 *-invariant, and the oracle gate runs under UTC.)
 *
 * Scale shape: both forms shuffle each event exactly once, on the entity
 * key. A hot entity (one user with 10^9 events) serializes in one task —
 * inherent to order-dependent semantics; the mitigation is upstream
 * per-entity capping, not salting (salting would split sessions).
 */
object Sessionize {

  /** Integral microseconds of a timestamp of either flavor (TIMESTAMP_NTZ
    * parquet columns cast through the session tz; diffs are offset-invariant). */
  private def micros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Per-session aggregates: (user, session_start, session_end, n_events,
    * duration_us) — exact integral outputs only (double sums would be
    * partition-order dependent). */
  def sessions(events: DataFrame, gapSec: Long,
               userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    events.groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSec seconds").as("sw"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(micros(col(tsCol))) - min(micros(col(tsCol))))
          .as("duration_us"))
      .drop("sw")

  /** Per-event session labels: adds `session_seq` (0-based per-entity
    * session index) and `session_id` (entity#seq). */
  def label(events: DataFrame, gapSec: Long,
            userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapUs = gapSec * 1000000L
    val prev = lag(micros(col(tsCol)), 1).over(w)
    val newSession =
      when(prev.isNull || micros(col(tsCol)) - prev > gapUs, 1L).otherwise(0L)
    events.withColumn("session_seq",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .withColumn("session_id",
        concat(col(userCol).cast("string"), lit("#"), col("session_seq").cast("string")))
  }
}
