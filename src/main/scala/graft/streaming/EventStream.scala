package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface. The reference is strictly batch (SURVEY.md
 * §2.8); streaming here is the engine extension the 100 TB pipeline needs:
 * the same event schema, consumed incrementally with watermarks + windowed
 * aggregation, and custom session state via flatMapGroupsWithState.
 *
 * Both operators are tested by replaying the driver's batch events table
 * through a file stream (`maxFilesPerTrigger`) into a memory sink and
 * comparing against the equivalent batch query (q24 / q25 semantics).
 */
object EventStream {

  val eventSchema: StructType = new StructType()
    .add("event_id", LongType).add("ts", TimestampType).add("user_id", LongType)
    .add("event_type", StringType).add("value", DoubleType).add("props", StringType)

  /** Tumbling 1-hour window census per event type with a 2-hour watermark. */
  def windowedCounts(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), max("value").as("max_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long, nSessions: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /**
   * Stateful sessionization (30-min inactivity gap) via flatMapGroupsWithState
   * — the KeyValueGroupedDataset custom-state path. Emits a final per-user
   * summary on processing-time timeout; in the bounded replay test we read the
   * state off the complete-mode count instead.
   */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0, 0))
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime / 1000
            st =
              if (st.lastTs < 0 || t - st.lastTs > gapSeconds)
                SessionState(t, t, st.nEvents + 1, st.nSessions + 1)
              else st.copy(lastTs = t, nEvents = st.nEvents + 1)
          }
          state.update(st)
          Iterator(UserSessions(userId, st.nSessions, st.nEvents))
      }.toDF()
  }

  /**
   * Streaming spatial enrichment: a stream of geotagged image rows is
   * PIP-matched against the footprint index per micro-batch — the
   * `pip_matches` expression is stateless, so the streaming plan is the same
   * codegen map-only shape as the batch plan (no state store, no shuffle).
   */
  def pipEnrich(spark: SparkSession, pointsDir: String,
                polys: Seq[graft.model.Footprint]): DataFrame = {
    val schema = new StructType()
      .add("image_id", StringType).add("x", DoubleType).add("y", DoubleType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(pointsDir)
    graft.operators.PipJoin.exprJoin(stream, polys)
  }

  /**
   * Streaming kNN enrichment: each micro-batch row gets its k nearest
   * city-object centroids via the `knn_matches` expression — like
   * [[pipEnrich]], stateless and map-only, so the streaming plan is the
   * batch plan (no state store, no shuffle, same codegen span).
   */
  def knnEnrich(spark: SparkSession, pointsDir: String,
                targets: Seq[(String, Double, Double)], k: Int = 3): DataFrame = {
    val schema = new StructType()
      .add("probe_id", StringType).add("x", DoubleType).add("y", DoubleType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(pointsDir)
    graft.operators.KnnJoin.broadcastGrid(stream, targets, k)
  }

  /** Replay a batch parquet dir through the streaming graph into memory sink. */
  def replayWindowed(spark: SparkSession, path: String, queryName: String): DataFrame = {
    val q = windowedCounts(spark, path).writeStream
      .format("memory").queryName(queryName).outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
