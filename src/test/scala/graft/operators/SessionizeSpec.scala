package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("boundary semantics: event at exactly prev+gap MERGES; 1 us beyond starts a new session") {
    // gap = 10 s; user 1: 0s, 5s, 15s (exactly 10s after the 5s event →
    // session_window merges TOUCHING windows → one 3-event session);
    // user 2: 0s, 10.000001s (1 us beyond the gap → two sessions)
    val rows = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1005))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1015))),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2000))),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2010).plusNanos(1000)))
    ).toDF("user_id", "ts")
    val agg = Sessionize.sessions(rows, gapSec = 10)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(agg(1L) === Seq(3L), "exact-boundary event must merge (touching windows)")
    assert(agg(2L) === Seq(1L, 1L), "1 us beyond the gap must open a new session")
    val lbl = Sessionize.label(rows, gapSec = 10)
      .groupBy("user_id", "session_seq").agg(count(lit(1)).as("n"))
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(lbl === agg, "label() must pin the same boundary as session_window")
  }

  test("sessions() == label() aggregated on the real events table; parallelism-invariant") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_start", "session_end", "n_events", "duration_us")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect().toSet
    val viaNative = canon(Sessionize.sessions(events, gapSec = 1800))
    val viaLabel = canon(Sessionize.label(events, gapSec = 1800)
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts").cast("timestamp"))) -
          min(unix_micros(col("ts").cast("timestamp")))).as("duration_us")))
    assert(viaNative === viaLabel)
    assert(viaNative.exists(_._4 > 1), "fixture must contain multi-event sessions")
    assert(viaNative.size > events.select("user_id").distinct().count(),
      "fixture must contain multi-session users")
    // content-derived ⇒ identical across partitionings
    val shuffled = canon(Sessionize.sessions(events.repartition(7, col("event_id")), 1800))
    assert(shuffled === viaNative)
  }
}
