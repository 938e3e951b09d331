package graft.core

import org.apache.spark.sql.SparkSession

/** Parse-and-validate helpers for `spark.graft.*` session confs — one place
  * for the read/parse/range-check pattern, so every knob fails with the same
  * message shape instead of each call site growing its own copy. */
object Confs {

  def longConf(spark: SparkSession, key: String, dflt: Long, min: Long = Long.MinValue): Long = {
    val raw = spark.conf.get(key, dflt.toString)
    val v = try raw.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be a long, got '$raw'")
    }
    require(v >= min, s"$key must be >= $min, got $v")
    v
  }

  def intConf(spark: SparkSession, key: String, dflt: Int, min: Int = Int.MinValue): Int = {
    val raw = spark.conf.get(key, dflt.toString)
    val v = try raw.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be an int, got '$raw'")
    }
    require(v >= min, s"$key must be >= $min, got $v")
    v
  }
}
