package graft

import org.apache.spark.sql.SparkSession

/** Replica of the driver's smoke check: SparkEntry.entry(spark) must return
  * rows > 0 on the flagship query. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (expect > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
