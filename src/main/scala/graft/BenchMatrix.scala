package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic A/B matrix: pure-compute scaling vs PIP-join scaling, with GC
  * time accounting, interleaved to cancel machine drift. Not a driver surface. */
object BenchMatrix {

  def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def session(cpus: Int, splitMb: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (splitMb * 1024L * 1024L).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = 20000000L
    val ptsDir = s"${sys.props("java.io.tmpdir")}/graft_bench_points_$n"
    val polys = Bench.benchPolygons

    def timeIt[A](label: String)(f: => A): Double = {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[matrix] $label%-28s ${secs}%8.3f s   gc=${(gcMillis - g0)}%5d ms")
      secs
    }

    def cpuJob(s: SparkSession): Unit = {
      import s.implicits._
      // pure codegen compute, no I/O: 2e9 xxhash evals
      s.range(0, 2000000000L, 1, 128)
        .selectExpr("xxhash64(id) AS h").selectExpr("sum(h % 1000)").collect()
    }

    def pipJob(s: SparkSession): Unit =
      Bench.timedPipJoin(s, ptsDir, polys, sys.env.getOrElse("SPARK_GRAFT_PIP_MODE", "expr"))

    for (round <- 1 to 2; cpus <- Seq(8, 32)) {
      val s = session(cpus, 8)
      if (!new java.io.File(s"$ptsDir/_SUCCESS").exists()) Bench.stagePoints(s, n, ptsDir)
      timeIt(s"warmup     cpu=$cpus r$round")(pipJob(s))
      timeIt(s"cpu-only   cpu=$cpus r$round")(cpuJob(s))
      timeIt(s"pip-probe  cpu=$cpus r$round")(pipJob(s))
      timeIt(s"pip-probe2 cpu=$cpus r$round")(pipJob(s))
      s.stop()
    }
  }
}
