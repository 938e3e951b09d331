package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round measurement harness (guide §1.1/§1.4/§1.5) — SEPARATE
 * from the frozen driver-contract [[Bench]]: isolates individual queries,
 * counts Spark jobs/stages/shuffle bytes per query via a listener, and can
 * dump `explain("formatted")` plans. Never used for the driver's numbers.
 *
 * Env:
 *  - SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: as Bench.
 *  - BENCHX_QUERIES: comma-separated query names (default: all).
 *  - BENCHX_REPS: timed reps per query after one warmup (default 3).
 *  - BENCHX_ACTION: "count" (Bench parity, default) or "noop" (noop sink —
 *    computes every column; guide §1.4).
 *  - BENCHX_EXPLAIN_DIR: if set, write <dir>/<query>.txt formatted plans.
 */
object BenchExtra {

  /** Accumulates scheduler-level counters between resets. */
  final class Counters extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
      tasks += sc.stageInfo.numTasks
      shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; shuffleRead = 0L; shuffleWrite = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)

    val subset = sys.env.get("BENCHX_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("BENCHX_REPS", "3").toInt
    val action = sys.env.getOrElse("BENCHX_ACTION", "count")
    val explainDir = sys.env.get("BENCHX_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    subset.foreach { want =>
      val known = SparkEntry.queries.keySet
      val missing = want.diff(known)
      if (missing.nonEmpty)
        System.err.println(s"BENCHX_QUERIES entries not found: ${missing.toSeq.sorted.mkString(",")}")
    }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      action match {
        case "noop" => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        case _ => fn(spark, sfDir).count()
      }

    val out = new StringBuilder("{")
    var first = true
    for ((name, fn) <- names) {
      explainDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pw = new java.io.PrintWriter(s"$d/$name.txt")
        try pw.write(plan) finally pw.close()
      }
      if (reps == 0) { // explain-only mode: dump plans, run nothing
        System.err.println(s"[benchx] $name explained")
      } else {
      spark.sparkContext.setJobDescription(s"warmup: $name")
      run(fn) // warmup (JIT + codegen)
      val samples = (1 to reps).map { i =>
        // drain the async listener bus so the previous rep's stage events
        // can't leak into (or be dropped by) this rep's counters
        org.apache.spark.sql.graft.ListenerBusSync.drain(spark.sparkContext)
        counters.reset()
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val t0 = System.nanoTime()
        run(fn)
        (System.nanoTime() - t0) / 1e9
      }
      org.apache.spark.sql.graft.ListenerBusSync.drain(spark.sparkContext)
      spark.sparkContext.setJobDescription(null)
      val sorted = samples.sorted
      val med = if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
      val line =
        f""""$name":{"min":${samples.min}%.3f,"med":$med%.3f,""" +
        f""""jobs":${counters.jobs},"stages":${counters.stages},"tasks":${counters.tasks},""" +
        f""""shufR":${counters.shuffleRead},"shufW":${counters.shuffleWrite}}"""
      if (!first) out.append(",")
      out.append(line); first = false
      System.err.println(s"[benchx] $name ${samples.map(s => f"$s%.3f").mkString(" ")}")
      }
    }
    out.append("}")
    println(out.toString)
    spark.stop()
  }
}
