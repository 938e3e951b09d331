package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.model._
import graft.sources.{CityGmlReader, CityJsonReader, ImageGen}

class PipJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // FZK (partition 0) + 100 CityJSON buildings (partition 1) building footprints
  lazy val fzkFps = CityGmlReader.toFootprints(
    CityGmlReader.parseFile("/root/reference/input/citygml/fzk_haus_lod2_v2.gml"), 0)
    .filter(_.feature_type == "Building")
  lazy val cjFps = CityJsonReader.toFootprints(
    CityJsonReader.parseFile("/root/reference/input/cityjson/lod2_buildings_v2.json"), 1)
    .filter(_.feature_type == "Building")

  // probe points around FZK (seeded geotags, incl. 60% in-footprint skew)
  lazy val fzkPoints: Seq[(String, Double, Double)] =
    (0L until 3000L).map { i => val (x, y) = ImageGen.geotag(i); (f"img_$i%010d", x, y) }
  // probe points over the CityJSON 96x98 m grid
  lazy val cjPoints: Seq[(String, Double, Double)] =
    (0L until 4000L).map { i =>
      (s"p_$i", graft.core.Hashing.uniform(7, i * 2) * 110.0 - 5.0,
        graft.core.Hashing.uniform(7, i * 2 + 1) * 110.0 - 5.0)
    }

  def runAndCollect(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select("image_id", "feature_id").as[(String, String)].collect().toSet

  test("broadcast PIP join matches brute-force oracle (FZK fixture)") {
    val pts = fzkPoints.toDF("image_id", "x", "y")
    val polys = spark.createDataset(fzkFps)
    val got = runAndCollect(PipJoin.broadcastJoin(pts, polys))
    val want = PipJoin.bruteForce(fzkPoints, fzkFps)
    assert(want.nonEmpty, "oracle should match some points")
    assert(got === want)
    // ~60% of points are inside by construction
    assert(got.size > 1500)
  }

  test("broadcast PIP join matches brute-force oracle (100-building CityJSON grid)") {
    val pts = cjPoints.toDF("image_id", "x", "y")
    val polys = spark.createDataset(cjFps)
    val got = runAndCollect(PipJoin.broadcastJoin(pts, polys))
    val want = PipJoin.bruteForce(cjPoints, cjFps)
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("salted shuffle join ≡ broadcast join (row-set preservation under salting)") {
    val pts = cjPoints.toDF("image_id", "x", "y")
    val polys = spark.createDataset(cjFps)
    val b = runAndCollect(PipJoin.broadcastJoin(pts, polys))
    val s = runAndCollect(PipJoin.saltedJoin(pts, polys, salts = 8))
    assert(s === b)
  }

  test("probe (mapPartitions) join ≡ brute force, zero shuffle") {
    val pts = spark.createDataset(fzkPoints)
    val got = PipJoin.probeJoin(pts, fzkFps)
      .select("image_id", "feature_id").as[(String, String)].collect().toSet
    val want = PipJoin.bruteForce(fzkPoints, fzkFps)
    assert(got === want)
  }

  test("codegen expr path (pip_matches) ≡ brute force on both fixtures") {
    val all = fzkFps ++ cjFps
    val pts = (fzkPoints ++ cjPoints).toDF("image_id", "x", "y")
    val got = runAndCollect(PipJoin.exprJoin(pts, all))
    val want = PipJoin.bruteForce(fzkPoints ++ cjPoints, all)
    assert(got === want)
    // and the generated code actually inlines the index (no join in the plan)
    val plan = PipJoin.exprJoin(pts, all).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expr path must be join-free:\n$plan")
  }

  test("auto path selection: every branch produces the same row set") {
    val pts = cjPoints.toDF("image_id", "x", "y")
    val want = PipJoin.bruteForce(cjPoints, cjFps)
    // default thresholds → expr path (cjFps has ~500 vertices)
    assert(runAndCollect(PipJoin.auto(pts, cjFps)) === want)
    // force the broadcast cell-join branch
    assert(runAndCollect(PipJoin.auto(pts, cjFps, exprLimit = 0)) === want)
    // force the salted shuffle branch
    assert(runAndCollect(PipJoin.auto(pts, cjFps, exprLimit = 0, broadcastLimit = 0)) === want)
  }

  test("physical plan: broadcast path uses BroadcastHashJoin and keeps codegen on the big side") {
    val dir = "target/tmp/pip_pts"
    fzkPoints.toDF("image_id", "x", "y").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val polys = spark.createDataset(fzkFps)
    val q = PipJoin.broadcastJoin(pts, polys)
    q.collect() // execute so AQE finalizes THIS query's plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // whole-stage-codegen spans render as "*(n)" prefixes in the final plan
    assert(plan.contains("*(2) Project [image_id") || plan.contains("WholeStageCodegen"),
      s"expected the big-side encode inside a codegen span:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "big side must not shuffle on broadcast path")
  }

  test("SQL surface: hex_encode/st_covers registered and usable from spark.sql") {
    graft.functions.GeoFunctions.register(spark)
    fzkPoints.toDF("image_id", "x", "y").createOrReplaceTempView("pts")
    val n = spark.sql(
      """SELECT count(*) FROM pts
         WHERE st_covers_ring(
           array(named_struct('x', 457854d, 'y', 5439083d),
                 named_struct('x', 457842d, 'y', 5439083d),
                 named_struct('x', 457842d, 'y', 5439093d),
                 named_struct('x', 457854d, 'y', 5439093d)), x, y)""").head().getLong(0)
    val want = fzkPoints.count { case (_, x, y) =>
      x >= 457842 && x <= 457854 && y >= 5439083 && y <= 5439093 }
    assert(n === want)
    val cells = spark.sql("SELECT DISTINCT hex_encode(x, y, 11) FROM pts").count()
    assert(cells > 1)
  }

  test("payload invariant survives the join: caption byte-equal, phash stable, PSNR>=40") {
    val imgs = ImageGen.table(spark, 200, partitions = 4)
    val polys = spark.createDataset(fzkFps)
    val joined = PipJoin.broadcastJoin(imgs.toDF(), polys)
    val src = imgs.collect().map(r => r.image_id -> r).toMap
    val rows = joined.as[ImageRow].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = src(r.image_id)
      assert(r.caption === s.caption, "caption byte-equality")
      assert(r.phash === s.phash)
      assert(ImageGen.psnrBytes(s.bytes, r.bytes) >= 40.0)
    }
  }
}
