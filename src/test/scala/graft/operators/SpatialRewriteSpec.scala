package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.GeoFunctions
import graft.sources.{CityGmlReader, ImageGen}

class SpatialRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val fps = CityGmlReader.toFootprints(
    CityGmlReader.parseFile("/root/reference/input/citygml/fzk_haus_lod2_v2.gml"), 0)
    .filter(_.feature_type == "Building")
  lazy val points: Seq[(String, Double, Double)] =
    (0L until 2000L).map { i => val (x, y) = ImageGen.geotag(i); (f"img_$i%010d", x, y) }

  def naiveJoin = {
    val pts = points.toDF("image_id", "x", "y")
    val polys = spark.createDataset(fps).select("feature_id", "ring", "holes")
    pts.crossJoin(polys)
      .where(GeoFunctions.st_covers(col("ring"), col("holes"), col("x"), col("y")))
      .select("image_id", "feature_id")
  }

  test("SpatialJoinRewrite: naive cross join + st_covers becomes a cell equi-join") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    val q = naiveJoin
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("hex_encode"), s"expected cell prejoin:\n$optimized")
    assert(optimized.contains("hex_cover"), s"expected polygon cover explode:\n$optimized")
    q.collect()
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      s"rewrite must eliminate the nested-loop join:\n$physical")
    // rows identical to brute force
    val got = q.as[(String, String)].collect().toSet
    val want = PipJoin.bruteForce(points, fps)
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("rewrite fires regardless of which side is the point side") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    val pts = points.toDF("image_id", "x", "y")
    val polys = spark.createDataset(fps).select("feature_id", "ring", "holes")
    val q = polys.crossJoin(pts) // polygons LEFT, points RIGHT
      .where(GeoFunctions.st_covers(col("ring"), col("holes"), col("x"), col("y")))
      .select("image_id", "feature_id")
    assert(q.queryExecution.optimizedPlan.toString.contains("hex_encode"))
    val got = q.as[(String, String)].collect().toSet
    assert(got === PipJoin.bruteForce(points, fps))
  }

  test("pure SQL surface: JOIN ... ON st_covers(...) gets the filter-refine plan") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    points.toDF("image_id", "x", "y").createOrReplaceTempView("sql_pts")
    spark.createDataset(fps).select("feature_id", "ring", "holes")
      .createOrReplaceTempView("sql_polys")
    val q = spark.sql(
      """SELECT image_id, feature_id
         FROM sql_pts JOIN sql_polys ON st_covers(ring, holes, x, y)""")
    assert(q.queryExecution.optimizedPlan.toString.contains("hex_encode"),
      "rewrite must fire on SQL-authored joins too")
    val got = q.as[(String, String)].collect().toSet
    assert(got === PipJoin.bruteForce(points, fps))
  }

  test("st_covers under OR is NOT rewritten and keeps rows from the other disjunct") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    val pts = points.toDF("image_id", "x", "y")
    val polys = spark.createDataset(fps).select("feature_id", "ring", "holes")
    // every pair satisfies the second disjunct for image ids ending in "7";
    // conjoining the cell equi-join onto the whole condition would drop them
    val q = pts.crossJoin(polys)
      .where(GeoFunctions.st_covers(col("ring"), col("holes"), col("x"), col("y"))
        || col("image_id").endsWith("7"))
      .select("image_id", "feature_id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("hex_encode"),
      "a PipCoversExpr under OR must not trigger the conjunctive rewrite")
    val got = q.as[(String, String)].collect().toSet
    val pip = PipJoin.bruteForce(points, fps)
    val byOther = for {
      (id, _, _) <- points.toSet if id.endsWith("7"); f <- fps
    } yield (id, f.feature_id)
    assert(got === (pip ++ byOther))
  }

  test("st_covers as one of several AND conjuncts still rewrites") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    val pts = points.toDF("image_id", "x", "y")
    val polys = spark.createDataset(fps).select("feature_id", "ring", "holes")
    val q = pts.crossJoin(polys)
      .where(GeoFunctions.st_covers(col("ring"), col("holes"), col("x"), col("y"))
        && col("image_id").endsWith("0"))
      .select("image_id", "feature_id")
    assert(q.queryExecution.optimizedPlan.toString.contains("hex_encode"),
      "a top-level AND conjunct must still trigger the rewrite")
    val got = q.as[(String, String)].collect().toSet
    assert(got === PipJoin.bruteForce(points, fps).filter(_._1.endsWith("0")))
  }

  test("continent-scale polygon: stats-driven res coarsens; rows still match brute force") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    // ~400 km square polygon + a handful of points inside/outside; at the
    // building-scale default (res 11, ~25 m edge) the cover explode would be
    // hundreds of millions of cells — the rule must coarsen from envelope stats
    val big = graft.model.Footprint("country", "Query", 0,
      Seq(graft.model.XY(0, 0), graft.model.XY(400000, 0),
        graft.model.XY(400000, 400000), graft.model.XY(0, 400000)),
      Seq.empty, graft.model.Env6(0, 0, 0, 400000, 400000, 0),
      graft.model.XY(200000, 200000), Map.empty)
    val pts = Seq(("in1", 1000.0, 1000.0), ("in2", 399000.0, 350000.0),
      ("out1", 500000.0, 10.0), ("out2", -5.0, 3.0)).toDF("image_id", "x", "y")
    val polys = spark.createDataset(Seq(big)).select("feature_id", "ring", "holes")
    val q = pts.crossJoin(polys)
      .where(GeoFunctions.st_covers(col("ring"), col("holes"), col("x"), col("y")))
      .select("image_id", "feature_id")
    val opt = q.queryExecution.optimizedPlan.toString
    val resUsed = "hex_cover\\([^,]+, (\\d+)\\)".r.findFirstMatchIn(opt)
      .map(_.group(1).toInt)
    assert(resUsed.exists(_ < org.apache.spark.sql.graft.SpatialJoinRewrite.Res),
      s"a 400 km polygon must pick a coarser res than the default:\n$opt")
    assert(q.as[(String, String)].collect().toSet ===
      Set(("in1", "country"), ("in2", "country")))
  }

  test("spark.graft.pip.res conf overrides the rewrite resolution") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    spark.conf.set("spark.graft.pip.res", "9")
    try {
      val q = naiveJoin
      val opt = q.queryExecution.optimizedPlan.toString
      assert("hex_cover\\([^,]+, (\\d+)\\)".r.findFirstMatchIn(opt)
        .exists(_.group(1).toInt == 9), s"conf res must win:\n$opt")
      assert(q.as[(String, String)].collect().toSet ===
        PipJoin.bruteForce(points, fps))
    } finally spark.conf.unset("spark.graft.pip.res")
  }

  test("vector/text/tile kernels are callable from the SQL surface") {
    graft.functions.GeoFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c,
                vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                lang_id('the and of to in is that it with for') AS l,
                size(shingle_make('a b c d', 3)) AS ns,
                size(tile_cover(named_struct(
                  'minx', 0.0D, 'miny', 0.0D, 'minz', 0.0D,
                  'maxx', 10.0D, 'maxy', 10.0D, 'maxz', 0.0D), 20)) AS nt""").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 11.0)
    assert(r.getString(2) === "en")
    assert(r.getInt(3) === 2)
    assert(r.getInt(4) >= 1)
  }

  test("config-only deployment: GraftExtensions injects functions + rule into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val old = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext when one is live; extensions apply
      // at session build
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      // functions available with NO register() call
      val r = s2.sql(
        "SELECT hex_encode(1.0D, 2.0D, 9) AS c, vec_cosine(array(1.0D), array(1.0D)) AS v").head()
      assert(r.getLong(0) === graft.core.HexGrid.encode(1.0, 2.0, 9))
      assert(r.getDouble(1) === 1.0)
      // the spatial-join rewrite is active in SQL too
      import s2.implicits._
      points.take(200).toDF("image_id", "x", "y").createOrReplaceTempView("ext_pts")
      s2.createDataset(fps).select("feature_id", "ring", "holes")
        .createOrReplaceTempView("ext_polys")
      val q = s2.sql(
        "SELECT image_id, feature_id FROM ext_pts JOIN ext_polys ON st_covers(ring, holes, x, y)")
      // (hex_encode over the literal local relation constant-folds away;
      // the injected cell prejoin attributes prove the rule fired)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("__cell_pt") && opt.contains("hex_cover"),
        s"injected optimizer rule must fire:\n$opt")
      assert(q.as[(String, String)].collect().toSet ===
        PipJoin.bruteForce(points.take(200), fps))
    } finally {
      old.foreach { s => SparkSession.setActiveSession(s); SparkSession.setDefaultSession(s) }
    }
  }

  test("rewrite leaves non-spatial joins untouched") {
    org.apache.spark.sql.graft.GraftExtensions.enable(spark)
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val b = Seq((1, "z")).toDF("id2", "w")
    val q = a.join(b, col("id") === col("id2"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("hex_encode"))
    assert(q.count() === 1)
  }
}
