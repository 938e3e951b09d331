package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{GeoFunctionsImpl, RingKernels, SphereKernels}
import graft.TestSpark

/**
 * Geodesic (great-circle) kernels and the convex-hull kernel. The geodesic
 * gate is ScalaTest-only by design: StrictMath (fdlibm) is bit-specified, so
 * a driver-side replay must equal the executor codegen path EXACTLY (===),
 * while a DuckDB row is blocked by platform-libm trig — the same rule that
 * gates the BM25/TF-IDF ln() kernels. The hull kernel gets its DuckDB
 * recursive-CTE oracle via q93; here we pin the geometric contract.
 */
class GeodesicHullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val R = SphereKernels.EarthRadiusM

  test("haversine: known values, symmetry, identity, antipodal, clamp") {
    // one degree of longitude along the equator is exactly R * 1° in radians
    val oneDeg = SphereKernels.haversineM(0, 0, 1, 0)
    assert(math.abs(oneDeg - R * StrictMath.toRadians(1)) / oneDeg < 1e-12)
    // one degree of latitude along a meridian is the same arc
    assert(math.abs(SphereKernels.haversineM(10, 20, 10, 21) - oneDeg) / oneDeg < 1e-6)
    // identity and bit-exact symmetry (negation and squaring are exact)
    assert(SphereKernels.haversineM(11.5, 48.1, 11.5, 48.1) === 0.0)
    assert(SphereKernels.haversineM(11.5, 48.1, 2.35, 48.85) ===
      SphereKernels.haversineM(2.35, 48.85, 11.5, 48.1))
    // antipodal pair = half the great circle, exactly pi * R
    assert(SphereKernels.haversineM(0, 0, 180, 0) === StrictMath.PI * R)
    assert(SphereKernels.haversineM(0, -90, 0, 90) === StrictMath.PI * R)
    // a real pair within sanity bounds: Munich -> Paris ~ 684 km
    val mucPar = SphereKernels.haversineM(11.5755, 48.1372, 2.3522, 48.8566)
    assert(mucPar > 650000 && mucPar < 700000, s"got $mucPar")
  }

  test("st_dist_sphere / st_path_length_sphere codegen == driver StrictMath replay") {
    val rows = Seq(
      (1L, 11.5755, 48.1372, 2.3522, 48.8566),
      (2L, -73.9857, 40.7484, 151.2093, -33.8688),
      (3L, 0.0, 0.0, 0.0, 0.0),
      (4L, 179.9, 0.1, -179.9, -0.1))
    val got = rows.toDF("id", "lon1", "lat1", "lon2", "lat2")
      .select(col("id"), GeoFunctionsImpl.st_dist_sphere(
        col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("d"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, lon1, lat1, lon2, lat2) =>
      assert(got(id) === SphereKernels.haversineM(lon1, lat1, lon2, lat2),
        s"row $id must replay bit-exact")
    }
    // path over 3 points = ascending-sorted fold of the 2 segment distances
    val lons = Array(11.5755, 2.3522, -0.1276)
    val lats = Array(48.1372, 48.8566, 51.5072)
    val segs = Array(
      SphereKernels.haversineM(lons(0), lats(0), lons(1), lats(1)),
      SphereKernels.haversineM(lons(1), lats(1), lons(2), lats(2))).sorted
    val track = Seq((1L, lons.toSeq, lats.toSeq)).toDF("id", "lons", "lats")
      .select(GeoFunctionsImpl.st_path_length_sphere(col("lons"), col("lats")).as("m"))
      .as[Double].head()
    assert(track === segs(0) + segs(1))
    // degenerate inputs
    assert(SphereKernels.pathLengthM(new GenericArrayData(Array[Any](1.0)),
      new GenericArrayData(Array[Any](1.0))) === 0.0)
  }

  test("g17 geodesic kNN == driver StrictMath brute force (ranks and metres)") {
    val got = graft.SparkEntry.queries("g17_geodesic_knn")(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Double, Int)].collect()
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.length == 3))
    // brute-force replay: first ping per user by (ts, event_id), haversine
    // against the same landmark grid, top-3 by (d, id)
    val firsts = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.time.LocalDateTime, Long)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        (u, rs.minBy(r => (r._2.toLocalDate.toEpochDay,
          r._2.toLocalTime.toNanoOfDay, r._3))._3)
      }
    val landmarks = (0 until 24).map { i =>
      (s"L$i", -80.0 + (i % 6) * 3.2, 16.0 + (i / 6) * 3.5)
    }
    val want = firsts.flatMap { case (u, eid) =>
      val x = 457840.0 + ((eid * 7919) % 1600).toDouble * 0.01
      val y = 5439081.0 + ((eid * 104729) % 1400).toDouble * 0.01
      val lon = (x % 360.0) - 180.0; val lat = (y % 170.0) - 85.0
      landmarks.map { case (id, ll, la) =>
        (u, id, SphereKernels.haversineM(lon, lat, ll, la))
      }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((uu, id, d), i) => (uu, id, d, i + 1) }
    }.toSet
    assert(got.toSet === want, "kNN ranks and metres must replay bit-exact")
  }

  private def hull(pts: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val a = RingKernels.convexHull(
      new GenericArrayData(pts.map(_._1: Any).toArray),
      new GenericArrayData(pts.map(_._2: Any).toArray))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2); (r.getDouble(0), r.getDouble(1))
    }
  }

  test("convex hull: square with interior points -> CCW corners from lexicographic min") {
    val pts = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
      (2.0, 2.0), (1.0, 3.0), (2.0, 0.0) /* collinear boundary point drops */)
    assert(hull(pts) === Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
  }

  test("convex hull: degenerate inputs (collinear, duplicates, singletons)") {
    assert(hull(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0))) ===
      Seq((0.0, 0.0), (3.0, 3.0)), "collinear set reduces to its endpoints")
    assert(hull(Seq((2.0, 5.0), (2.0, 5.0), (2.0, 5.0))) === Seq((2.0, 5.0)))
    assert(hull(Seq((3.0, 1.0))) === Seq((3.0, 1.0)))
    assert(hull(Seq.empty) === Seq.empty)
    // duplicates of hull corners must not produce duplicate vertices
    assert(hull(Seq((0.0, 0.0), (0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 0.0))) ===
      Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)))
  }

  test("convex hull: property check on pseudo-random integer points") {
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    for (seed <- 1 to 40) {
      val pts = (0 until 24).map { j =>
        (((seed * 7919 + j * 31) % 101).toDouble, ((seed * 104729 + j * 97) % 89).toDouble)
      }
      val h = hull(pts)
      assert(h.toSet.subsetOf(pts.toSet), "hull vertices come from the input")
      // strict convexity: every consecutive triple turns left
      if (h.length >= 3) {
        for (i <- h.indices)
          assert(cross(h(i), h((i + 1) % h.length), h((i + 2) % h.length)) > 0,
            s"seed $seed: hull must be strictly convex CCW")
        // every input point lies inside or on the hull (left of every edge)
        for (p <- pts; i <- h.indices)
          assert(cross(h(i), h((i + 1) % h.length), p) >= 0,
            s"seed $seed: point $p escapes the hull")
      }
      assert(h.head === pts.sorted.min, "hull starts at the lexicographic minimum")
    }
  }

  private def dp(xs: Seq[Double], ys: Seq[Double], eps2: Double): Seq[Int] = {
    val a = RingKernels.simplifyDpIdx(
      new GenericArrayData(xs.map(x => x: Any).toArray),
      new GenericArrayData(ys.map(y => y: Any).toArray), eps2)
    (0 until a.numElements()).map(a.getInt)
  }

  test("Douglas-Peucker: spike kept, straight runs dropped, endpoints always kept") {
    // spike at index 2 (perp 3 > eps 1) splits; the flat flanks collapse
    assert(dp(Seq(0, 1, 2, 3, 4), Seq(0, 0, 3, 0, 0), eps2 = 1.0) === Seq(0, 2, 4))
    // perfectly straight: endpoints only
    assert(dp((0 to 9).map(_.toDouble), (0 to 9).map(_ * 2.0), eps2 = 0.25) === Seq(0, 9))
    // everything significant at tiny eps: all vertices kept
    assert(dp(Seq(0, 1, 2, 3), Seq(0, 2, -2, 0), eps2 = 0.0001) === Seq(0, 1, 2, 3))
    // degenerate sizes
    assert(dp(Seq(5.0), Seq(5.0), 1.0) === Seq(0))
    assert(dp(Seq(1.0, 2.0), Seq(1.0, 2.0), 1.0) === Seq(0, 1))
    assert(dp(Seq.empty, Seq.empty, 1.0) === Seq.empty)
    // closed ring contract: first == last -> degenerate chord, collapses
    assert(dp(Seq(0, 2, 2, 0, 0), Seq(0, 0, 2, 2, 0), eps2 = 1.0) === Seq(0, 4))
  }

  test("Douglas-Peucker SQL surface; radial pre-thin (q81) keeps a superset context") {
    GeoFunctionsImpl.register(spark)
    val kept = spark.sql(
      """SELECT st_simplify_dp(array(0D, 1D, 2D, 3D, 4D),
                               array(0D, 0D, 3D, 0D, 0D), 1.0D) AS k""")
      .head().getSeq[Int](0)
    assert(kept === Seq(0, 2, 4))
    // q95 fixture: eps bites selectively across ids (the oracle's variety)
    val q95 = graft.SparkEntry.queries("q95_simplify_dp")(spark, "/root/testdata/sf0.001")
    val sizes = q95.as[(Long, Int, String)].collect().map(_._2).toSet
    assert(sizes.size > 1 && sizes.forall(n => n >= 2 && n <= 12), s"sizes $sizes")
  }

  test("convex hull idempotence; DP structural invariants on random lattices") {
    for (seed <- 1 to 25) {
      val pts = (0 until 20).map { j =>
        (((seed * 31 + j * 17) % 23).toDouble, ((seed * 57 + j * 41) % 19).toDouble)
      }
      val h = hull(pts)
      // the hull of the hull's vertex set is the same cycle (idempotence)
      assert(hull(h) === h, s"seed $seed: hull must be idempotent")
      // DP: kept indices are strictly increasing, endpoints always present,
      // and a zero epsilon keeps every vertex that bends
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      val kept = dp(xs, ys, eps2 = 4.0)
      assert(kept.head === 0 && kept.last === pts.length - 1, s"seed $seed endpoints")
      assert(kept === kept.sorted && kept.distinct === kept, s"seed $seed ordering")
      assert(kept.toSet.subsetOf(pts.indices.toSet))
      val all = dp(xs, ys, eps2 = 0.0)
      assert(kept.size <= all.size, s"seed $seed: eps=0 keeps a superset")
    }
  }

  test("st_convex_hull SQL surface and q93 fixture shape") {
    GeoFunctionsImpl.register(spark)
    val n = spark.sql(
      """SELECT size(st_convex_hull(array(0D, 4D, 4D, 0D, 2D), array(0D, 0D, 4D, 4D, 2D)))"""
    ).head().getInt(0)
    assert(n === 4)
    val q93 = graft.SparkEntry.queries("q93_convex_hull")(spark, "/root/testdata/sf0.001")
    val rows = q93.as[(Long, Int, String, Double)].collect()
    assert(rows.length === 200)
    // hull string round-trips the vertex count and the area is a positive
    // half-integer (integer lattice -> shoelace sum is an integer)
    rows.foreach { case (id, nh, hs, area) =>
      assert(hs.split(";").length === nh, s"poly $id")
      assert(nh >= 3 && area > 0 && (area * 2) === math.rint(area * 2), s"poly $id")
    }
  }
}
