package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HilbertSpec extends AnyFunSuite {

  test("xy2d/d2xy round-trip and unit-step adjacency over a full level-6 curve") {
    val order = 6
    val n = 1L << order
    var prev: (Long, Long) = null
    var d = 0L
    while (d < n * n) {
      val (x, y) = HilbertGrid.d2xy(order, d)
      assert(HilbertGrid.xy2d(order, x, y) === d, s"round-trip broke at d=$d")
      if (prev != null) {
        val step = math.abs(x - prev._1) + math.abs(y - prev._2)
        assert(step === 1L,
          s"consecutive ids must be ADJACENT cells (the Hilbert property Z-order lacks): d=$d step=$step")
      }
      prev = (x, y)
      d += 1
    }
  }

  test("encode: packing, level recovery, bounds round-trip, boundary clamp") {
    val cell = HilbertGrid.encode(457840.0, 5439081.0, 12)
    assert(HilbertGrid.levelOf(cell) === 12)
    val (bx, by, s) = HilbertGrid.bounds(cell)
    assert(bx <= 457840.0 && 457840.0 < bx + s)
    assert(by <= 5439081.0 && 5439081.0 < by + s)
    // same grid mapping as ZGrid: identical (ix, iy) for identical input
    val z = ZGrid.encode(457840.0, 5439081.0, 12)
    val (hx, hy) = HilbertGrid.d2xy(12, HilbertGrid.dOf(cell))
    assert((hx, hy) === ((ZGrid.ix(z), ZGrid.iy(z))))
    // out-of-domain points clamp, never throw
    assert(HilbertGrid.levelOf(HilbertGrid.encode(-1e9, 1e12, 8)) === 8)
  }

  test("locality: square windows fragment into FEWER contiguous id runs than Z-order") {
    // the reason hilbert_encode exists (Moon et al. 2001): for a clustered
    // table layout, each contiguous id run is a row-group range the scan
    // can address as one unit — fewer runs = fewer fragments per query
    val order = 8
    val rng = new scala.util.Random(42)
    def runs(ids: Seq[Long]): Int = {
      val s = ids.sorted
      1 + s.zip(s.tail).count { case (a, b) => b != a + 1 }
    }
    var hTotal = 0L
    var zTotal = 0L
    for (_ <- 0 until 60) {
      val w = 8 + rng.nextInt(24)
      val x0 = rng.nextInt(256 - w)
      val y0 = rng.nextInt(256 - w)
      val cells = for (x <- x0 until (x0 + w); y <- y0 until (y0 + w)) yield (x.toLong, y.toLong)
      hTotal += runs(cells.map { case (x, y) => HilbertGrid.xy2d(order, x, y) })
      zTotal += runs(cells.map { case (x, y) => ZGrid.interleave(x, y) })
    }
    assert(hTotal < zTotal,
      s"Hilbert must fragment less than Z-order (hilbert=$hTotal z=$zTotal)")
    assert(hTotal.toDouble / zTotal.toDouble < 0.8,
      s"expected a substantive locality win, got hilbert=$hTotal z=$zTotal")
  }

  test("hilbert_encode expression: codegen projection, SQL-registered, matches core") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pts = Seq((457840.5, 5439081.5), (1000.0, 2000.0), (457999.9, 5439200.1))
      .toDF("x", "y")
    val got = pts.select(org.apache.spark.sql.graft.GeoFunctionsImpl
      .hilbert_encode(col("x"), col("y"), lit(14)).as("c")).as[Long].collect()
    val want = pts.as[(Double, Double)].collect()
      .map { case (x, y) => HilbertGrid.encode(x, y, 14) }
    assert(got.toSeq === want.toSeq)
    org.apache.spark.sql.graft.GeoFunctionsImpl.register(spark)
    pts.createOrReplaceTempView("hpts")
    val viaSql = spark.sql("SELECT hilbert_encode(x, y, 14) AS c FROM hpts")
      .as[Long].collect()
    assert(viaSql.toSeq === want.toSeq)
  }
}
