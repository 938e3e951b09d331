package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tile-density hotspot scoring (a Getis-Ord-flavoured neighborhood
 * statistic over the WMTS grid): per-tile point counts, 3×3 neighborhood
 * sums via the packed-id offset trick (a neighbor is `tile_id ± 2^29 ± 1`
 * — no unpack/repack round trip), and a z-score of each tile's count
 * against the global count distribution. Shuffle shape: ONE groupBy on the
 * tile key (map-side combined counts — the only pass over the points),
 * then everything downstream operates on the #tiles-sized count table
 * (a 9-way explode + equi-join and one broadcast of the 3-number global
 * stats row). At 10^12 points the points are read once; the analytics run
 * on thousands of rows.
 *
 * Exactness contract (q84): counts and neighborhood sums are integers;
 * mean/variance derive from integer sums via single IEEE divisions and one
 * subtraction, and the z-score spells the same expression tree in the SQL
 * replay — bit-exact cross-engine. Tiles at the domain edge would wrap
 * under the offset trick; callers with edge-adjacent data should filter to
 * interior tiles (the fixture region is deep-interior, SURVEY §2.9 domain).
 */
object Hotspots {

  /** (tile_id, c, nbr_sum, z) for every non-empty tile at zoom `z`. */
  def tileHotspots(pts: DataFrame, x: Column, y: Column, zoom: Int): DataFrame = {
    // the explicit isnotnull mirrors the filter the inner join would push
    // down later — with it in place, all three consumers of `counts` (the
    // neighbor sums, the join, the global stats) sit on an IDENTICAL
    // exchange subtree, so ReuseExchange computes the point scan + count
    // shuffle ONCE (plan-gated in PlanQualitySpec)
    val counts = pts
      .select(graft.functions.GeoFunctions.tile_of(x, y, lit(zoom)).as("tile_id"))
      .where(col("tile_id").isNotNull)
      .groupBy("tile_id").agg(count(lit(1)).as("c"))
    // 3×3 neighborhood: packed [z|x(29)|y(29)] makes x±1 a ±2^29 id shift
    val xStep = 1L << 29
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield lit(dx.toLong * xStep + dy.toLong)
    val nbr = counts
      .select(explode(array(offsets.map(o => col("tile_id") + o): _*)).as("tile_id"),
        col("c"))
      .groupBy("tile_id").agg(sum(col("c")).as("nbr_sum"))
    val stats = counts.agg(count(lit(1)).as("n"), sum(col("c")).as("total"),
      sum(col("c") * col("c")).as("sumsq"))
    val mean = col("total").cast("double") / col("n").cast("double")
    val variance = col("sumsq").cast("double") / col("n").cast("double") - mean * mean
    counts.join(nbr, Seq("tile_id"))
      .join(broadcast(stats))
      .select(col("tile_id"), col("c"), col("nbr_sum"),
        ((col("c").cast("double") - mean) / sqrt(variance)).as("z"))
  }

  /**
   * Kernel-density heatmap surface over a square grid (Epanechnikov kernel
   * — the POLYNOMIAL kernel, chosen over Gaussian deliberately: no exp(), so
   * every per-point term is plain IEEE arithmetic and the whole surface is
   * exactly replayable in ANSI SQL, where a Gaussian would hit the
   * cross-engine libm rule). Per grid cell with center c:
   * density(c) = Σ_{points p, |p−c|² < h²} (1 − |p−c|²/h²).
   *
   * Shuffle shape for 10^12 points: each point explodes to its 3×3 cell
   * neighborhood SCAN-LOCALLY (9 rows, guaranteed to cover the kernel
   * support while √h2 ≤ cell — `require`d), then ONE groupBy on the cell
   * key; everything else is per-cell arithmetic on the #cells-sized table.
   * The per-cell sum folds the term list in ASCENDING order (the q73/q80
   * sorted-fold contract), so the summed doubles are partitioning-invariant
   * AND bit-equal to DuckDB's `list_sum(list_sort(...))` left fold — q96
   * hash-gates the whole surface. `h2` is h² passed directly (computing h·h
   * on one side and writing a literal on the other can differ by 1 ulp).
   *
   * Output: (cell_x, cell_y, n_pts, density) for cells with ≥ 1 in-range
   * point. Interpreted-HOF fold is per CELL (thousands), not per point.
   */
  def kdeGrid(points: DataFrame, x0: Double, y0: Double,
              cell: Double, h2: Double): DataFrame = {
    require(h2 <= cell * cell,
      s"kernel radius ${math.sqrt(h2)} (h2 $h2) exceeds the cell size $cell — " +
        "the 3x3 neighborhood would miss in-range points")
    val offs = array(lit(-1L), lit(0L), lit(1L))
    val ctrX = lit(x0) + (col("cell_x").cast("double") + lit(0.5)) * lit(cell)
    val ctrY = lit(y0) + (col("cell_y").cast("double") + lit(0.5)) * lit(cell)
    points
      .select(col("x"), col("y"),
        floor((col("x") - lit(x0)) / lit(cell)).cast("long").as("px"),
        floor((col("y") - lit(y0)) / lit(cell)).cast("long").as("py"))
      .withColumn("dx", explode(offs))
      .withColumn("dy", explode(offs))
      .select(col("x"), col("y"),
        (col("px") + col("dx")).as("cell_x"), (col("py") + col("dy")).as("cell_y"))
      .withColumn("d2",
        (col("x") - ctrX) * (col("x") - ctrX) + (col("y") - ctrY) * (col("y") - ctrY))
      .where(col("d2") < lit(h2))
      .withColumn("term", lit(1.0) - col("d2") / lit(h2))
      .groupBy("cell_x", "cell_y")
      .agg(count(lit(1)).as("n_pts"),
        aggregate(sort_array(collect_list(col("term"))), lit(0.0),
          (acc, t) => acc + t).as("density"))
  }
}
