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
}
