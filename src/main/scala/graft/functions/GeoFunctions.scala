package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Public column API for the engine's geospatial expressions (SURVEY.md §2.9). */
object GeoFunctions {
  def hex_encode(x: Column, y: Column, res: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.hex_encode(x, y, res)
  def z_encode(x: Column, y: Column, level: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.z_encode(x, y, level)
  def tile_of(x: Column, y: Column, z: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.tile_of(x, y, z)
  def st_covers_ring(ring: Column, x: Column, y: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.st_covers_ring(ring, x, y)
  def st_covers(ring: Column, holes: Column, x: Column, y: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.st_covers(ring, holes, x, y)
  def hex_cover(ring: Column, res: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.hex_cover(ring, res)
  def z_cell_x(cell: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.z_cell_x(cell)
  def z_cell_y(cell: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.z_cell_y(cell)
  def tile_cover(env: Column, z: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.tile_cover(env, z)
  def hex_ring(x: Column, y: Column, res: Column, r: Column): Column =
    org.apache.spark.sql.graft.GeoFunctionsImpl.hex_ring(x, y, res, r)

  /**
   * Area fraction of an axis-aligned envelope inside ONE WMTS tile at zoom
   * `z` — the raster↔vector ZONAL WEIGHT. Pairing
   * `explode(tile_cover(env, z))` with this column upgrades the engine's
   * boolean tile assignment (q46/g3) to an area-weighted assignment: per-tile
   * zonal statistics, pyramid-level density rollups, and split-feature
   * accounting where a footprint straddling k tiles contributes its exact
   * area share to each. Composed purely from codegen built-ins (bit-ops on
   * the packed tile id → tile bounds, greatest/least clip) — scan-local, no
   * new kernel, whole-stage codegen. Exactness: Span = 2^25 and tile counts
   * are powers of two, so tile bounds and (for integer-valued envelope
   * corners) clip widths are EXACT doubles; the single final division is
   * correctly rounded — replayable bit-for-bit in ANSI SQL (q77 oracle).
   * Touch-only tiles get 0.0; a degenerate zero-area envelope gets 0.0.
   */
  def tile_clip_frac(tileId: Column, env: Column, z: Int): Column = {
    val n = 1L << z
    val ts = graft.core.Tiles.tileSize(z)
    val mask = (1L << 29) - 1
    val tx = shiftrightunsigned(tileId, 29).bitwiseAND(lit(mask))
    val ty = tileId.bitwiseAND(lit(mask))
    val txmin = tx.cast("double") * lit(ts)
    val tymin = (lit(n - 1L) - ty).cast("double") * lit(ts)
    val w = least(env.getField("maxx"), txmin + lit(ts)) -
      greatest(env.getField("minx"), txmin)
    val h = least(env.getField("maxy"), tymin + lit(ts)) -
      greatest(env.getField("miny"), tymin)
    val area = (env.getField("maxx") - env.getField("minx")) *
      (env.getField("maxy") - env.getField("miny"))
    when(area > lit(0.0),
      greatest(lit(0.0), w) * greatest(lit(0.0), h) / area).otherwise(lit(0.0))
  }
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GeoFunctionsImpl.register(spark)
}
