package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

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
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GeoFunctionsImpl.register(spark)
}
