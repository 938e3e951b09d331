package graft

/**
 * Core row types of the engine (Spark-encodable case classes — the typed
 * Dataset replacement for the reference's reflective node/edge shredding,
 * `Neo4jDB.java:185-257`: one feature = one nested row, not a subgraph).
 */
object model {

  final case class XY(x: Double, y: Double)

  /** 3D AABB row (reference `GraphUtils.getBoundingBox` shape, GraphUtils.java:21-48). */
  final case class Env6(minx: Double, miny: Double, minz: Double,
                        maxx: Double, maxy: Double, maxz: Double)

  /**
   * One footprint feature (FIXTURES.md §2 schema). `partition_id` carries the
   * reference's `__PARTITION_INDEX__<i>` dataset-index semantics
   * (`Neo4jDB.java:254`) as a partition column → partition pruning for free.
   */
  final case class Footprint(
      feature_id: String,
      feature_type: String,
      partition_id: Int,
      ring: Seq[XY],
      holes: Seq[Seq[XY]],
      env: Env6,
      centroid: XY,
      attrs: Map[String, String])

  final case class XYZ(x: Double, y: Double, z: Double)

  /**
   * One 3D boundary-surface polygon of a building (walls/roofs/ground…) —
   * the full-fidelity geometry row that [[Footprint]] (2D ground ring +
   * envelope) deliberately projects away. Carried ingest → table → export so
   * a mapped model re-emits ALL its surfaces, mirroring the reference's
   * whole-tree export (`CityGMLV2DB.java:283-337`).
   */
  final case class SurfacePoly(
      feature_id: String,     // owning top-level feature (building)
      surface_id: String,
      surface_type: String,   // GroundSurface | WallSurface | RoofSurface | …
      partition_id: Int,
      poly_id: String,
      exterior: Seq[XYZ],
      interiors: Seq[Seq[XYZ]])

  /** XLink edge candidate: owner object --href--> target id (reference J1 input). */
  final case class HrefRef(owner_id: String, href: String, partition_id: Int)

  /** Identifiable object (join build side of XLink resolution). */
  final case class IdRec(id: String, kind: String, partition_id: Int)

  /** Synthetic image+caption row (BASELINE.json input_hint schema + geotag). */
  final case class ImageRow(
      image_id: String,
      bytes: Array[Byte],
      w: Int,
      h: Int,
      fmt: String,
      caption: String,
      phash: Long,
      x: Double,
      y: Double)

  def envOf(pts: Iterable[(Double, Double, Double)]): Env6 = {
    var nx, ny, nz = Double.PositiveInfinity
    var xx, xy, xz = Double.NegativeInfinity
    pts.foreach { case (x, y, z) =>
      if (x < nx) nx = x; if (x > xx) xx = x
      if (y < ny) ny = y; if (y > xy) xy = y
      if (z < nz) nz = z; if (z > xz) xz = z
    }
    Env6(nx, ny, nz, xx, xy, xz)
  }
}
