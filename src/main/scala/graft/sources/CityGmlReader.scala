package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.jdk.CollectionConverters._

import graft.core.Geom
import graft.model._

/**
 * StAX (streaming) CityGML 1.0/2.0 reader → footprint rows.
 *
 * Capability match for the reference's chunked CityGML scan
 * (`CityGMLV2DB.java:57-134`, chunking at :70): bounded-memory event parsing,
 * one top-level feature at a time — but instead of shredding the citygml4j
 * object tree into graph nodes (`Neo4jDB.java:185-257`) we extract the typed
 * footprint rows directly (SURVEY.md §1.4: nested rows replace subgraphs).
 *
 * Emits per document:
 *  - buildings with id, generic attributes, all boundary-surface polygons,
 *  - XLink href records (e.g. gml:Solid surfaceMember href="#PolyID…",
 *    fzk_haus_lod2_v1.gml) for the J1 equi-join,
 *  - id records for every gml:id (join build side).
 *
 * Runs inside `mapPartitions` over a Dataset of file paths at scale via
 * [[DistributedIngest]] — the parse itself is per-file, embarrassingly
 * parallel, shuffle-free. [[parseDirectory]] below is the driver-side
 * convenience for tests/small inputs only.
 */
object CityGmlReader {

  final case class GmlPolygon(
      polyId: String,
      surfaceId: String,
      surfaceType: String,
      exterior: Array[(Double, Double, Double)],
      interiors: Array[Array[(Double, Double, Double)]])

  final case class GmlBuilding(
      id: String,
      attrs: Map[String, String],
      polygons: Seq[GmlPolygon],
      hrefs: Seq[String])

  final case class GmlDoc(buildings: Seq[GmlBuilding], srs: String)

  private[sources] val SurfaceTypes = Set("GroundSurface", "WallSurface", "RoofSurface",
    "CeilingSurface", "FloorSurface", "ClosureSurface", "OuterCeilingSurface",
    "OuterFloorSurface")

  // building scalar properties promoted into attrs (kept as strings, mirroring
  // the reference's string-property storage, Neo4jDB.java:242-244)
  private val ScalarProps = Set("creationDate", "yearOfConstruction", "roofType",
    "measuredHeight", "storeysAboveGround", "storeysBelowGround", "function",
    "usage", "class")

  def parse(in: java.io.InputStream): GmlDoc = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(in)
    try parseDoc(r) finally r.close()
  }

  def parseFile(path: String): GmlDoc = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try parse(in) finally in.close()
  }

  private def attr(r: XMLStreamReader, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return Option(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  private def parseDoc(r: XMLStreamReader): GmlDoc = {
    val buildings = Seq.newBuilder[GmlBuilding]
    var srs = ""
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Envelope" =>
              attr(r, "srsName").foreach(s => if (srs.isEmpty) srs = s)
            case "Building" =>
              buildings += parseBuilding(r, attr(r, "id").getOrElse(""))
            case _ =>
          }
        case _ =>
      }
    }
    GmlDoc(buildings.result(), srs)
  }

  private def parseBuilding(r: XMLStreamReader, bid: String): GmlBuilding = {
    val attrs = Map.newBuilder[String, String]
    val polys = Seq.newBuilder[GmlPolygon]
    val hrefs = Seq.newBuilder[String]
    var depth = 1
    var surfaceType = "Building"
    var surfaceId = bid
    var genAttrName: String = null
    var inGenAttrV3 = false // CityGML 3.0 generics: name/value are CHILD elements
    var scalarProp: String = null
    // polygon state
    var polyId: String = null
    var inInterior = false
    var ext: Array[(Double, Double, Double)] = null
    val ints = scala.collection.mutable.ArrayBuffer.empty[Array[(Double, Double, Double)]]
    val coords = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    var inRing = false

    while (r.hasNext && depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          val name = r.getLocalName
          name match {
            case s if SurfaceTypes(s) =>
              surfaceType = s
              surfaceId = attr(r, "id").getOrElse(s"$bid/$s")
            case "Polygon" =>
              polyId = attr(r, "id").getOrElse("")
              ext = null; ints.clear()
            case "exterior" => inInterior = false
            case "interior" => inInterior = true
            case "LinearRing" => inRing = true; coords.clear()
            case "pos" | "posList" if inRing =>
              val vals = readText(r).trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
              var i = 0
              while (i + 3 <= vals.length) {
                coords += ((vals(i), vals(i + 1), vals(i + 2)))
                i += 3
              }
              depth -= 1 // readText consumed the END_ELEMENT
            case "measureAttribute" | "stringAttribute" | "intAttribute" |
                 "doubleAttribute" | "dateAttribute" | "uriAttribute" =>
              genAttrName = attr(r, "name").orNull
            // CityGML 3.0 generics: capitalized element, name as a child
            case "StringAttribute" | "IntAttribute" | "DoubleAttribute" |
                 "MeasureAttribute" | "DateAttribute" | "URIAttribute" |
                 "CodeAttribute" =>
              inGenAttrV3 = true
            case "name" if inGenAttrV3 =>
              genAttrName = readText(r).trim
              depth -= 1
            case "value" if genAttrName != null =>
              attrs += genAttrName -> readText(r).trim
              genAttrName = null
              depth -= 1
            case p if ScalarProps(p) && r.getNamespaceURI != null &&
                      (r.getNamespaceURI.contains("citygml")) =>
              scalarProp = p
              val t = readText(r).trim
              if (t.nonEmpty) attrs += p -> t
              scalarProp = null
              depth -= 1
            case "surfaceMember" | "baseSurface" =>
              attr(r, "href").foreach(h => hrefs += h)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          r.getLocalName match {
            case "StringAttribute" | "IntAttribute" | "DoubleAttribute" |
                 "MeasureAttribute" | "DateAttribute" | "URIAttribute" |
                 "CodeAttribute" =>
              inGenAttrV3 = false
            case "LinearRing" =>
              inRing = false
              if (inInterior) ints += coords.toArray else ext = coords.toArray
            case "Polygon" =>
              if (ext != null)
                polys += GmlPolygon(polyId, surfaceId, surfaceType, ext, ints.toArray)
            case s if SurfaceTypes(s) =>
              surfaceType = "Building"; surfaceId = bid
            case _ =>
          }
        case _ =>
      }
    }
    GmlBuilding(bid, attrs.result(), polys.result(), hrefs.result())
  }

  /** Reads text content up to the matching END_ELEMENT (coalescing on). */
  private def readText(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var done = false
    var d = 1
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          sb.append(r.getText)
        case XMLStreamConstants.START_ELEMENT => d += 1
        case XMLStreamConstants.END_ELEMENT =>
          d -= 1
          if (d == 0) done = true
        case _ =>
      }
    }
    sb.toString
  }

  // ---- footprint derivation ----

  private def ring2D(pts: Array[(Double, Double, Double)]): Seq[XY] =
    pts.map(p => XY(p._1, p._2)).toSeq

  private def centroidOf(ring: Seq[XY]): XY = {
    val c = Geom.Polygon.ringCentroid(ring.map(p => Geom.Pt(p.x, p.y)).toArray)
    XY(c.x, c.y)
  }

  /**
   * Footprint rows: one per boundary surface + one per building.
   * Building env = min/max over ALL its polygon vertices — the reference's
   * `calcTLBbox` aggregation semantics (`CityGMLV2DB.java:172-209`).
   * Building ring = the GroundSurface exterior (fallback: lowest-z polygon).
   */
  def toFootprints(doc: GmlDoc, partitionId: Int): Seq[Footprint] = {
    doc.buildings.flatMap { b =>
      val bySurface = b.polygons.groupBy(p => (p.surfaceId, p.surfaceType))
      val surfRows = bySurface.toSeq.sortBy(_._1._1).map { case ((sid, stype), ps) =>
        val allPts = ps.flatMap(p => p.exterior ++ p.interiors.flatten)
        val r2 = ring2D(ps.head.exterior)
        Footprint(sid, stype, partitionId, r2,
          ps.head.interiors.map(ring2D).toSeq, envOf(allPts), centroidOf(r2), Map.empty)
      }
      val allPts = b.polygons.flatMap(p => p.exterior ++ p.interiors.flatten)
      val ground = b.polygons.filter(_.surfaceType == "GroundSurface") match {
        case Seq() if b.polygons.nonEmpty =>
          Some(b.polygons.minBy(p => p.exterior.map(_._3).max))
        case Seq() => None
        case gs => Some(gs.head)
      }
      val bRow = ground.map { g =>
        val r2 = ring2D(g.exterior)
        Footprint(b.id, "Building", partitionId, r2,
          g.interiors.map(ring2D).toSeq, envOf(allPts), centroidOf(r2), b.attrs)
      }
      bRow.toSeq ++ surfRows
    }
  }

  /**
   * Directory scan (reference S4, `CityKGDB.mapCityDir`, CityKGDB.java:159-258):
   * every .gml/.xml file under `dir` belongs to ONE dataset/partition; the
   * per-file CityModels are merged by union, file order = sorted walk order
   * (reference W3 merge semantics, CityKGDB.java:231-255).
   */
  def parseDirectory(dir: String): GmlDoc = {
    val files = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.filter(p => {
          val n = p.toString.toLowerCase
          java.nio.file.Files.isRegularFile(p) && (n.endsWith(".gml") || n.endsWith(".xml"))
        }).toSeq.sortBy(_.toString)
      finally s.close()
    }
    val docs = files.map(f => parseFile(f.toString))
    GmlDoc(docs.flatMap(_.buildings), docs.map(_.srs).find(_.nonEmpty).getOrElse(""))
  }

  /** Full-fidelity 3D boundary-surface rows (one per polygon) — the export
    * side re-emits these verbatim, so map→export keeps walls/roofs/openings,
    * not just the ground projection (reference `CityGMLV2DB.java:283-337`). */
  def toSurfaces(doc: GmlDoc, partitionId: Int): Seq[SurfacePoly] =
    doc.buildings.flatMap { b =>
      b.polygons.map { p =>
        SurfacePoly(b.id, p.surfaceId, p.surfaceType, partitionId, p.polyId,
          p.exterior.map(t => XYZ(t._1, t._2, t._3)).toSeq,
          p.interiors.map(_.map(t => XYZ(t._1, t._2, t._3)).toSeq).toSeq)
      }
    }

  /** Href records for the J1 XLink-resolution join. */
  def toHrefs(doc: GmlDoc, partitionId: Int): Seq[HrefRef] =
    doc.buildings.flatMap(b => b.hrefs.map(h => HrefRef(b.id, h, partitionId)))

  /** Id records (targets of XLink resolution): building, surface and polygon ids. */
  def toIds(doc: GmlDoc, partitionId: Int): Seq[IdRec] =
    doc.buildings.flatMap { b =>
      Seq(IdRec(b.id, "Building", partitionId)) ++
        b.polygons.flatMap(p => Seq(
          IdRec(p.polyId, "Polygon", partitionId),
          IdRec(p.surfaceId, p.surfaceType, partitionId))).distinct
    }
}
