package graft.sources

import java.io.{BufferedWriter, FileWriter}
import javax.xml.stream.XMLOutputFactory

import graft.model._

/**
 * File sinks mirroring the reference's export use case (`CityKGDB.java:65-69`):
 *
 *  - CityGML 2.0 writer (S6 semantics, `CityGMLV2DB.java:283-337`): one
 *    CityModel per partition, optional 2D bbox filter with the reference's
 *    touching-inclusive intersection test (`Neo4jDB.java:373-385`), UTF-8,
 *    indented;
 *  - CityJSON writer (S8 semantics, `CityJSONDB.java:106-142`): vertex
 *    precision 3 — coordinates quantized to ints with transform scale 0.001
 *    (`round(x*1000)` — the reference's applyTransformation(true) behaviour).
 *
 * The exported model is this engine's footprint feature model (ground ring +
 * envelope + attributes). Exports are driver-side like the reference (the
 * feature side is the small side of the engine; images never flow through
 * here). Round-trip fidelity is proven by re-ingesting with the readers.
 */
object Exporters {

  /** P6 bbox filter: touching boxes are kept; None = infinite box. */
  def bboxFilter(fps: Seq[Footprint], bbox: Option[Env6]): Seq[Footprint] = bbox match {
    case None => fps
    case Some(b) =>
      fps.filter(f => !(f.env.minx > b.maxx || f.env.maxx < b.minx ||
        f.env.miny > b.maxy || f.env.maxy < b.miny))
  }

  def exportCityGml(fps: Seq[Footprint], path: String, bbox: Option[Env6] = None,
                    srs: String = "urn:adv:crs:ETRS89_UTM32*DE_DHHN92_NH"): Unit = {
    val sel = bboxFilter(fps.filter(_.feature_type == "Building"), bbox)
    val w = new BufferedWriter(new FileWriter(path))
    val xof = XMLOutputFactory.newInstance()
    val x = xof.createXMLStreamWriter(w)
    try {
      x.writeStartDocument("UTF-8", "1.0")
      x.writeStartElement("core", "CityModel", NsCore)
      x.writeNamespace("core", NsCore)
      x.writeNamespace("bldg", NsBldg)
      x.writeNamespace("gml", NsGml)
      x.writeNamespace("gen", NsGen)
      if (sel.nonEmpty) {
        val env = sel.map(_.env).reduce((a, b) => Env6(
          math.min(a.minx, b.minx), math.min(a.miny, b.miny), math.min(a.minz, b.minz),
          math.max(a.maxx, b.maxx), math.max(a.maxy, b.maxy), math.max(a.maxz, b.maxz)))
        x.writeStartElement(NsGml, "boundedBy")
        x.writeStartElement(NsGml, "Envelope")
        x.writeAttribute("srsName", srs)
        x.writeAttribute("srsDimension", "3")
        el(x, NsGml, "lowerCorner", s"${env.minx} ${env.miny} ${env.minz}")
        el(x, NsGml, "upperCorner", s"${env.maxx} ${env.maxy} ${env.maxz}")
        x.writeEndElement(); x.writeEndElement()
      }
      sel.foreach { f =>
        x.writeStartElement(NsCore, "cityObjectMember")
        x.writeStartElement(NsBldg, "Building")
        x.writeAttribute(NsGml, "id", f.feature_id)
        f.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          x.writeStartElement(NsGen, "stringAttribute")
          x.writeAttribute("name", k)
          el(x, NsGen, "value", v)
          x.writeEndElement()
        }
        // ground surface with the footprint ring at minz
        x.writeStartElement(NsBldg, "boundedBy")
        x.writeStartElement(NsBldg, "GroundSurface")
        x.writeAttribute(NsGml, "id", s"${f.feature_id}_ground")
        x.writeStartElement(NsBldg, "lod2MultiSurface")
        x.writeStartElement(NsGml, "MultiSurface")
        x.writeStartElement(NsGml, "surfaceMember")
        x.writeStartElement(NsGml, "Polygon")
        x.writeAttribute(NsGml, "id", s"${f.feature_id}_ground_poly")
        ring(x, "exterior", f.ring, f.env.minz)
        f.holes.foreach(h => ring(x, "interior", h, f.env.minz))
        x.writeEndElement(); x.writeEndElement(); x.writeEndElement()
        x.writeEndElement(); x.writeEndElement(); x.writeEndElement()
        x.writeEndElement(); x.writeEndElement()
      }
      x.writeEndElement()
      x.writeEndDocument()
    } finally { x.close(); w.close() }
  }

  private val NsCore = "http://www.opengis.net/citygml/2.0"
  private val NsBldg = "http://www.opengis.net/citygml/building/2.0"
  private val NsGml = "http://www.opengis.net/gml"
  private val NsGen = "http://www.opengis.net/citygml/generics/2.0"

  private def el(x: javax.xml.stream.XMLStreamWriter, ns: String, name: String, text: String): Unit = {
    x.writeStartElement(ns, name); x.writeCharacters(text); x.writeEndElement()
  }

  private def ring(x: javax.xml.stream.XMLStreamWriter, kind: String, pts: Seq[XY], z: Double): Unit = {
    x.writeStartElement(NsGml, kind)
    x.writeStartElement(NsGml, "LinearRing")
    val closed = if (pts.nonEmpty && pts.head == pts.last) pts else pts :+ pts.head
    el(x, NsGml, "posList", closed.map(p => s"${p.x} ${p.y} $z").mkString(" "))
    x.writeEndElement(); x.writeEndElement()
  }

  /**
   * CityJSON 2.0 export with the reference's vertex quantization: precision 3
   * → transform.scale 0.001, vertices stored as round(v*1000) ints
   * (`CityJSONDB.java:118-121`).
   */
  def exportCityJson(fps: Seq[Footprint], path: String, srs: String = ""): Unit = {
    val sel = fps.filter(_.feature_type == "Building")
    val verts = scala.collection.mutable.LinkedHashMap.empty[(Long, Long, Long), Int]
    def vIdx(x: Double, y: Double, z: Double): Int = {
      val key = (math.round(x * 1000), math.round(y * 1000), math.round(z * 1000))
      verts.getOrElseUpdate(key, verts.size)
    }
    val objs = sel.map { f =>
      val extIdx = closedOpen(f.ring).map(p => vIdx(p.x, p.y, f.env.minz))
      val holeIdx = f.holes.map(h => closedOpen(h).map(p => vIdx(p.x, p.y, f.env.minz)))
      val boundaries = s"[[${(extIdx +: holeIdx).map(_.mkString("[", ",", "]")).mkString(",")}]]"
      val attrs = f.attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
      s"""${jq(f.feature_id)}:{"type":"Building","attributes":$attrs,""" +
        s""""geometry":[{"type":"MultiSurface","lod":"2","boundaries":$boundaries}]}"""
    }.mkString(",")
    val vertArr = verts.keys.map { case (a, b, c) => s"[$a,$b,$c]" }.mkString(",")
    val meta = if (srs.nonEmpty) s""","metadata":{"referenceSystem":${jq(srs)}}""" else ""
    val json =
      s"""{"type":"CityJSON","version":"2.0",""" +
        s""""transform":{"scale":[0.001,0.001,0.001],"translate":[0.0,0.0,0.0]},""" +
        s""""CityObjects":{$objs},"vertices":[$vertArr]$meta}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(path), json.getBytes("UTF-8"))
  }

  private def closedOpen(pts: Seq[XY]): Seq[XY] =
    if (pts.size > 1 && pts.head == pts.last) pts.dropRight(1) else pts

  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
