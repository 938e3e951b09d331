package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.Geom
import graft.model._

/**
 * CityJSON 1.x/2.0 reader → footprint rows.
 *
 * Capability match for the reference's whole-file CityJSON scan
 * (`CityJSONDB.java:71-103`): quantized integer vertices are de-quantized by
 * the document `transform` (scale+translate) on ingest, mirroring the
 * reference's `applyTransformation` handling; the reference's export
 * quantization (vertex precision 3, `CityJSONDB.java:118-121`) is the inverse
 * `round(x*1000)/1000` applied by [[graft.sources.Exporters]].
 *
 * One document = one dataset/partition (`__PARTITION_INDEX__` semantics).
 */
object CityJsonReader {

  final case class CjDoc(buildings: Seq[CityGmlReader.GmlBuilding], srs: String)

  def parseFile(path: String): CjDoc =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(jsonText: String): CjDoc = {
    val j = JsonMethods.parse(jsonText)
    val scale = (j \ "transform" \ "scale") match {
      case JArray(s) => s.map(num).toArray
      case _ => Array(1.0, 1.0, 1.0)
    }
    val translate = (j \ "transform" \ "translate") match {
      case JArray(t) => t.map(num).toArray
      case _ => Array(0.0, 0.0, 0.0)
    }
    val verts: Array[(Double, Double, Double)] = (j \ "vertices") match {
      case JArray(vs) => vs.map {
        case JArray(List(x, y, z)) =>
          (num(x) * scale(0) + translate(0),
           num(y) * scale(1) + translate(1),
           num(z) * scale(2) + translate(2))
        case v => sys.error(s"bad vertex: $v")
      }.toArray
      case _ => Array.empty
    }
    val srs = (j \ "metadata" \ "referenceSystem") match {
      case JString(s) => s
      case _ => ""
    }
    val buildings = (j \ "CityObjects") match {
      case JObject(fields) => fields.collect {
        case (id, obj) if (obj \ "type") == JString("Building") =>
          parseBuilding(id, obj, verts)
      }
      case _ => Nil
    }
    CjDoc(buildings, srs)
  }

  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case x => sys.error(s"not a number: $x")
  }

  private def parseBuilding(id: String, obj: JValue,
                            verts: Array[(Double, Double, Double)]): CityGmlReader.GmlBuilding = {
    val attrs: Map[String, String] = (obj \ "attributes") match {
      case JObject(fs) => fs.map { case (k, v) =>
        k -> (v match {
          case JString(s) => s
          case JInt(i) => i.toString
          case JDouble(d) => d.toString
          case JLong(l) => l.toString
          case JBool(b) => b.toString
          case other => JsonMethods.compact(JsonMethods.render(other))
        })
      }.toMap
      case _ => Map.empty
    }
    // geometry: list of Solid / MultiSurface / CompositeSurface; collect
    // faces with their semantic surface type when the document carries a
    // CityJSON `semantics` object (surfaces[] + values aligned with faces)
    val faces = scala.collection.mutable.ArrayBuffer.empty[(Array[Array[Int]], Option[String])]
    (obj \ "geometry") match {
      case JArray(geoms) => geoms.foreach { g =>
        val btype = (g \ "type") match { case JString(s) => s; case _ => "" }
        val bounds = g \ "boundaries"
        val semTypes: Array[String] = (g \ "semantics" \ "surfaces") match {
          case JArray(ss) => ss.map(s => (s \ "type") match {
            case JString(t) => t; case _ => ""
          }).toArray
          case _ => Array.empty
        }
        def semAt(v: Option[JValue]): Option[String] = v match {
          case Some(JInt(i)) if i.toInt >= 0 && i.toInt < semTypes.length =>
            Some(semTypes(i.toInt)).filter(_.nonEmpty)
          case Some(JLong(l)) if l.toInt >= 0 && l.toInt < semTypes.length =>
            Some(semTypes(l.toInt)).filter(_.nonEmpty)
          case _ => None
        }
        btype match {
          case "Solid" =>
            val shellVals: List[JValue] = (g \ "semantics" \ "values") match {
              case JArray(x) => x; case _ => Nil
            }
            bounds match {
              case JArray(shells) => shells.zipWithIndex.foreach {
                case (JArray(fs), si) =>
                  val vals: List[JValue] = shellVals.lift(si) match {
                    case Some(JArray(x)) => x; case _ => Nil
                  }
                  fs.zipWithIndex.foreach { case (f, fi) =>
                    faces += ((faceRings(f), semAt(vals.lift(fi))))
                  }
                case _ =>
              }
              case _ =>
            }
          case "MultiSurface" | "CompositeSurface" =>
            val vals: List[JValue] = (g \ "semantics" \ "values") match {
              case JArray(x) => x; case _ => Nil
            }
            bounds match {
              case JArray(fs) => fs.zipWithIndex.foreach { case (f, fi) =>
                faces += ((faceRings(f), semAt(vals.lift(fi))))
              }
              case _ =>
            }
          case _ =>
        }
      }
      case _ =>
    }
    val polys = faces.zipWithIndex.map { case ((rings, sem), fi) =>
      val ext = rings.head.map(verts)
      val ints = rings.tail.map(_.map(verts))
      CityGmlReader.GmlPolygon(s"$id/face$fi", s"$id/face$fi",
        sem.getOrElse("Surface"), ext, ints)
    }.toSeq
    // faces without semantics: re-type ground/roof/wall by z geometry
    val minz = polys.flatMap(_.exterior.map(_._3)).minOption.getOrElse(0.0)
    val maxz = polys.flatMap(_.exterior.map(_._3)).maxOption.getOrElse(0.0)
    val typed = polys.map { p =>
      if (p.surfaceType != "Surface") p
      else {
        val zs = p.exterior.map(_._3)
        val t =
          if (zs.forall(z => math.abs(z - minz) < 1e-9)) "GroundSurface"
          else if (zs.forall(z => z > minz + 1e-9) && isHorizontalish(p.exterior)) "RoofSurface"
          else if (zs.max - zs.min < 1e-9 && math.abs(zs.head - maxz) < 1e-9) "RoofSurface"
          else "WallSurface"
        p.copy(surfaceType = t)
      }
    }
    CityGmlReader.GmlBuilding(id, attrs, typed, Seq.empty)
  }

  private def isHorizontalish(ext: Array[(Double, Double, Double)]): Boolean = {
    // 2D projected area significantly non-zero -> not a vertical wall
    val ring = ext.map(p => Geom.Pt(p._1, p._2))
    math.abs(Geom.Polygon.signedArea(ring)) > 1e-6
  }

  private def faceRings(f: JValue): Array[Array[Int]] = f match {
    case JArray(rings) => rings.map {
      case JArray(idx) => idx.map {
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case x => sys.error(s"bad index $x")
      }.toArray
      case x => sys.error(s"bad ring $x")
    }.toArray
    case x => sys.error(s"bad face $x")
  }

  def toFootprints(doc: CjDoc, partitionId: Int): Seq[Footprint] =
    CityGmlReader.toFootprints(CityGmlReader.GmlDoc(doc.buildings, doc.srs), partitionId)

  /** Full-fidelity 3D surface rows (see [[CityGmlReader.toSurfaces]]). */
  def toSurfaces(doc: CjDoc, partitionId: Int): Seq[SurfacePoly] =
    CityGmlReader.toSurfaces(CityGmlReader.GmlDoc(doc.buildings, doc.srs), partitionId)
}
