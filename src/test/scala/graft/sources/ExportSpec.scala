package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class ExportSpec extends AnyFunSuite {

  lazy val fzk = CityGmlReader.toFootprints(
    CityGmlReader.parseFile("/root/reference/input/citygml/fzk_haus_lod2_v2.gml"), 0)
  lazy val cj = CityJsonReader.toFootprints(
    CityJsonReader.parseFile("/root/reference/input/cityjson/lod2_buildings_v2.json"), 1)

  test("CityGML round trip: export -> re-ingest preserves ring/env2d/attrs") {
    val out = java.nio.file.Files.createTempDirectory("gml").resolve("fzk.gml").toString
    Exporters.exportCityGml(fzk, out)
    val back = CityGmlReader.toFootprints(CityGmlReader.parseFile(out), 0)
      .filter(_.feature_type == "Building")
    val orig = fzk.filter(_.feature_type == "Building")
    assert(back.size === orig.size)
    val b = back.head; val o = orig.head
    assert(b.feature_id === o.feature_id)
    assert(closedSet(b.ring) === closedSet(o.ring))
    assert(b.env.minx === o.env.minx && b.env.maxy === o.env.maxy)
    // generic attributes survive (stringified)
    assert(b.attrs("GrossPlannedArea") === o.attrs("GrossPlannedArea"))
  }

  test("CityGML export honors touching-inclusive bbox filter (Neo4jDB.java:378-380)") {
    val out = java.nio.file.Files.createTempDirectory("gml").resolve("f.gml").toString
    // query box that only TOUCHES the FZK envelope at x=457842
    val touching = Env6(457830, 5439083, 0, 457842, 5439093, 0)
    Exporters.exportCityGml(fzk, out, Some(touching))
    val back = CityGmlReader.toFootprints(CityGmlReader.parseFile(out), 0)
      .filter(_.feature_type == "Building")
    assert(back.size === 1, "touching feature must be kept")
    // disjoint box excludes
    val out2 = java.nio.file.Files.createTempDirectory("gml").resolve("g.gml").toString
    Exporters.exportCityGml(fzk, out2, Some(Env6(0, 0, 0, 1, 1, 0)))
    val back2 = CityGmlReader.toFootprints(CityGmlReader.parseFile(out2), 0)
    assert(back2.isEmpty)
  }

  test("full-surface CityGML round trip: ALL polygons (walls/roofs) survive exactly") {
    val doc = CityGmlReader.parseFile("/root/reference/input/citygml/fzk_haus_lod2_v2.gml")
    val surfaces = CityGmlReader.toSurfaces(doc, 0)
    assert(surfaces.size >= 7, s"FZK LoD2 must have >= 7 boundary polygons, got ${surfaces.size}")
    assert(surfaces.map(_.surface_type).toSet ===
      Set("GroundSurface", "WallSurface", "RoofSurface"))
    val out = java.nio.file.Files.createTempDirectory("gmlfull").resolve("fzk_full.gml").toString
    Exporters.exportCityGmlFull(fzk, surfaces, out)
    val backDoc = CityGmlReader.parseFile(out)
    val back = CityGmlReader.toSurfaces(backDoc, 0)
    // polygon count + ids + types + exact 3D coordinates all survive
    assert(back.size === surfaces.size)
    def key(s: SurfacePoly) = (s.feature_id, s.surface_id, s.surface_type, s.poly_id,
      s.exterior, s.interiors)
    assert(back.map(key).toSet === surfaces.map(key).toSet)
    // the re-ingested FOOTPRINT also still matches (ground ring + full env)
    val bFp = CityGmlReader.toFootprints(backDoc, 0).filter(_.feature_type == "Building").head
    val oFp = fzk.filter(_.feature_type == "Building").head
    assert(bFp.env === oFp.env, "building envelope must aggregate over ALL surfaces")
    assert(closedSet(bFp.ring) === closedSet(oFp.ring))
  }

  test("distributed CityGML export: one file per partition, written in tasks, round-trips") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val doc = CityGmlReader.parseFile("/root/reference/input/citygml/fzk_haus_lod2_v2.gml")
    val surfaces = CityGmlReader.toSurfaces(doc, 0)
    // two partitions: the FZK building as partition 0 AND (ids suffixed)
    // as partition 7 — forces two cogroups, two task-side files
    def retag(fp: Footprint, pid: Int, sfx: String) =
      fp.copy(feature_id = fp.feature_id + sfx, partition_id = pid)
    def retagS(s: SurfacePoly, pid: Int, sfx: String) =
      s.copy(feature_id = s.feature_id + sfx, surface_id = s.surface_id + sfx,
        poly_id = if (s.poly_id.nonEmpty) s.poly_id + sfx else s.poly_id, partition_id = pid)
    val fps = fzk.map(retag(_, 0, "")) ++ fzk.map(retag(_, 7, "_b"))
    val surfs = surfaces.map(retagS(_, 0, "")) ++ surfaces.map(retagS(_, 7, "_b"))
    val outDir = java.nio.file.Files.createTempDirectory("gmldist").toString
    val manifest = Exporters.exportCityGmlDistributed(
      fps.toDS().repartition(5), surfs.toDS().repartition(3), outDir)
    assert(manifest.map(_._1) === Seq(0, 7))
    manifest.foreach { case (_, p) => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p))) }
    // union of per-partition re-ingests == the input feature set, full
    // surface fidelity per partition
    val back = manifest.flatMap { case (pid, p) =>
      CityGmlReader.toFootprints(CityGmlReader.parseFile(p), pid) }
      .filter(_.feature_type == "Building")
    assert(back.map(_.feature_id).toSet ===
      fps.filter(_.feature_type == "Building").map(_.feature_id).toSet)
    val backS = manifest.flatMap { case (pid, p) =>
      CityGmlReader.toSurfaces(CityGmlReader.parseFile(p), pid) }
    def key(s: SurfacePoly) = (s.feature_id, s.surface_id, s.surface_type, s.poly_id,
      s.exterior, s.interiors)
    assert(backS.map(key).toSet === surfs.map(key).toSet)
    // byte-determinism: a second export under any partitioning is identical
    val outDir2 = java.nio.file.Files.createTempDirectory("gmldist2").toString
    Exporters.exportCityGmlDistributed(fps.toDS().repartition(2), surfs.toDS(), outDir2)
    Seq(0, 7).foreach { pid =>
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$outDir/part_$pid.gml"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$outDir2/part_$pid.gml"))
      assert(java.util.Arrays.equals(a, b), s"partition $pid file bytes not deterministic")
    }
    // CityGML 3.0 variant: the same distributed path, the v3 writer — the
    // version-agnostic reader must recover the identical surface set
    val outDir3 = java.nio.file.Files.createTempDirectory("gmldist3").toString
    Exporters.exportCityGmlDistributed(fps.toDS(), surfs.toDS(), outDir3, version = "v3")
    val backS3 = Seq(0, 7).flatMap { pid =>
      CityGmlReader.toSurfaces(CityGmlReader.parseFile(s"$outDir3/part_$pid.gml"), pid) }
    assert(backS3.map(key).toSet === surfs.map(key).toSet)
    // buildings-only dataset (no surface rows): v3 must still carry geometry
    // (synthesized LOD0 ground polygons), never attribute-only Buildings
    val outDir4 = java.nio.file.Files.createTempDirectory("gmldist4").toString
    Exporters.exportCityGmlDistributed(fps.toDS(),
      spark.emptyDataset[SurfacePoly], outDir4, version = "v3")
    val back4 = CityGmlReader.toFootprints(
      CityGmlReader.parseFile(s"$outDir4/part_0.gml"), 0)
      .filter(_.feature_type == "Building")
    val orig0 = fzk.filter(_.feature_type == "Building").head
    assert(back4.nonEmpty)
    assert(closedSet(back4.head.ring) === closedSet(orig0.ring),
      "v3 buildings-only export must synthesize the ground ring")
  }

  test("CityJSON round trip: quantization-exact for 3-decimal source coords") {
    val out = java.nio.file.Files.createTempDirectory("cj").resolve("b.json").toString
    Exporters.exportCityJson(cj, out, srs = "EPSG:3068")
    val back = CityJsonReader.toFootprints(CityJsonReader.parseFile(out), 1)
      .filter(_.feature_type == "Building")
    val orig = cj.filter(_.feature_type == "Building")
    assert(back.size === orig.size)
    val bm = back.map(f => f.feature_id -> f).toMap
    orig.foreach { o =>
      val b = bm(o.feature_id)
      // source verts are already 3-decimal quantized -> exact ring equality
      assert(closedSet(b.ring) === closedSet(o.ring), s"${o.feature_id} ring")
      assert(b.attrs("measuredHeight") === o.attrs("measuredHeight"))
    }
  }

  test("full-surface CityJSON round trip: every polygon + semantic type survives") {
    val doc = CityJsonReader.parseFile("/root/reference/input/cityjson/lod2_buildings_v2.json")
    val surfaces = CityJsonReader.toSurfaces(doc, 1)
    assert(surfaces.size > 500, s"100 solids should yield >500 faces, got ${surfaces.size}")
    val out = java.nio.file.Files.createTempDirectory("cjfull").resolve("full.json").toString
    Exporters.exportCityJsonFull(cj, surfaces, out, srs = "EPSG:3068")
    val back = CityJsonReader.parseFile(out)
    val backS = CityJsonReader.toSurfaces(back, 1)
    assert(backS.size === surfaces.size)
    // geometry + semantic type multiset identical (face ids are synthetic in
    // CityJSON, so compare by building, type and exact 3D rings; the fixture
    // verts are 3-decimal quantized -> round trip is coordinate-exact)
    def key(s: SurfacePoly) = (s.feature_id, s.surface_type, s.exterior, s.interiors)
    def multiset(xs: Seq[SurfacePoly]) = xs.groupBy(key).view.mapValues(_.size).toMap
    assert(multiset(backS) === multiset(surfaces))
    // semantics came from the document, not the z-heuristic: all three types
    assert(backS.map(_.surface_type).toSet ===
      Set("GroundSurface", "WallSurface", "RoofSurface"))
    // footprints unchanged too
    val bm = CityJsonReader.toFootprints(back, 1).filter(_.feature_type == "Building")
      .map(f => f.feature_id -> f).toMap
    cj.filter(_.feature_type == "Building").foreach { o =>
      assert(closedSet(bm(o.feature_id).ring) === closedSet(o.ring))
      assert(bm(o.feature_id).env === o.env)
    }
  }

  test("distributed CityJSON export: per-partition files byte-equal to the driver path, round-trips") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val doc = CityJsonReader.parseFile("/root/reference/input/cityjson/lod2_buildings_v2.json")
    val surfaces = CityJsonReader.toSurfaces(doc, 1)
    // two partitions (1 = the fixture, 9 = ids suffixed) forces two cogroups
    def retag(fp: Footprint, pid: Int, sfx: String) =
      fp.copy(feature_id = fp.feature_id + sfx, partition_id = pid)
    def retagS(s: SurfacePoly, pid: Int, sfx: String) =
      s.copy(feature_id = s.feature_id + sfx, surface_id = s.surface_id + sfx,
        poly_id = if (s.poly_id.nonEmpty) s.poly_id + sfx else s.poly_id, partition_id = pid)
    val fps = cj.map(retag(_, 1, "")) ++ cj.map(retag(_, 9, "_b"))
    val surfs = surfaces.map(retagS(_, 1, "")) ++ surfaces.map(retagS(_, 9, "_b"))
    val outDir = java.nio.file.Files.createTempDirectory("cjdist").toString
    val manifest = Exporters.exportCityJsonDistributed(
      fps.toDS().repartition(5), surfs.toDS().repartition(3), outDir, srs = "EPSG:3068")
    assert(manifest.map(_._1) === Seq(1, 9))
    // byte-equality vs the DRIVER path on the identical sorted slices —
    // the distributed writer is the same serializer behind a task commit
    manifest.foreach { case (pid, p) =>
      val bSlice = fps.filter(_.partition_id == pid).sortBy(_.feature_id)
      val sSlice = surfs.filter(_.partition_id == pid)
        .sortBy(s => (s.feature_id, s.surface_id, s.poly_id))
      val drv = java.nio.file.Files.createTempDirectory("cjdrv").resolve(s"d_$pid.json")
      Exporters.exportCityJsonFull(bSlice, sSlice, drv.toString, srs = "EPSG:3068")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.file.Files.readAllBytes(drv)),
        s"partition $pid distributed file != driver-path file")
    }
    // union of per-partition re-ingests == the input surface multiset
    def key(s: SurfacePoly) = (s.feature_id, s.surface_type, s.exterior, s.interiors)
    def multiset(xs: Seq[SurfacePoly]) = xs.groupBy(key).view.mapValues(_.size).toMap
    val backS = manifest.flatMap { case (pid, p) =>
      CityJsonReader.toSurfaces(CityJsonReader.parseFile(p), pid) }
    assert(multiset(backS) === multiset(surfs))
    // buildings-only dataset: falls back to ground-ring geometry (S8 shape)
    val outDir2 = java.nio.file.Files.createTempDirectory("cjdist2").toString
    Exporters.exportCityJsonDistributed(
      fps.toDS(), spark.emptyDataset[SurfacePoly], outDir2, srs = "EPSG:3068")
    val back2 = CityJsonReader.toFootprints(
      CityJsonReader.parseFile(s"$outDir2/part_1.city.json"), 1)
      .filter(_.feature_type == "Building")
    assert(back2.map(_.feature_id).toSet ===
      cj.filter(_.feature_type == "Building").map(_.feature_id).toSet)
  }

  test("CityJSON quantization semantics: round(x*1000)/1000 (CityJSONDB.java:118-121)") {
    val f = Footprint("q1", "Building", 0,
      Seq(XY(1.23456, 2.00049), XY(3.99999, 2.00049), XY(3.99999, 9.5), XY(1.23456, 9.5)),
      Seq.empty, Env6(1.23456, 2.00049, 0, 3.99999, 9.5, 0), XY(2, 5), Map.empty)
    val out = java.nio.file.Files.createTempDirectory("cj").resolve("q.json").toString
    Exporters.exportCityJson(Seq(f), out)
    val back = CityJsonReader.toFootprints(CityJsonReader.parseFile(out), 0).head
    assert(back.ring.map(p => (p.x, p.y)).toSet ===
      Set((1.235, 2.0), (4.0, 2.0), (4.0, 9.5), (1.235, 9.5)))
  }

  private def closedSet(r: Seq[XY]): Set[(Double, Double)] =
    r.map(p => (p.x, p.y)).toSet
}
