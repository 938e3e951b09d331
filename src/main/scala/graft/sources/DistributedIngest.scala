package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.model._

/**
 * Distributed ingest: CityGML/CityJSON files parse INSIDE Spark tasks, one
 * file per row of a task Dataset — the Spark restatement of the reference's
 * per-file thread fan-out (`CityKGDB.java:169-177`) plus its chunked
 * in-file parse (`CityGMLV2DB.java:57-110`, which [[CityGmlReader.parse]]
 * keeps via StAX). The driver only LISTS paths; file contents are never
 * read driver-side, so a directory of 10k tiles parses with full cluster
 * parallelism.
 *
 * One parse pass per file (persisted), then three narrow flatMaps project
 * footprints / hrefs / ids — no re-parse per projection, no shuffle at all
 * until a downstream operator asks for one.
 */
object DistributedIngest {

  /** One file to parse: `partition_id` = config-entry index (a directory
    * entry keeps ONE partition index across all its files — reference
    * `__PARTITION_INDEX__` semantics, `Neo4jDB.java:254`). */
  final case class IngestTask(partition_id: Int, path: String, format: String)

  final case class ParsedFile(
      footprints: Seq[Footprint],
      hrefs: Seq[HrefRef],
      ids: Seq[IdRec],
      surfaces: Seq[SurfacePoly])

  /** Expand a config entry (single file or directory) into per-file tasks;
    * directory walk order = sorted path (reference W3 merge order,
    * `CityKGDB.java:231-255`). */
  def tasksFor(partition: Int, path: String, format: String): Seq[IngestTask] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val s = Files.walk(p)
      val exts = if (format == "citygml") Seq(".gml", ".xml") else Seq(".json")
      try s.iterator().asScala.filter { f =>
        val n = f.toString.toLowerCase
        Files.isRegularFile(f) && exts.exists(n.endsWith)
      }.map(f => IngestTask(partition, f.toString, format))
        .toSeq.sortBy(_.path)
      finally s.close()
    } else Seq(IngestTask(partition, path, format))
  }

  private def parseTask(t: IngestTask): ParsedFile = t.format match {
    case "citygml" =>
      val doc = CityGmlReader.parseFile(t.path)
      ParsedFile(
        CityGmlReader.toFootprints(doc, t.partition_id),
        CityGmlReader.toHrefs(doc, t.partition_id),
        CityGmlReader.toIds(doc, t.partition_id),
        CityGmlReader.toSurfaces(doc, t.partition_id))
    case "cityjson" =>
      val doc = CityJsonReader.parseFile(t.path)
      ParsedFile(CityJsonReader.toFootprints(doc, t.partition_id), Nil, Nil,
        CityJsonReader.toSurfaces(doc, t.partition_id))
    case other => sys.error(s"unknown ingest format: $other")
  }

  /**
   * Parse every task distributed; returns (footprints, hrefs, ids, surfaces)
   * datasets sharing one persisted parse.
   */
  def ingest(spark: SparkSession, tasks: Seq[IngestTask])
      : (Dataset[Footprint], Dataset[HrefRef], Dataset[IdRec], Dataset[SurfacePoly]) = {
    import spark.implicits._
    require(tasks.nonEmpty, "no input files to ingest")
    val slices = math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val parsed = spark.createDataset(tasks)
      .repartition(slices)
      .mapPartitions(_.map(parseTask))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (parsed.flatMap(_.footprints), parsed.flatMap(_.hrefs),
      parsed.flatMap(_.ids), parsed.flatMap(_.surfaces))
  }
}
