package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IceLite — a minimal Iceberg-shaped table format (SURVEY.md §7.1 `tables/`):
 * Parquet data files + JSON snapshot/manifest metadata with per-partition
 * lineage (row count + order-independent checksum), giving the engine the
 * north rule's checkpoint-resume semantics. No Iceberg jar exists offline;
 * this implements the subset the engine needs:
 *
 *  - table dir layout: `data/<partition-value>/…parquet` (partition col kept in the files) + `_icelite/vN.json`
 *    + `_icelite/VERSION` (atomic pointer via temp-file + POSIX rename);
 *  - a snapshot = the committed set of logical partitions with lineage
 *    `{partition, rows, checksum, files}`;
 *  - commit unit = one logical partition (the reference's crash-tolerant
 *    batch unit, `Neo4jDB.java:174`, `CityKGDB.java:289-334`, scaled up);
 *  - resume = recompute only partitions missing from the current snapshot —
 *    callers derive data deterministically (content-derived ids, F8), so a
 *    re-run is idempotent and the final table is byte-stable;
 *  - checksum = Σ (as decimal, overflow-free) of xxhash64 over all columns —
 *    order-independent, so it is stable under shuffle/parallelism changes;
 *  - lineage is collected with `observe()` DURING the write job (single scan
 *    per partition); `verifyLineage` recomputes it independently for audit.
 *
 * Metadata I/O is driver-side JSON (tiny); data I/O is ordinary distributed
 * parquet. At 100 TB the manifest holds O(#partitions) entries, not O(rows).
 */
object IceLite {

  final case class PartitionLineage(partition: String, rows: Long, checksum: String)
  final case class Snapshot(version: Int, partitions: Seq[PartitionLineage]) {
    def committedSet: Set[String] = partitions.map(_.partition).toSet
  }

  private def metaDir(table: String): Path = Paths.get(table, "_icelite")
  private def versionFile(table: String): Path = metaDir(table).resolve("VERSION")

  def currentSnapshot(table: String): Snapshot = {
    val vf = versionFile(table)
    if (!Files.exists(vf)) return Snapshot(0, Seq.empty)
    val v = new String(Files.readAllBytes(vf), StandardCharsets.UTF_8).trim.toInt
    if (v == 0) return Snapshot(0, Seq.empty)
    readSnapshot(table, v)
  }

  private def readSnapshot(table: String, v: Int): Snapshot = {
    val txt = new String(Files.readAllBytes(metaDir(table).resolve(s"v$v.json")),
      StandardCharsets.UTF_8)
    Snapshot(v, parseManifest(txt))
  }

  // minimal hand-rolled JSON (flat, controlled schema — no external dep)
  private def renderManifest(s: Snapshot): String = {
    val parts = s.partitions.map { p =>
      s"""{"partition":${q(p.partition)},"rows":${p.rows},"checksum":${q(p.checksum)}}"""
    }.mkString("[", ",", "]")
    s"""{"version":${s.version},"partitions":$parts}"""
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val PartRe = """\{"partition":"((?:[^"\\]|\\.)*)","rows":(\d+),"checksum":"((?:[^"\\]|\\.)*)"\}""".r

  private def parseManifest(txt: String): Seq[PartitionLineage] =
    PartRe.findAllMatchIn(txt).map { m =>
      PartitionLineage(unq(m.group(1)), m.group(2).toLong, unq(m.group(3)))
    }.toSeq

  private def unq(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The two lineage aggregates: row count + Σ xxhash64(all cols) — order-
    * independent, so stable under shuffle/parallelism changes. MAP columns
    * are canonicalized to sorted entry arrays first (Spark forbids hashing
    * maps because their iteration order is unspecified). */
  private def lineageAggs(df: DataFrame): Seq[org.apache.spark.sql.Column] = {
    val hashable = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          sort_array(map_entries(col(f.name)))
        case _ => col(f.name)
      }
    }
    Seq(count(lit(1)).as("rows"),
      coalesce(sum(xxhash64(hashable.toSeq: _*).cast("decimal(38,0)")), lit(0))
        .as("checksum"))
  }

  /** Order-independent lineage of a DataFrame (dedicated aggregation pass —
    * the independent recompute used by `verifyLineage`; the write path gets
    * the same numbers for free via `observe`). */
  def lineageOf(df: DataFrame): (Long, String) = {
    val aggs = lineageAggs(df)
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (row.getLong(0), Option(row.get(1)).map(_.toString).getOrElse("0"))
  }

  /**
   * Resumable write: materialize only the partitions of `partCol` missing
   * from the current snapshot; commit each batch with its lineage, then
   * atomically advance the snapshot pointer. Returns (written, skipped).
   */
  def writeResumable(df: DataFrame, table: String, partCol: String): (Seq[String], Seq[String]) = {
    Files.createDirectories(metaDir(table))
    val snap = currentSnapshot(table)
    val all = df.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val skipped = all.filter(snap.committedSet.contains)
    val todo = all.filterNot(snap.committedSet.contains)
    if (todo.isEmpty) return (Seq.empty, skipped)

    var current = snap
    todo.foreach { pv =>
      val part = df.where(col(partCol).cast("string") === pv)
      val dataPath = s"$table/data/$pv"
      // observe(): the lineage aggregates ride the write job itself — one
      // scan per partition, not write + recount (at 100 TB the recount pass
      // would double the read volume)
      val obs = org.apache.spark.sql.Observation()
      val aggs = lineageAggs(part)
      part.observe(obs, aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(dataPath)
      val m = obs.get
      val rows = m("rows").asInstanceOf[Long]
      val checksum = Option(m("checksum")).map(_.toString).getOrElse("0")
      current = Snapshot(current.version + 1,
        current.partitions :+ PartitionLineage(pv, rows, checksum))
      commitSnapshot(table, current)
    }
    (todo, skipped)
  }

  /** Atomic snapshot advance: write vN.json, then rename a temp VERSION file. */
  private def commitSnapshot(table: String, s: Snapshot): Unit = {
    val md = metaDir(table)
    Files.write(md.resolve(s"v${s.version}.json"),
      renderManifest(s).getBytes(StandardCharsets.UTF_8))
    val tmp = md.resolve(s"VERSION.tmp${s.version}")
    Files.write(tmp, s.version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionFile(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the committed table back (partition col lives in the data files). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$table/data")

  /**
   * Audit: recompute lineage per committed partition and compare with the
   * manifest — the metrics-table verification the north rule asks for.
   */
  def verifyLineage(spark: SparkSession, table: String, partCol: String): Seq[(String, Boolean)] = {
    val snap = currentSnapshot(table)
    snap.partitions.map { p =>
      val df = spark.read.parquet(s"$table/data/${p.partition}")
      val (rows, cs) = lineageOf(df)
      p.partition -> (rows == p.rows && cs == p.checksum)
    }
  }
}
