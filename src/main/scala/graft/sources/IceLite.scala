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
 *  - lineage comes from ONE grouped aggregation over the freshly staged
 *    files (all pending partitions staged in a single distributed write);
 *    `verifyLineage` recomputes it independently for audit.
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

  /** Hive/Iceberg-style percent-escaping for partition values used in paths
    * ('/', '..', ':' … would otherwise traverse outside the table dir or
    * produce unreadable file names); the manifest stores the RAW value. */
  def escapePart(v: String): String = {
    val e = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
    // Hive escaping leaves "." / ".." / "" alone — as a final path segment
    // those resolve to the table dir itself (traversal); encode the dots.
    if (e.isEmpty) "%00" else if (e.forall(_ == '.')) e.replace(".", "%2E") else e
  }

  /**
   * Resumable write: materialize only the partitions of `partCol` missing
   * from the current snapshot; commit each partition with its lineage, then
   * atomically advance the snapshot pointer. Returns (written, skipped).
   *
   * Scale shape: ONE distributed write job stages every pending partition
   * (`partitionBy` on a duplicate key column, so the data files keep
   * `partCol` itself), ONE aggregation job over the staged output computes
   * per-partition lineage, and the per-partition COMMIT loop is pure
   * driver-side metadata (dir rename + manifest write). The previous design
   * ran one write job + one full upstream scan per pending partition — O(P)
   * scans of the input; this is O(1) scans regardless of partition count,
   * while keeping the partition as the crash-tolerant commit unit (a crash
   * mid-loop leaves a prefix committed; resume stages only the remainder).
   */
  def writeResumable(df: DataFrame, table: String, partCol: String,
                     inListLimit: Int = 1000): (Seq[String], Seq[String]) = {
    Files.createDirectories(metaDir(table))
    compactRecover(table) // heal a crashed compaction swap before appending
    val snap = currentSnapshot(table)
    val allRaw = df.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    // null partition values have no stable identity in the manifest (and no
    // readable path segment) — reject up front instead of NPE-ing mid-commit
    require(!allRaw.contains(null),
      s"IceLite: null value in partition column '$partCol' — map nulls to a sentinel first")
    val all = allRaw.sorted.toSeq
    val skipped = all.filter(snap.committedSet.contains)
    val todo = all.filterNot(snap.committedSet.contains)
    if (todo.isEmpty) return (Seq.empty, skipped)

    val origCols = df.columns.toSeq
    val stage = s"$table/_icelite_stage"
    // pending filter: a literal In-list is fine for human-scale partition
    // counts, but at 10^4+ pending values the expression itself bloats the
    // plan — switch to a broadcast semi-join on the value set
    val pending = if (skipped.isEmpty) df
      else if (todo.size <= inListLimit) df.where(col(partCol).cast("string").isin(todo: _*))
      else {
        import df.sparkSession.implicits._
        val todoDf = todo.toDF("__todo_pv")
        df.join(org.apache.spark.sql.functions.broadcast(todoDf),
          col(partCol).cast("string") === col("__todo_pv"), "left_semi")
      }
    // job 1: stage all pending partitions in one distributed write
    pending.withColumn("__pk", col(partCol).cast("string"))
      .write.mode("overwrite").partitionBy("__pk").parquet(stage)
    // job 2: per-partition lineage in one aggregation over the staged files
    // (reads back what was actually persisted — a stronger audit base than
    // re-aggregating the upstream plan)
    val stagedAll = df.sparkSession.read.parquet(stage)
    val aggs = lineageAggs(stagedAll.select(origCols.map(col): _*))
    val lineage = stagedAll
      .groupBy(col(partCol).cast("string").as("__pv"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("0")))
      .toMap
    // commit loop: driver-side only — move staged dir into place, advance
    // the snapshot pointer once per partition (the crash-tolerant unit)
    var current = snap
    todo.foreach { pv =>
      // the staged dir name uses Spark's partitionBy naming — which maps the
      // EMPTY string (like null) to __HIVE_DEFAULT_PARTITION__, not to
      // escapePathName("") — while the final dir name uses escapePart
      // (same escaping + dot-only/empty names encoded)
      val from = Paths.get(stage, "__pk=" + (if (pv.isEmpty)
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(pv)))
      val to = Paths.get(table, "data", escapePart(pv))
      Files.createDirectories(to.getParent)
      if (Files.exists(to)) deleteRecursive(to) // re-run after crash-before-commit
      Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
      val (rows, checksum) = lineage(pv)
      current = Snapshot(current.version + 1,
        current.partitions :+ PartitionLineage(pv, rows, checksum))
      commitSnapshot(table, current)
    }
    deleteRecursive(Paths.get(stage))
    (todo, skipped)
  }

  /**
   * Small-file compaction: rewrite each multi-file committed partition into
   * ONE parquet file — the standard operational job after many incremental
   * commits (10^4 partitions × dozens of small files kills scan throughput
   * long before data volume does; a partition large enough to WANT several
   * files belongs in a finer partitioning, not in compaction policy).
   * Identity is PROVEN, not
   * assumed: the rewritten partition's order-independent lineage (rows +
   * checksum) must equal the manifest entry before the swap happens, so a
   * buggy rewrite can never replace good data.
   *
   * Crash safety per partition (the same commit unit as writeResumable):
   * the old dir is parked under the reserved `_icelite_parked/` sibling of
   * `data/` (outside the reader's scan, and immune to collisions with
   * legally dot-prefixed partition values), the rewrite moves in atomically,
   * then the parked dir is deleted. [[compactRecover]] (run automatically at
   * the start of compact AND by read/readVersion/writeResumable) finishes
   * either direction after a crash: live dir missing → restore the parked
   * original; both present → drop the parked copy.
   *
   * Data is unchanged by construction, so the manifest lineage stays valid;
   * a new snapshot version is still committed to record the rewrite.
   * Returns (compacted, skipped-already-small) partition values.
   */
  def compact(spark: SparkSession, table: String, partCol: String): (Seq[String], Seq[String]) = {
    compactRecover(table)
    val snap = currentSnapshot(table)
    if (snap.partitions.isEmpty) return (Seq.empty, Seq.empty)
    val byPv = snap.partitions.map(p => p.partition -> p).toMap
    // driver-side fs listing picks the oversized partitions — O(P) cheap
    // metadata ops, NOT O(P) Spark jobs
    val (todo, skipped) = snap.partitions.map(_.partition).sorted.partition { pv =>
      val dir = Paths.get(table, "data", escapePart(pv))
      val s = Files.list(dir)
      val n = try s.filter(f => f.getFileName.toString.endsWith(".parquet")).count()
        finally s.close()
      n > 1
    }
    if (todo.isEmpty) return (Seq.empty, skipped)

    // ONE distributed job rewrites every oversized partition (repartition by
    // the key puts each partition's rows in a single task → one output file
    // per partition under partitionBy), then ONE grouped aggregation proves
    // per-partition identity against the manifest — the same O(1)-jobs shape
    // as writeResumable; only the swap loop is per-partition, and it is pure
    // driver-side metadata
    val stage = s"$table/_icelite_compact_stage"
    deleteRecursive(Paths.get(stage))
    val dirs = todo.map(pv => s"$table/data/${escapePart(pv)}")
    val src = spark.read.parquet(dirs: _*)
    src.repartition(col(partCol))
      .withColumn("__pk", col(partCol).cast("string"))
      .write.mode("overwrite").partitionBy("__pk").parquet(stage)
    val origCols = src.columns.toSeq
    val staged = spark.read.parquet(stage)
    val aggs = lineageAggs(staged.select(origCols.map(col): _*))
    val got = staged.groupBy(col(partCol).cast("string").as("__pv"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("0")))
      .toMap
    todo.foreach { pv =>
      val want = byPv(pv)
      val (rows, checksum) = got.getOrElse(pv,
        throw new IllegalStateException(s"IceLite.compact: partition '$pv' missing from rewrite"))
      require(rows == want.rows && checksum == want.checksum,
        s"IceLite.compact: rewrite of '$pv' does not match manifest " +
          s"(rows $rows vs ${want.rows}, checksum $checksum vs ${want.checksum}) — aborting before swap")
    }
    todo.foreach { pv =>
      val from = Paths.get(stage, "__pk=" + (if (pv.isEmpty)
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(pv)))
      val live = Paths.get(table, "data", escapePart(pv))
      val parked = parkedDir(table).resolve(escapePart(pv))
      Files.createDirectories(parked.getParent)
      deleteRecursive(parked)
      Files.move(live, parked, StandardCopyOption.ATOMIC_MOVE)
      Files.move(from, live, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(parked)
    }
    deleteRecursive(Paths.get(stage))
    commitSnapshot(table, Snapshot(snap.version + 1, snap.partitions))
    (todo, skipped)
  }

  /** Parked-original dirs live OUTSIDE `data/` in a reserved sibling — a
    * partition VALUE can legally escape to any name (leading dots included),
    * so an in-`data/` park prefix could collide with real partition dirs. */
  private def parkedDir(table: String): Path = Paths.get(table, "_icelite_parked")

  /** Finish an interrupted compaction swap (see [[compact]]): for each parked
    * dir, restore it if the live dir is missing (crash between the two
    * moves), otherwise the rewrite landed — drop the parked copy. Idempotent;
    * safe to run on a healthy table. */
  def compactRecover(table: String): Unit = {
    val park = parkedDir(table)
    if (!Files.isDirectory(park)) return
    val s = Files.list(park)
    val parked = try s.toArray.toSeq.map(_.asInstanceOf[Path]) finally s.close()
    parked.foreach { old =>
      val live = Paths.get(table, "data", old.getFileName.toString)
      if (!Files.exists(live)) Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
      else deleteRecursive(old)
    }
  }

  private def deleteRecursive(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      // Files.list must be closed explicitly or each visited directory leaks
      // an fd until GC — a stage dir with thousands of partitions hits ulimit
      val s = Files.list(p)
      try s.forEach(deleteRecursive(_)) finally s.close()
    }
    Files.deleteIfExists(p)
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

  /** Read the committed table back (partition col lives in the data files).
    * Runs [[compactRecover]] first, so a compaction that crashed inside its
    * swap window (live dir parked, rewrite not yet moved in) is healed
    * before any rows are served — without this, the hidden parked dir would
    * make the table silently MISSING that partition for every reader. */
  def read(spark: SparkSession, table: String): DataFrame = {
    compactRecover(table)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$table/data")
  }

  /**
   * Time travel: read the table AS OF snapshot `version`. Valid because
   * commits are append-only at partition granularity — a partition, once in
   * a manifest, is never rewritten with different content (resume skips it;
   * compaction must prove identical lineage before swapping) — so the data
   * dirs named by manifest vN still hold exactly vN's rows. Old manifests
   * are retained (`_icelite/vN.json`), making every historical version
   * addressable at zero storage cost beyond the tiny JSON.
   */
  def readVersion(spark: SparkSession, table: String, version: Int): DataFrame = {
    require(version >= 1, s"version must be >= 1, got $version")
    compactRecover(table) // heal a crashed compaction swap before serving
    require(Files.exists(metaDir(table).resolve(s"v$version.json")),
      s"IceLite: snapshot v$version of '$table' does not exist or was expired " +
        s"(current version: ${currentSnapshot(table).version}; see expireVersions)")
    val snap = readSnapshot(table, version)
    val dirs = snap.partitions.map(p => s"$table/data/${escapePart(p.partition)}")
    spark.read.parquet(dirs: _*)
  }

  /**
   * Snapshot expiration — the retention companion to time travel: retained
   * manifests otherwise grow one vN.json per commit forever. Keeps the
   * newest `keepN` manifests (the current version always survives) and
   * deletes older ones (parked dirs are healed by [[compactRecover]]
   * first). Commits are append-only at partition granularity and compaction
   * must prove identical lineage before swapping, so every data dir
   * referenced by an expired manifest is still referenced by every retained
   * one — expiration is pure metadata deletion, never touches `data/` or
   * any stage dir (a stage dir may be another writer's LIVE working set;
   * writeResumable/compact each clear their OWN stage at entry), and the
   * oldest RETAINED version stays byte-identical readable. Reading an
   * expired version fails loudly in [[readVersion]]. Returns the expired
   * version numbers.
   */
  def expireVersions(table: String, keepN: Int): Seq[Int] = {
    require(keepN >= 1, s"IceLite.expireVersions: keepN must be >= 1, got $keepN")
    compactRecover(table)
    val cur = currentSnapshot(table).version
    if (cur == 0) return Seq.empty
    val horizon = math.max(1, cur - keepN + 1) // oldest retained version
    val expired = (1 until horizon)
      .filter(v => Files.exists(metaDir(table).resolve(s"v$v.json")))
    expired.foreach(v => Files.deleteIfExists(metaDir(table).resolve(s"v$v.json")))
    expired
  }

  /**
   * Audit: recompute lineage per committed partition and compare with the
   * manifest — the metrics-table verification the north rule asks for.
   * ONE grouped aggregation over the whole table (a per-partition read loop
   * would be one Spark job per partition — O(P) jobs at 10k partitions).
   */
  def verifyLineage(spark: SparkSession, table: String, partCol: String): Seq[(String, Boolean)] = {
    val snap = currentSnapshot(table)
    if (snap.partitions.isEmpty) return Seq.empty
    val df = read(spark, table)
    val aggs = lineageAggs(df)
    val got = df.groupBy(col(partCol).cast("string").as("__pv"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("0")))
      .toMap
    snap.partitions.map { p =>
      p.partition -> got.get(p.partition).exists { case (rows, cs) =>
        rows == p.rows && cs == p.checksum
      }
    }
  }
}
