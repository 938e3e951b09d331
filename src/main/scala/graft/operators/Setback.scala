package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.GeoFunctionsImpl.st_dist2_ring
import graft.functions.GeoFunctions.{hex_cover, hex_ring}

/**
 * Nearest-footprint-boundary distance per point ("setback" analysis — the
 * planning metric behind "how far is this point from the closest building").
 * No reference counterpart (the reference's spatial ops are bbox range
 * queries; SURVEY.md §2.3) — semantics defined here: for each point, the
 * minimum exact point-to-ring-boundary distance over all rings, deterministic
 * tie-break on footprint id ascending (`min(struct(d2, fid))` — order-free,
 * so results never depend on partitioning).
 *
 * Two physical paths, mirroring [[KnnJoin]]:
 *
 *  1. [[broadcastExact]] — the ring side fits in a broadcast: every point
 *     scores every ring scan-locally with the codegen [[
 *     org.apache.spark.sql.graft.RingKernels.dist2ToRing]] kernel. Exact and
 *     shuffle-free on the point side, but LINEAR in #rings per point — right
 *     for ≤ a few thousand footprints (the q91 fixture's 100), wrong for a
 *     metro-scale footprint set.
 *  2. [[ringSearch]] — the scale path: rings bucket into the hex cells their
 *     cover spans ([[graft.functions.GeoFunctions.hex_cover]] covers the
 *     whole footprint, so every boundary point lies in a covered cell);
 *     points expand hex rings round by round (geometric spans, like
 *     [[KnnJoin.ringJoin]]) and only candidate (point, ring) pairs within
 *     the current ring batch get the exact kernel. Stop bound: once the
 *     running best distance beats [[KnnJoin.ringLowerBound]](res, R+1), no
 *     footprint first met beyond ring R can be nearer — every boundary point
 *     of an unmet footprint sits in a cell at hex distance > R. Per-point
 *     work is local-density-bounded instead of #rings-bounded.
 *
 * [[auto]] picks per ring-side size with a BOUNDED probe
 * (`limit(threshold + 1).count()` — O(threshold) even on a huge ring table),
 * conf `spark.graft.setback.broadcastRingLimit`.
 *
 * Inputs: `points` carries (`idCol`, x, y); `rings` carries
 * (fid, xs: array<double>, ys: array<double>). Output: (`idCol`, d2, dist,
 * nearest). Both paths return bit-identical rows (same kernel expression
 * tree, same order-free min) — property-pinned in SetbackSpec.
 */
object Setback {

  val BroadcastRingLimitConf = "spark.graft.setback.broadcastRingLimit"

  /** Exact brute path: broadcast the rings, score every pair scan-locally.
    * The point side gets the [[graft.core.Spread]] parallelism floor: rows
    * are three scalars but each carries #rings exact-kernel evaluations, so
    * a single-split input would run the whole scoring pass on one task. */
  def broadcastExact(points: DataFrame, rings: DataFrame,
                     idCol: String = "event_id"): DataFrame =
    finish(idCol,
      graft.core.Spread.floor(points.select(col(idCol),
          col("x").cast("double").as("x"),
          col("y").cast("double").as("y")))
        .crossJoin(broadcast(rings.select(col("fid"), col("xs"), col("ys"))))
        .select(col(idCol), col("fid"),
          st_dist2_ring(col("xs"), col("ys"), col("x"), col("y")).as("d2"))
        .groupBy(idCol)
        .agg(min(struct(col("d2"), col("fid"))).as("m"))
        .select(col(idCol), col("m.d2").as("d2"), col("m.fid").as("fid")))

  /**
   * Cell-prefiltered scale path: per round, pending points explode their next
   * hex-ring span and equi-join rings bucketed by covered cell; the exact
   * kernel refines candidates; points whose best distance beats the ring
   * bound exit. Rounds double their span (the [[KnnJoin.ringJoin]] shape:
   * O(log maxR) barriers, constant-factor candidate overshoot). Points still
   * open after `maxR` (far-field stragglers — small by construction) fall
   * back to the exact broadcast score against the full ring table rather
   * than returning a silently-truncated answer.
   */
  def ringSearch(points: DataFrame, rings: DataFrame,
                 idCol: String = "event_id",
                 res: Int = 12, maxR: Int = 16, ringsPerRound: Int = 2,
                 checkpointDir: Option[String] = None): DataFrame = {
    // positional cast renames arrays_zip's (xs, ys) fields to hex_cover's
    // expected (x, y) ring-vertex struct
    val ringStruct = arrays_zip(col("xs"), col("ys"))
      .cast("array<struct<x:double,y:double>>")
    val t = rings.select(col("fid"), col("xs"), col("ys"))
      .withColumn("tcell", explode(hex_cover(ringStruct, lit(res))))
      .repartition(col("tcell")).persist()
    try {
      val ck = graft.core.Checkpoints.strategy(points, checkpointDir)
      var pending = ck(points.select(col(idCol),
        col("x").cast("double").as("x"), col("y").cast("double").as("y")))
      var nPending = -1L
      def candOf(p: DataFrame): DataFrame = p.select(col(idCol), col("fid"),
        st_dist2_ring(col("xs"), col("ys"), col("x"), col("y")).as("d2"))
      // k=1 keep-best: min(struct) is a plain map-side-combining agg — the
      // shuffle carries one row per point, candidate-count-independent
      def best(c: DataFrame): DataFrame = c.groupBy(idCol)
        .agg(min(struct(col("d2"), col("fid"))).as("m"))
        .select(col(idCol), col("m.d2").as("d2"), col("m.fid").as("fid"))
      var acc: DataFrame = candOf(pending.limit(0).crossJoin(t.limit(0)))
      var doneParts: List[DataFrame] = Nil
      var r = 0
      while (r <= maxR && nPending != 0) {
        val rHi = math.min(maxR, math.max(r + ringsPerRound - 1, 2 * r))
        val ringCells = flatten(array((r to rHi).map(rr =>
          hex_ring(col("x"), col("y"), lit(res), lit(rr))): _*))
        // the same footprint can be met through several covered cells in one
        // span — duplicate (point, fid) candidates carry identical d2 and
        // collapse in the min, no distinct stage needed
        val cand = candOf(pending.withColumn("pcell", explode(ringCells))
          .join(t, col("pcell") === col("tcell")))
        val b = ck(best(acc.unionByName(cand)))
        val bound = KnnJoin.ringLowerBound(res, rHi + 1)
        val done = b.where(sqrt(col("d2")) < bound).select(col(idCol).as("done_id"))
        doneParts ::= b.join(done, col(idCol) === col("done_id"), "left_semi")
        acc = b.join(done, col(idCol) === col("done_id"), "left_anti")
        pending = ck(pending.join(done, col(idCol) === col("done_id"), "left_anti"))
        nPending = pending.count()
        r = rHi + 1
      }
      val all =
        if (nPending > 0)
          // fall back against the ORIGINAL ring table, not the cell-exploded
          // `t` — the exploded form scores each (point, ring) pair once per
          // covered cell (identical d2 rows, collapsed by the min, but
          // cover-size× wasted kernel work)
          doneParts.foldLeft(
            ck(best(acc.unionByName(candOf(pending.crossJoin(
              rings.select(col("fid"), col("xs"), col("ys"))))))))(_ unionByName _)
        else doneParts.reduce(_ unionByName _)
      finish(idCol, all)
    } finally t.unpersist(blocking = false)
  }

  /** Route by ring-side size: broadcast under the conf threshold (default
    * 4096 rings), cell-prefiltered ring search above it. */
  def auto(points: DataFrame, rings: DataFrame, idCol: String = "event_id",
           res: Int = 12, maxR: Int = 16,
           checkpointDir: Option[String] = None): DataFrame = {
    val limit = points.sparkSession.conf
      .getOption(BroadcastRingLimitConf).map(_.toInt).getOrElse(4096)
    if (rings.limit(limit + 1).count() <= limit)
      broadcastExact(points, rings, idCol)
    else ringSearch(points, rings, idCol, res, maxR, checkpointDir = checkpointDir)
  }

  private def finish(idCol: String, best: DataFrame): DataFrame =
    best.select(col(idCol), col("d2"), sqrt(col("d2")).as("dist"),
      col("fid").as("nearest"))
}
