package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ad-hoc graph-path diagnostics over an edge table — the relational
 * restatement of the reference's Cypher shortest-path / reachability
 * utilities (`GraphUtils.java:280-344`). The reference asks Neo4j for paths
 * between two mapped nodes; here the graph IS a DataFrame of (src, dst)
 * edges (e.g. the resolved XLink table), and paths come from iterative
 * frontier expansion:
 *
 *   frontier_{d+1} = (frontier_d ⋈ edges) \ visited
 *
 * Each round is one equi-join shuffle on the node key (the standard
 * distributed BFS shape — what GraphX/Pregel does under the hood, without
 * dropping to RDDs); the frontier and visited sets hold (node, dist)
 * scalars only and are eagerly checkpointed, so lineage stays O(1) per
 * round. Rounds are bounded by `maxDepth`.
 */
object GraphPaths {

  /**
   * BFS levels: every node reachable from `source` within `maxDepth` hops,
   * with its minimal hop distance. Output columns (node: long, dist: int).
   */
  def bfsLevels(edges: DataFrame, source: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the edge table ONCE — each round joins the checkpointed
    // blocks instead of re-running the upstream scan per round
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    var visited = Seq((source, 0)).toDF("node", "dist").localCheckpoint(true)
    var frontier = visited
    var d = 0
    var frontierN = 1L
    while (d < maxDepth && frontierN > 0) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d + 1))
        .localCheckpoint(true)
      frontierN = next.count()
      // no checkpoint needed: a union tree whose leaves are all checkpointed
      // is recompute-free, and its depth is bounded by maxDepth
      visited = visited.unionByName(next)
      frontier = next
      d += 1
    }
    visited
  }

  /** Shortest-path length from src to dst (hops), if within maxDepth. */
  def shortestPathLength(edges: DataFrame, source: Long, target: Long,
                         maxDepth: Int): Option[Int] =
    bfsLevels(edges, source, maxDepth)
      .where(col("node") === target)
      .collect().headOption.map(_.getInt(1))

  /** Driver-side brute-force oracle (tests). */
  def bruteBfs(edges: Seq[(Long, Long)], source: Long, maxDepth: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    var dist = Map(source -> 0)
    var frontier = Set(source)
    var d = 0
    while (d < maxDepth && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(dist.contains)
      next.foreach(n => dist += n -> (d + 1))
      frontier = next
      d += 1
    }
    dist
  }
}
