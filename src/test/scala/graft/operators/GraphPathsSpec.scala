package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // seeded random directed graph: 200 nodes, out-degree ~3
  val rnd = new scala.util.Random(11)
  val edges: Seq[(Long, Long)] = (0L until 200L).flatMap { s =>
    (0 until 3).map(_ => (s, rnd.nextInt(200).toLong))
  }

  test("bfsLevels == brute-force BFS distances (random graph, several depths)") {
    val e = edges.toDF("src", "dst")
    for (depth <- Seq(1, 3, 8)) {
      val got = GraphPaths.bfsLevels(e, source = 0L, maxDepth = depth)
        .as[(Long, Int)].collect().toMap
      val want = GraphPaths.bruteBfs(edges, 0L, depth)
      assert(got === want, s"depth=$depth")
      assert(want.size > 1)
    }
  }

  test("shortestPathLength: found within budget, None beyond it / unreachable") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst")
    assert(GraphPaths.shortestPathLength(e, 0L, 3L, maxDepth = 8) === Some(3))
    assert(GraphPaths.shortestPathLength(e, 0L, 3L, maxDepth = 2) === None)
    assert(GraphPaths.shortestPathLength(e, 0L, 8L, maxDepth = 8) === None)
    assert(GraphPaths.shortestPathLength(e, 0L, 0L, maxDepth = 8) === Some(0))
  }

  test("min-dist semantics: a node reachable by two paths keeps the shorter") {
    // 0->1->2->4 and 0->3->4: dist(4) must be 2, not 3
    val e = Seq((0L, 1L), (1L, 2L), (2L, 4L), (0L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphPaths.bfsLevels(e, 0L, 8).as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2))
  }
}
