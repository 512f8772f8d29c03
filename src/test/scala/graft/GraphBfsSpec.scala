package graft

import org.apache.spark.sql.functions._

/** Crafted-graph semantics of the BFS frontier loop ([[ops.Graph.bfsLayers]]):
  * the sf gate proves cross-engine equality on the real corpus; these
  * prove the MATH — hop minimality under cycles and multiple paths,
  * the hop bound, unreachability, and multi-source minimum.
  */
class GraphBfsSpec extends SparkSpec {
  import spark.implicits._

  private def und(pairs: (Long, Long)*) = {
    val d = pairs.toDF("src", "dst")
    d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
  }
  private def seeds(ns: Long*) = ns.toDF("node")
  private def run(e: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame, k: Int) =
    ops.Graph.bfsLayers(e, s, k).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: hops are exact distances; nodes past the bound are absent") {
    // 1-2-3-4-5-6-7, seed 1, bound 4 → nodes 6,7 unreached
    val got = run(und(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L), seeds(1L), 4)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("cycle + chord: shortest of several paths wins, loop terminates") {
    // cycle 1-2-3-4-5-1 with chord 2-5: node 4 is 2 away both ways
    val got = run(und(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 1L, 2L -> 5L), seeds(1L), 4)
    assert(got === Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("multi-source: a node's hop is the min over seeds; disconnected component unreached") {
    // path 1..5 seeded at both ends + isolated edge 10-11
    val got = run(und(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 10L -> 11L), seeds(1L, 5L), 4)
    assert(got === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("corpus key agrees with a driver-side Dijkstra replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = ops.Graph.graphBfsLayers(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay: adjacency + BFS in plain Scala
    val d0 = ops.Graph.orderSequenceEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (d0 ++ d0.map(_.swap)).distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet
    var dist = nodes.filter(_ % 97 == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1 to 4) {
      val fresh = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist ++= fresh.map(_ -> h.toLong)
      frontier = fresh
    }
    assert(rows === dist)
  }
}
