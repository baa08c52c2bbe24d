package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 2→{1,3}, 3→1 — every update hand-computed on the scale=1000
  // grid (teleport 150, damping (x·85) div 100):
  //   r1 = (1425, 1000, 575), r2 = (1063, 1361, 575)
  private def edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("pageRank replays the hand-computed integer sweeps") {
    val r2 = Graph.pageRank(edges, iters = 2, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 1063L, 2L -> 1361L, 3L -> 575L))
  }

  test("iters = 0 returns the uniform initial grid") {
    val r0 = Graph.pageRank(edges, iters = 0, scale = 1000L)
      .collect().map(r => r.getLong(1)).toSet
    assert(r0 === Set(1000L))
  }

  test("dangling nodes keep the teleport floor and leak mass (sink-drop)") {
    // 1→2 only: node 2 has no out-links; node 1 no in-links.
    // r1 = (150, 1000); r2 = (150, 150 + (150 div 1)·85 div 100 = 277)
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 2, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r === Map(1L -> 150L, 2L -> 277L))
  }

  test("a permutation graph (in-degree = out-degree = 1) is a fixed point") {
    // 0→1→2→0: every node receives exactly one full rank each sweep, so
    // rank stays at teleport + 85% of scale = 150 + 850 = 1000 forever.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 3, scale = 1000L)
      .collect().map(r => r.getLong(1)).toSet
    assert(r === Set(1000L))
  }

  test("scale must be a positive multiple of 100") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, iters = 1, scale = 1050L)
    }
  }
}
