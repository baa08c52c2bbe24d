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

  // 1→{2,3}, 2→3 on the scale=100 grid — hand-computed L∞ sweeps:
  //   sweep 1: auth' = (–, 100, 200), max 200 → a = (0, 50, 100)
  //            hub'  = (150, 100, –), max 150 → h = (100, 66, 0)
  //   sweep 2: auth' = (–, 100, 166), max 166 → a = (0, 60, 100)
  //            hub'  = (160, 100, –), max 160 → h = (100, 62, 0)
  private def hitsEdges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    .toDF("src", "dst")

  test("hits replays the hand-computed integer sweeps") {
    val r1 = Graph.hits(hitsEdges, iters = 1, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(r1 === Map(1L -> (0L, 100L), 2L -> (50L, 66L),
      3L -> (100L, 0L)))
    val r2 = Graph.hits(hitsEdges, iters = 2, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(r2 === Map(1L -> (0L, 100L), 2L -> (60L, 62L),
      3L -> (100L, 0L)))
  }

  test("hits: a regular permutation cycle normalizes to the uniform point") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = Graph.hits(e, iters = 3, scale = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(r === Set((100L, 100L)))
  }

  test("triangles: canonicalization kills self-loops/dups, corners count once each") {
    // clean triangles {1,2,3} and {1,3,4}; (2,1) duplicates (1,2)
    // reversed, (5,5) is a self-loop, (4,3) re-delivers (3,4) — none
    // may change the counts, and node 5 never appears
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L),
      (2L, 1L), (5L, 5L), (4L, 3L)).toDF("src", "dst")
    val out = Graph.triangles(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: a triangle-free cycle yields no rows") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    assert(Graph.triangles(e).count() === 0L)
  }
}
