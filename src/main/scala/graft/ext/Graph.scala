package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over edge frames — the crawl-graph side of a
  * corpus curation pipeline (page authority feeds source weighting and
  * frontier prioritization alongside the text-quality gates).
  *
  * Integer discipline: ranks live on a fixed per-unit grid (`scale`
  * micro-units of mass per node at t=0) and every update is integer
  * arithmetic — `div` for the out-degree split and the damping ratio —
  * so the result is EXACT under any partitioning, any engine, any
  * summation order, and a DuckDB oracle can replay it term-for-term.
  *
  * Caching note: the loop-invariant frames (nodes, degree-annotated
  * edges) are deliberately NOT persisted here. Measured on the bench
  * fixture, caching them made `hits` 3.5× slower (isolated min 3.3 s →
  * 11.6 s): the cached plan's frozen output partitioning forces extra
  * exchanges into every sweep's join, and at these sizes recompute is
  * cheaper than the memory-store round trip. On a cluster where the
  * edge list is a multi-TB scan, persist it at the CALL SITE
  * (`edges.persist()` before invoking) — the operators compose with a
  * pre-cached input, they just don't impose the cost by default.
  */
object Graph {

  /** PageRank with damping d = 85/100 over `iters` synchronous sweeps,
    * entirely on the integer grid.
    *
    * Update rule per node v:
    * {{{
    *   r₀(v)    = scale
    *   r₊(v)    = scale·15/100  +  (Σ_{u→v} r(u) div outdeg(u)) · 85 div 100
    * }}}
    * Nodes with no in-links keep the bare teleport term; out-degree-0
    * (dangling) nodes contribute nothing — their mass decays toward the
    * teleport floor rather than being redistributed (the sink-drop
    * variant; deterministic, and the variant a SQL oracle can replay
    * without a global dangling-mass broadcast term).
    *
    * Scale shape: `edges` shuffles ONCE onto `src` for the out-degree
    * join, and that co-partitioned frame drives every iteration; each
    * sweep is then one shuffle-join rank⋈edges (both sides keyed) plus
    * one partial-aggregated `groupBy(dst)` — the canonical distributed
    * PageRank step, no driver-side state, no per-iteration re-read of
    * the edge list. `scale` bounds the arithmetic: with in-mass ≤
    * N·scale, `N·scale·85` must fit a signed 64-bit long — the default
    * 10¹² grid is good to ~10⁵ nodes per strongly-connected mass
    * concentration; drop to 10⁹ for billion-node graphs.
    *
    * Output: (node BIGINT, rank_pu BIGINT) — rank in `scale`-units.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && scale >= 100L && scale % 100L == 0L,
      "scale must be a positive multiple of 100 (exact damping split)")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // out-degree rides WITH the edge rows (one co-partitioned join,
    // reused by every sweep) so the per-iteration work is join + agg
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
    val teleport = scale / 100L * 15L
    var ranks = nodes.select(col("node"), lit(scale).as("rank_pu"))
    // NOT checkpointed per sweep, unlike [[hits]]: pageRank's lineage is
    // LINEAR (ranks(t) references ranks(t-1) exactly once), so the
    // replayed plan stays small, and the per-iteration eager
    // materialization cost more than the recompute it saved
    // (measured r21: isolated min 2.8 s plain vs 3.3 s checkpointed at
    // sf0.1 — the reverse of hits' recursive 2x blowup).
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank_pu div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("inm"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("coalesce(inm, CAST(0 AS BIGINT)) * 85 div 100"))
            .as("rank_pu"))
    }
    ranks
  }

  /** HITS (Kleinberg 1999) authority/hub scores over `iters` synchronous
    * sweeps on the integer grid — the OTHER classic link-analysis signal
    * (PageRank rewards being linked; HITS separates "linked by good
    * hubs" from "links to good authorities", the pair a crawl
    * prioritizer reads together).
    *
    * Per sweep, with max-normalization kept exact by integer rescale:
    * {{{
    *   auth'(v) = Σ_{u→v} hub(u);   auth(v) = auth'(v)·scale div max(auth')
    *   hub'(u)  = Σ_{u→v} auth(v);  hub(u)  = hub'(u)·scale div max(hub')
    * }}}
    * (the standard L∞ normalization — a max, not a vector norm, so it
    * stays in integer arithmetic; both scores start at `scale`).
    * Requires at least one edge (max-normalization is undefined on an
    * empty graph). Nodes without in-links hold authority 0; without
    * out-links, hub 0.
    *
    * Scale shape: same join skeleton as [[pageRank]] — edges shuffle
    * once and drive every sweep; each normalization max is a one-row
    * broadcast, never a data-sized collect. Long bound:
    * `max(auth')·scale ≤ N·scale²` must fit 2⁶³ — the 10⁶ default grid
    * is good to ~10⁶-node neighborhoods; shrink `scale` for larger
    * graphs. Output: (node, auth_pu, hub_pu). */
  def hits(edges: DataFrame, iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && scale >= 1L, "hits: iters >= 1, scale >= 1")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var hub = nodes.select(col("node"), lit(scale).as("hub_pu"))
    var auth = nodes.select(col("node"), lit(scale).as("auth_pu"))
    def normalize(raw: DataFrame, c: String): DataFrame =
      nodes.join(raw, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__raw"), lit(0L)).as("__raw"))
        .crossJoin(broadcast(raw.agg(max("__raw").as("__mx"))))
        .select(col("node"),
          expr(s"__raw * $scale div __mx").as(c))
    // Per-sweep localCheckpoint (the [[graft.ext.Dedup.components]]
    // idiom): without it the evolving auth/hub plans nest RECURSIVELY —
    // auth(t) references hub(t) which references auth(t-1) twice (the
    // sum join and the max broadcast), so the final plan grows to
    // ~2,000 physical nodes at iters=2 and Catalyst replans/re-executes
    // overlapping subtrees (measured: isolated min 5.9 s → 3.1 s at
    // sf0.1). Checkpointing each sweep keeps every round's plan three
    // joins deep; blocks are tracked for the caller's CacheScope
    // release, and round N-1's are freed as soon as round N is
    // materialized — in-flight footprint stays one (auth, hub) pair.
    // The loop-invariant frames (e, nodes) stay UNpersisted: caching
    // them froze their output partitioning and forced extra exchanges
    // into every sweep (measured 3.5x slower — see the object scaladoc).
    var prevRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    for (_ <- 1 to iters) {
      val (a2, aRdds) = graft.CacheScope.localCheckpointWithRdds(normalize(
        e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst").as("node")).agg(sum("hub_pu").as("__raw")),
        "auth_pu"))
      auth = a2
      val (h2, hRdds) = graft.CacheScope.localCheckpointWithRdds(normalize(
        e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src").as("node")).agg(sum("auth_pu").as("__raw")),
        "hub_pu"))
      hub = h2
      graft.CacheScope.unpersistRdds(prevRdds)
      prevRdds = aRdds ++ hRdds
    }
    // the final sweep's blocks back the returned plan (truncated
    // lineage — they cannot recompute); they live until release()
    graft.CacheScope.trackRdds(prevRdds)
    auth.join(hub, "node")
  }

  /** Per-node TRIANGLE counts over the undirected view of an edge frame
    * — the local clustering signal (spam farms and boilerplate rings
    * are triangle-dense; organic link neighborhoods aren't). Edges
    * canonicalize to `a < b` (self-loops dropped, duplicates and
    * reverse duplicates collapsed), so each triangle materializes
    * exactly once as `a < b < c` and contributes one count to each of
    * its three corners.
    *
    * Scale shape: the textbook oriented wedge join — edges ⋈ edges on
    * the shared middle vertex builds `a<b<c` wedges, one more key-keyed
    * join closes them against the edge set; both are shuffle joins on
    * edge keys, no cartesian anywhere. Orientation by id bounds each
    * vertex's wedge fan-out by its out-orientation degree; for graphs
    * with power-law hubs, orient by (degree, id) instead before calling
    * (the standard skew cure — the fixture graphs are near-regular).
    * Output: (node, n_tri), participating nodes only. */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val wedges = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("wa"), col("x.b").as("wb"), col("y.b").as("wc"))
    val tri = wedges.join(e.as("z"),
      col("wa") === col("z.a") && col("wc") === col("z.b"))
    tri.select(explode(array(col("wa"), col("wb"), col("wc"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
