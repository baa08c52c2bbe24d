package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line from a bounded (2000-char)
  * tail of captured stdout. Round 4's line was 2224 chars and silently
  * failed to parse (`BENCH_r04.json: parsed: null`). This spec rebuilds
  * the worst-case line shape from the real query inventory and pins it
  * under the window, so adding queries can't re-break the bench without
  * failing the suite.
  */
class BenchLineSpec extends AnyFunSuite {

  test("worst-case bench JSON line fits the driver's 2000-char tail window") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.nonEmpty)
    // Worst-case value rendering under Bench's adaptive formatting for
    // any sane per-query timing (<1000s): 3 chars — "9.9" under the
    // 9.95 guard, "999" above it.
    val qs = names.map(n => s""""$n":9.9""").mkString("{", ",", "}")
    // Worst-case happy-path total: <1000 s formats as 3 chars ("999");
    // a query failure blows the line with 1e9 penalties + an errors map
    // regardless, so the budget pins the zero-error shape only.
    val line =
      s"""{"metric":"total","value":999,"unit":"sec","queries":$qs,"cpus":32,"sf":"sf0.1"}"""
    // Round 10 shortened the 21 longest names to reclaim headroom (the
    // line sat at 1,978/2,000 — one more query would have silently
    // broken the driver's tail parse). Keep >=150 chars spare so the
    // inventory can still grow ~10 queries without another rename
    // sweep. If this trips: the next structural levers are emitting
    // basename(sfDir) instead of the full path (-15) and then
    // shortening the longest query names.
    assert(
      line.length <= 1850,
      s"bench JSON line would be ${line.length} chars with ${names.size} queries " +
        "(need >=150 chars spare under the driver's 2000-char tail); " +
        "shorten query names or tighten Bench.scala's encoding before adding more")
  }
}
