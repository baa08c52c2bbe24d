package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver parses Bench's single JSON line from a bounded (2000-char)
  * tail of captured stdout. Round 4's line was 2224 chars and silently
  * failed to parse; round 10 lost its bench number AGAIN when 42 analysis
  * exceptions × ~200 chars each overflowed the window. This spec drives
  * the REAL [[Bench.buildLine]] through the zero-error worst case and the
  * r10 error-storm shape and pins both under the window, so neither
  * adding queries nor a broken-table round can re-break the parse.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val names = SparkEntry.queries.keys.toSeq

  test("worst-case bench JSON line fits the driver's 2000-char tail window") {
    assert(names.nonEmpty)
    // Worst-case value rendering under Bench's adaptive formatting for
    // any sane per-query timing (<1000s): 3 chars — "9.9" under the
    // 9.95 guard, "999" above it.
    val line = Bench.buildLine(names.map(_ -> 9.9), Seq.empty, "32", "sf0.1")
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
    val node = mapper.readTree(line)
    assert(node.get("queries").size() === names.size)
    assert(node.get("n_err") == null)
  }

  test("r10 error-storm shape: 42 erroring queries still parse under 2000 chars") {
    assume(names.size > 42)
    // The r10 blast radius exactly: 42 queries error with the same long
    // analysis exception (truncated to 40 chars at capture, as
    // Bench.main now does), the rest time normally.
    val (broken, healthy) = names.splitAt(42)
    val msg = Bench.errMsg(new RuntimeException(
      "[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] Cannot resolve " +
        "\"(ts div 1000)\" due to data type mismatch ... long analysis trailer " +
        "with plan fragments and suggestions attached by Spark 4"))
    val line = Bench.buildLine(healthy.map(_ -> 9.9), broken.map(_ -> msg),
      "32", "sf0.1")
    assert(line.length <= 2000,
      s"error-storm line is ${line.length} chars — driver tail would drop it")
    val node = mapper.readTree(line)
    assert(node.get("n_err").asInt() === 42)
    assert(node.get("errors").size() <= 3)
    // the 1e9-per-error poison reflects ALL 42 errors, not the 3 sampled
    assert(node.get("value").asDouble() >= 42e9)
    assert(node.get("queries").size() === healthy.size)
  }

  test("errMsg strips the error-class prefix before truncating (ADVICE r11)") {
    val a = Bench.errMsg(new RuntimeException(
      "[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] Cannot resolve \"(a + b)\""))
    val b = Bench.errMsg(new RuntimeException(
      "[DATATYPE_MISMATCH.BINARY_OP_WRONG_TYPE] Cannot resolve \"(a + b)\""))
    // before the fix both rendered as the identical 40-char class prefix;
    // after it the distinguishing payload survives the truncation
    assert(!a.startsWith("["))
    assert(a.startsWith("Cannot resolve"))
    assert(a.length <= 60 && b.length <= 60)
    // no-prefix and null-message throwables still capture something
    assert(Bench.errMsg(new RuntimeException("plain failure")) === "plain failure")
    assert(Bench.errMsg(new RuntimeException()).nonEmpty)
  }

  test("rerun audit: discarded first readings ride the line, dropped first under pressure") {
    // a handful of outlier reruns must serialize and parse (ADVICE r12:
    // the min is auditable from the line itself)
    val line = Bench.buildLine(names.map(_ -> 0.9), Seq.empty, "32", "sf0.1",
      reruns = Seq("lm3" -> 5.3, "dd_keep" -> 4.1))
    val node = mapper.readTree(line)
    assert(node.get("rerun").size() === 2)
    assert(node.get("rerun").get("lm3").asDouble() === 5.3)
    // under MODERATE pressure (no errors, every query rerun) the audit
    // degrades gradually: the worst discarded readings survive instead
    // of the whole object vanishing (r13: the 44 s semdd phantom's
    // audit was dropped exactly when it mattered)
    val mid = Bench.buildLine(names.map(_ -> 9.9), Seq.empty, "32", "sf0.1",
      reruns = names.zipWithIndex.map { case (n, i) => n -> (9.9 + i) })
    val mn = mapper.readTree(mid)
    assert(mn.get("rerun") != null && mn.get("rerun").size() <= 5 &&
      mn.get("rerun").size() > 0,
      s"expected a shrunken-but-present audit, got: $mid")
    // the worst readings are the ones kept
    assert(mn.get("rerun").get(names.zipWithIndex.maxBy(_._2)._1) != null)
    // under FULL pressure the rerun object is still the first casualty —
    // measurements and the error blast radius always survive it
    val storm = Bench.buildLine(names.map(_ -> 9.9),
      names.take(42).map(_ -> ("x" * 60)), "32", "sf0.1",
      reruns = names.map(_ -> 9.9))
    assert(storm.length <= 2000)
    val sn = mapper.readTree(storm)
    assert(sn.get("rerun") == null || sn.get("rerun").size() <= 5)
    assert(sn.get("n_err").asInt() === 42)
    assert(sn.get("queries").size() === names.size)
    // ordering proof: error samples OUTLIVE the rerun audit — under a
    // pressure level that killed the audit entirely, at least one
    // sampled error message still rides the line
    assert(sn.get("rerun") != null || (sn.get("errors") != null &&
      sn.get("errors").size() >= 1),
      s"errors must degrade after the rerun audit: $storm")
  }

  test("family sharding covers every declared query with bounded shards") {
    // VERDICT r13 task 1: the sweep shards per family across fresh JVMs.
    // Every query must land in a declared family, and no shard may grow
    // back toward the 136-in-one-JVM shape the sharding exists to kill.
    val byFam = names.groupBy(Bench.familyOf)
    byFam.keys.foreach(f => assert(Bench.Families.contains(f),
      s"familyOf produced undeclared shard '$f'"))
    assert(byFam.values.map(_.size).sum === names.size)
    byFam.foreach { case (f, qs) =>
      assert(qs.size <= 40,
        s"shard '$f' has ${qs.size} queries — rebalance familyOf before it " +
          "re-accumulates single-JVM sweep debt")
    }
    // the core serving rows and the ANN rows must not share a JVM with
    // the heavy dedup self-joins (the r13 phantom pattern)
    assert(Bench.familyOf("b2_srv") === "core")
    assert(Bench.familyOf("ann_ivf") === "ann")
    assert(Bench.familyOf("a5_sum") === "core") // "a" prefix, not "ann_"
    assert(Bench.familyOf("dd_keepb") === "dedup")
    assert(Bench.familyOf("semdd") === "dedup")
    assert(Bench.familyOf("mm_video") === "mm")
    assert(Bench.familyOf("s_temp") === "pack")
    assert(Bench.familyOf("secrets") === "text") // "s" but not "s_"
    assert(Bench.familyOf("q_roll") === "rel")
    assert(Bench.familyOf("lm3") === "text")
  }

  test("shard partial TSV round-trips timings, errors and torn tails") {
    val f = java.io.File.createTempFile("bench_partial", ".tsv")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      "T\tq1_price\t0.731\n" +
        "R\tsemdd\t11.2\n" +
        "T\tsemdd\t2.4\n" +
        "E\tmm_video\tcodec fixture missing\n" +
        "T\tq_roll") // torn final line: child crashed mid-write
    val out = Bench.readPartial(f.getAbsolutePath)
    assert(out("q1_price") === Right(0.731))
    assert(out("semdd") === Right(2.4)) // terminal T wins; R is audit-only
    assert(out("mm_video") === Left("codec fixture missing"))
    assert(!out.contains("q_roll"), "a torn line must read as 'shard died'")
    // a missing partial (child died before its first query) is empty, not
    // an exception — the parent charges those names as shard-death errors
    assert(Bench.readPartial(f.getAbsolutePath + ".does-not-exist").isEmpty)
  }

  test("rerun threshold sits above every healthy isolated minimum band") {
    // the guard must never trigger on the recurring healthy readings
    // (<= ~3.2 s isolated across r3-r11) yet must catch the 7-18 s
    // phantom outliers the r11 driver sweep recorded
    assert(Bench.RerunThresholdSec >= 2.5 && Bench.RerunThresholdSec <= 4.0)
  }

  test("every declared query erroring still yields a parseable line") {
    val line = Bench.buildLine(Seq.empty,
      names.map(_ -> "java.lang.IllegalStateException: testdata schema ch"),
      "32", "sf0.1")
    assert(line.length <= 2000)
    val node = mapper.readTree(line)
    assert(node.get("n_err").asInt() === names.size)
    assert(node.get("value").asDouble() >= names.size * 1e9)
  }
}
