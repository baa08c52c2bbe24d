package graft.ext

import graft.SparkSpec

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """[{"role":"system","content":"be brief"},""" +
      """{"role":"user","content":"hi there"},""" +
      """{"role":"assistant","content":"hello"}]"""

  test("stats: hand-computed counts, alternation, chars, render fp") {
    val df = Seq((1L, good)).toDF("doc_id", "conv")
    val r = Chat.stats(df, $"conv", $"doc_id").collect().head
    assert(r.getBoolean(1))                    // parse_ok
    assert(r.getLong(2) === 3L)                // n_turns
    assert(r.getLong(3) === 1L)                // n_user
    assert(r.getLong(4) === 1L)                // n_asst
    assert(r.getBoolean(5))                    // has_system
    assert(r.getBoolean(6))                    // alternation_ok
    assert(r.getLong(7) === 21L)               // 8 + 8 + 5
    val rendered =
      "<|system|>be brief\n<|user|>hi there\n<|assistant|>hello"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(8) === md)
    assert(Chat.render(df, $"conv", $"doc_id")
      .collect().head.getString(1) === rendered)
  }

  test("stats: a doubled role breaks alternation; a single turn passes") {
    val doubled = """[{"role":"user","content":"a"},""" +
      """{"role":"user","content":"b"}]"""
    val single = """[{"role":"user","content":"a"}]"""
    val out = Chat.stats(
        Seq((1L, doubled), (2L, single)).toDF("doc_id", "conv"),
        $"conv", $"doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(6)))
    assert(out.toSeq === Seq((1L, false), (2L, true)))
  }

  test("a well-formed EMPTY conversation reports, never crashes the slice") {
    // "[]" parses fine; the alternation zip and the pref prompt slices
    // must take the greatest(0) guard, not Spark's negative-length error
    val df = Seq((1L, "[]")).toDF("doc_id", "conv")
    val r = Chat.stats(df, $"conv", $"doc_id").collect().head
    assert(r.getBoolean(1))            // parse_ok
    assert(r.getLong(2) === 0L)        // n_turns
    assert(r.getBoolean(6))            // alternation vacuously true
    val pr = Chat.prefStats(
        Seq((1L, "[]", """[{"role":"assistant","content":"a"}]"""))
          .toDF("pair_id", "chosen", "rejected"),
        $"chosen", $"rejected", $"pair_id").collect().head
    assert(pr.getBoolean(1))           // pair_ok
    assert(!pr.getBoolean(2))          // empty side can't end assistant
    assert(pr.getBoolean(3))           // both prompts empty → shared
    assert(pr.getLong(4) === 0L)       // n_prompt_turns clamps at 0
  }

  test("stats: malformed JSON quarantines to nulls, never errors") {
    val out = Chat.stats(
        Seq((1L, good.dropRight(2)), (2L, "not json at all"))
          .toDF("doc_id", "conv"),
        $"conv", $"doc_id").collect()
    out.foreach { r =>
      assert(!r.getBoolean(1))
      assert(r.isNullAt(2) && r.isNullAt(6) && r.isNullAt(8))
    }
  }

  test("assistantSpans: offsets slice the exact content out of render") {
    // lines: '<|system|>be brief' (18), '<|user|>hi there' (16),
    // '<|assistant|>hello' (18) → assistant content starts at
    // 18 + 16 + 2 newlines + 13-char prefix = 49, ends at 54
    val df = Seq((1L, good)).toDF("doc_id", "conv")
    val spans = Chat.assistantSpans(df, $"conv", $"doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq((2L, 49L, 54L)))
    val rendered = Chat.render(df, $"conv", $"doc_id")
      .collect().head.getString(1)
    assert(rendered.substring(49, 54) === "hello")
    // malformed conversations yield no span rows
    assert(Chat.assistantSpans(
      Seq((1L, "not json")).toDF("doc_id", "conv"),
      $"conv", $"doc_id").count() === 0L)
  }

  test("prefStats: every verdict covered by one hand pair each") {
    def conv(last: String, prompt: String = "q") =
      s"""[{"role":"user","content":"$prompt"},$last]"""
    val asst = """{"role":"assistant","content":"a"}"""
    val user = """{"role":"user","content":"a"}"""
    val chosen = conv(asst)
    val rows = Seq(
      (1L, chosen, conv(asst)),            // clean pair
      (2L, chosen, conv(user)),            // rejected ends on user
      (3L, chosen, conv(asst, "other")),   // prompts diverge
      (4L, chosen, "not json"))            // rejected quarantined
      .toDF("pair_id", "chosen", "rejected")
    val out = Chat.prefStats(rows, $"chosen", $"rejected", $"pair_id")
      .orderBy("pair_id").collect()
    def b(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getBoolean(i)
    assert(out.map(r => (r.getLong(0), b(r, 1), b(r, 2), b(r, 3))).toSeq
      === Seq(
        (1L, true, true, true),
        (2L, true, false, true),
        (3L, true, true, false),
        (4L, false, null, null)))
    assert(out(0).getLong(4) === 1L)
    assert(out(3).isNullAt(4))
    // narrow: zero shuffles
    val plan = Chat.prefStats(rows, $"chosen", $"rejected", $"pair_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("stats is a narrow zero-shuffle projection") {
    val df = Seq((1L, good)).toDF("doc_id", "conv")
    val plan = Chat.stats(df, $"conv", $"doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("render feeds the dedup matrix: exact and near dup renders pair") {
    import org.apache.spark.sql.functions._
    // 1 and 2 render identically; 3 differs by one word (near dup);
    // 4 is a different conversation entirely
    def conv(ans: String) =
      s"""[{"role":"user","content":"explain the packing rules"},""" +
        s"""{"role":"assistant","content":"$ans"}]"""
    val same = "pack rules go by token budget and bin order every time"
    val near = "pack rules go by token budget and bin order every epoch"
    val other = "unrelated answer about completely different things here"
    val df = Seq(1L -> conv(same), 2L -> conv(same), 3L -> conv(near),
      4L -> conv(other)).toDF("doc_id", "conv")
    try {
      val r = Chat.render(df, $"conv", $"doc_id")
      val pairs = Dedup.ngramJaccard(r, col("text"), col("doc_id"),
          minJaccard = 0.5)
        .orderBy("doc_a", "doc_b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(4)))
      assert(pairs.map(p => (p._1, p._2)).toSeq ==
        Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(pairs.head._3 == 1.0 && pairs(1)._3 < 1.0 && pairs(1)._3 > 0.5)
      // the exact tier by fingerprint: only 1-2 share a render_fp
      val fps = Chat.stats(df, $"conv", $"doc_id")
        .select("doc_id", "render_fp").collect()
        .map(x => x.getLong(0) -> x.getString(1)).toMap
      assert(fps(1L) == fps(2L) && fps(1L) != fps(3L) && fps(3L) != fps(4L))
    } finally graft.CacheScope.release()
  }
}
