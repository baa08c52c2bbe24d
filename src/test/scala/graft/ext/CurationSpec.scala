package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = graft.CacheScope.release()

  test("dedupWithinDoc keeps first occurrences in order, cross-doc repeats untouched") {
    val docs = Seq(
      (1L, "a b\n\nc d\n\na b\n\ne"), // repeat of its own first block
      (2L, "a b\n\nx"),               // shares "a b" with doc 1: kept (not within-doc)
      (3L, "x\n\n\n\nx")              // empty middle segment, repeat tail
    ).toDF("doc_id", "text")
    val out = Curation.dedupWithinDoc(docs, $"text", $"doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, "a b\n\nc d\n\ne"),
      (2L, 2L, 2L, "a b\n\nx"),
      (3L, 3L, 2L, "x\n\n")))
    // narrow: the whole pass is a projection
    val p = Curation.dedupWithinDoc(docs, $"text", $"doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("dedupLines drops corpus-shared lines, keeps order, survives empties") {
    val docs = Seq(
      (1L, "shared line\nunique one"),
      (2L, "shared line\nunique two\nshared line"),
      (3L, "only me"),
      (4L, "shared line")).toDF("doc_id", "text")
    val out = Curation.dedupLines(docs, $"text", $"doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      // "shared line" is in 3 distinct docs -> every occurrence dropped,
      // including BOTH copies inside doc 2; doc 4 keeps nothing but the
      // document row itself survives with empty text
      (1L, 2L, 1L, "unique one"),
      (2L, 3L, 1L, "unique two"),
      (3L, 1L, 1L, "only me"),
      (4L, 1L, 0L, "")))
  }

  test("dedupLines is partitioning-independent") {
    val docs = (0L until 200L)
      .map(i => (i, s"common header\nbody ${i % 7}\ntail $i"))
      .toDF("doc_id", "text")
    val a = Curation.dedupLines(docs, $"text", $"doc_id")
      .orderBy("doc_id").collect().toSeq
    graft.CacheScope.release()
    val b = Curation.dedupLines(docs.repartition(7), $"text", $"doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // "common header" (200 docs) and "body k" (~28 docs each) go; only
    // the unique tail survives
    a.foreach(r => assert(r.getString(3) == s"tail ${r.getLong(0)}"))
  }

  test("redactPii masks email/ip/phone and counts on the original text") {
    val docs = Seq(
      (1L, "mail a.b+c@x.co.uk or 192.168.0.1 call 555-123-4567 end"),
      (2L, "no pii here at all"),
      (3L, "twice u@a.bc and v@b.cd")).toDF("doc_id", "text")
    val out = Curation.redactPii(docs, $"text", $"doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 1, 1, 1, "mail <EMAIL> or <IP> call <PHONE> end"),
      (2L, 0, 0, 0, "no pii here at all"),
      (3L, 2, 0, 0, "twice <EMAIL> and <EMAIL>")))
  }

  test("duplicateSpans merges overlapping windows and counts same-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x b c d y"),
      (3L, "b c m n o p c d"),
      (4L, "z z z")).toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, $"text", $"doc_id",
        k = 2, minCount = 2)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      // "b c" and "c d" each occur in docs 1, 2 and 3; "z z" occurs
      // twice WITHIN doc 4. Doc 3's two hits are 6 positions apart
      // (> k) -> two separate spans; docs 1/2's adjacent hits merge.
      (1L, 1, 3, 3),
      (2L, 1, 3, 3),
      (3L, 0, 1, 2),
      (3L, 6, 7, 2),
      (4L, 0, 2, 3)))
  }

  test("cutSpans removes exactly the duplicated spans, keeps the rest in order") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x b c d y"),
      (3L, "b c m n o p c d"),
      (4L, "z z z"),
      (5L, "all unique words here")).toDF("doc_id", "text")
    val out = Curation.cutSpans(docs, $"text", $"doc_id", k = 2, minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 3L, "a e f"),
      (2L, 5L, 3L, "x y"),
      (3L, 8L, 4L, "m n o p"),
      (4L, 3L, 3L, ""),
      (5L, 4L, 0L, "all unique words here")))
  }

  test("chunkByWords: overlap, short tail, one-window and empty docs by hand") {
    // size 4, stride 3 over hand-sized docs:
    //  doc 1: 10 words -> nc = 1 + ceil(6/3) = 3 chunks, tail n_words 4
    //  doc 2: 4 words  -> exactly one window, 1 chunk
    //  doc 3: 2 words  -> under one window, 1 chunk of 2
    //  doc 4: empty    -> dropped
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b c d"),
      (3L, "x y"),
      (4L, "   ")).toDF("doc_id", "text")
    val out = Curation.chunkByWords(docs, col("text"), col("doc_id"),
        sizeWords = 4, strideWords = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w4 w5 w6 w7", 4), // stride 3 < size 4: one-word overlap
      (1L, 2, "w7 w8 w9 w10", 4),
      (2L, 0, "a b c d", 4),
      (3L, 0, "x y", 2)))
    // partitioning-independent (pure narrow projection)
    val again = Curation.chunkByWords(docs.repartition(5), col("text"),
        col("doc_id"), sizeWords = 4, strideWords = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(again == out)
  }

  test("chunkBySentences: boundaries, overlap, swallowed windows by hand") {
    // size 4, stride 2; '.'/'!' end sentences, final word always does.
    //  doc 1: "aa bb. cc dd ee. ff" -> sentences (o=0,c=2) (o=2,c=3)
    //    (o=5,c=1); windows: ci0 gets o0+o2, ci1 gets o2+o5, ci2 o5
    //  doc 2: 9 words, no punctuation -> ONE 9-word sentence at o=0:
    //    a single chunk 0 RUNNING PAST the 4-word budget (never split),
    //    later windows swallowed (no chunk 1)
    //  doc 3: "hey! yo" -> two 1-word sentences, both start in window 0
    val docs = Seq(
      (1L, "aa bb. cc dd ee. ff"),
      (2L, (1 to 9).map(i => s"w$i").mkString(" ")),
      (3L, "hey! yo")).toDF("doc_id", "text")
    val out = Curation.chunkBySentences(docs, col("text"), col("doc_id"),
        sizeWords = 4, strideWords = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "aa bb. cc dd ee.", 2, 5),
      (1L, 1, "cc dd ee. ff", 2, 4),
      (1L, 2, "ff", 1, 1),
      (2L, 0, (1 to 9).map(i => s"w$i").mkString(" "), 1, 9),
      (3L, 0, "hey! yo", 2, 2)))
    // partitioning-independent (pure narrow projection)
    val again = Curation.chunkBySentences(docs.repartition(5), col("text"),
        col("doc_id"), sizeWords = 4, strideWords = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Int, Int)].collect().toSeq
    assert(again == out)
  }

  test("c4Clean: line keep rules and page-level drops by hand") {
    val docs = Seq(
      // keep lines 1 (6 words, '.') and 5 (5 words, '!'); drop 2 (2
      // words), 3 (no terminal), 4 (mentions Javascript)
      (1L, "we all agree this works fine.\nshort one.\n" +
        "no terminal here at all\nthe Javascript engine is quite fast.\n" +
        "ok really good line indeed!"),
      // page contains "lorem ipsum" -> page dropped; n_kept still
      // reports the 2 rule-surviving lines
      (2L, "this page uses lorem ipsum filler text here today.\n" +
        "another good line with five words."),
      // '{' anywhere nukes the page; line 1 also fails the 5-word floor
      (3L, "code block { inside.\na perfectly fine sentence right here."),
      // terminal '"' counts (C4 keeps quoted sentence ends)
      (4L, "he said \"this is fine\"")).toDF("doc_id", "text")
    val out = Curation.c4Clean(docs, $"text", $"doc_id")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Boolean, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5, 2, true,
        "we all agree this works fine.\nok really good line indeed!"),
      (2L, 2, 2, false, ""),
      (3L, 2, 1, false, ""),
      (4L, 1, 1, true, "he said \"this is fine\"")))
  }

  test("flagSecrets: five credential families counted and scrubbed, scrub is a fixed point") {
    val docs = Seq(
      // built by concat so no credential-shaped literal sits in source
      (1L, "deploy key AKIA" + "0123456789ABCDEF" + " done"),
      (2L, "-----BEGIN EC PRIVATE " + "KEY----- material"),
      (3L, "push ghp_" + "a" * 36 + " to remote"),
      (4L, "hook xoxb-" + "123456789012" + " set"),
      (5L, "API_KEY = abcdef123 in env"),
      (6L, "nothing secret-looking here")).toDF("doc_id", "text")
    val out = Curation.flagSecrets(docs, $"text", $"doc_id")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Int, Int, Boolean, String)]
      .collect().toSeq
    assert(out.map(r => (r._2, r._3, r._4, r._5, r._6, r._7)) == Seq(
      (1, 0, 0, 0, 0, true),
      (0, 1, 0, 0, 0, true),
      (0, 0, 1, 0, 0, true),
      (0, 0, 0, 1, 0, true),
      (0, 0, 0, 0, 1, true),
      (0, 0, 0, 0, 0, false)))
    assert(out(0)._8 == "deploy key <SECRET> done")
    assert(out(4)._8 == "API_KEY = <SECRET> in env") // key+sep survive
    assert(out(5)._8 == "nothing secret-looking here")
    // fixed point: scrubbing the scrubbed text changes nothing
    val again = Curation.flagSecrets(
        Curation.flagSecrets(docs, $"text", $"doc_id")
          .select($"doc_id", $"scrubbed".as("text")),
        $"text", $"doc_id")
      .orderBy("doc_id").select("scrubbed").as[String].collect().toSeq
    assert(again == out.map(_._8))
  }

  test("c4_profile: native pass equals the HOF formulation on hostile pages") {
    val nasty = Seq(
      "", "\n", "\n\n", "only line no terminal",
      "ends with dot but short.", "one two three four five six.",
      "  leading and trailing spaces in a line here .  \nnext line ok.",
      "JavaScript is CASE insensitive here today.",
      "brace { kills\na perfectly good sentence right here.",
      "lorem IPSUM mixed case\nanother fine line right here today.",
      "quote end here we go now\"\nbang end here we go now!",
      "multi\n\n\nempty\nlines between these words here today.",
      "   \nall spaces line above and this one keeps going fine.",
      "\t.\ntab only line above then this good line survives here.",
      null) // NULL page: struct null-propagates, clean_text coalesces to ""
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = nasty.toDF("doc_id", "text")
    val native = Curation.c4Clean(df, $"text", $"doc_id", minWords = 5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val hof = df.select(col("doc_id"), split(col("text"), "\n").as("__ls"),
        (!lower(col("text")).contains("lorem ipsum") &&
          !col("text").contains("{")).as("page_ok"))
      .withColumn("__keep", expr(
        "filter(__ls, l -> (endswith(l, '.') or endswith(l, '!') or " +
          "endswith(l, '?') or endswith(l, '\"')) " +
          "and size(split(trim(l), ' +')) >= 5 " +
          "and not contains(lower(l), 'javascript'))"))
      .select(col("doc_id"), size(col("__ls")).as("n_lines"),
        size(col("__keep")).as("n_kept"), col("page_ok"),
        when(col("page_ok"), concat_ws("\n", col("__keep")))
          .otherwise(lit("")).as("clean_text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native == hof)
  }

  test("c4Clean: minWords floor is a parameter") {
    val docs = Seq((1L, "tiny line.\nbig enough line here today.")).toDF("doc_id", "text")
    val strict = Curation.c4Clean(docs, $"text", $"doc_id")
      .select("n_kept").as[Int].head()
    val loose = Curation.c4Clean(docs, $"text", $"doc_id", minWords = 2)
      .select("n_kept").as[Int].head()
    assert(strict == 1 && loose == 2)
  }

  test("duplicateSpans: a unique corpus yields no spans") {
    val docs = Seq((1L, "p q r s t"), (2L, "u v w x y")).toDF("doc_id", "text")
    assert(Curation.duplicateSpans(docs, $"text", $"doc_id", k = 2).count() == 0)
  }

  test("maximalMatches: nested and overlapping duplicates of different lengths") {
    // doc1+doc2 share the 7-word run "a b c d e f g" (at 0 and 1);
    // doc3 shares only the NESTED 5-word "c d e f g" with both; doc4
    // self-repeats "m n o p q" (pos 0 and 7). Every expected row is
    // hand-derived from the diagonal-chaining definition — including
    // the maximality boundaries (the windows just past each run end
    // occur once and match nothing).
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d e f g y"),
      (3L, "c d e f g q r s t"),
      (4L, "m n o p q z w m n o p q")).toDF("doc_id", "text")
    val m = Curation.maximalMatches(docs, $"text", $"doc_id", k = 5)
      .orderBy("doc_a", "doc_b", "a_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(m.toSeq == Seq(
      (1L, 2L, 0, 1, 7),  // the full 7-word run, chained from 3 windows
      (1L, 3L, 2, 0, 5),  // the nested 5-word run, both directions of id
      (2L, 3L, 3, 0, 5),
      (4L, 4L, 0, 7, 5))) // self-match: ordered by position within doc
    // per-doc fold: longest wins, ties by smallest start
    val top = Curation.longestDuplicatePerDoc(docs, $"text", $"doc_id", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(top.toSeq == Seq(
      (1L, 0, 7), (2L, 1, 7), (3L, 0, 5), (4L, 0, 5)))
    // partitioning-independent (window keys + exact integers only)
    val again = Curation
      .longestDuplicatePerDoc(docs.repartition(5), $"text", $"doc_id", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSeq == top.toSeq)
    // the stop-shingle cap skips over-cap seeds: with maxOccur = 2 the
    // thrice-occurring "c d e f g" window is dropped, which SPLITS the
    // doc1/doc2 chain around it — the two survivors re-chain to a
    // shorter maximal run and doc3's runs disappear entirely
    val capped = Curation.maximalMatches(docs, $"text", $"doc_id", k = 5,
        maxOccur = 2)
      .orderBy("doc_a", "doc_b", "a_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(capped.toSeq == Seq((1L, 2L, 0, 1, 6), (4L, 4L, 0, 7, 5)))
  }

  test("domainStats: volume floor, pass-rate floor, and a passing host") {
    import org.apache.spark.sql.functions.col
    val pages = Seq(
      // good.com: 3 pages, 2 ok -> 666 pm, passes at floor 600
      ("good.com", true), ("good.com", true), ("good.com", false),
      // spam.net: 4 pages, 1 ok -> 250 pm, fails the rate floor
      ("spam.net", false), ("spam.net", false), ("spam.net", false),
      ("spam.net", true),
      // tiny.org: 2 perfect pages, fails the volume floor
      ("tiny.org", true), ("tiny.org", true)
    ).toDF("host", "ok")
    val out = Curation.domainStats(pages, col("host"), col("ok"),
        minDocs = 3, minOkPm = 600)
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("good.com", 3L, 2L, 666L, true),
      ("spam.net", 4L, 1L, 250L, false),
      ("tiny.org", 2L, 2L, 1000L, false)))
  }

  test("pairSimilarity: a zero-vector embedding has no direction — " +
    "its pair drops instead of raising under ANSI division") {
    // without the explicit zero-norm guard the 0/0 cosine raises
    // DIVIDE_BY_ZERO under ANSI (this engine's default) — one zero
    // embedding killing the whole job — and silently NULL-drops
    // non-ANSI; the guard makes the drop explicit in both modes
    val pairs = Seq(
      (1L, 0L, "cdn.ex/a.png", "a fine caption", 20, 20, 100),
      (2L, 0L, "cdn.ex/b.png", "another caption", 20, 20, 100))
      .toDF("doc_id", "ref_idx", "canonical_url", "caption",
        "width", "height", "mean_luma")
    val imgEmb = Seq(
      ("http://cdn.ex/a.png", Array(0.0f, 0.0f)), // zero vector
      ("http://cdn.ex/b.png", Array(1.0f, 0.0f)))
      .toDF("img_url", "embedding")
    val txtEmb = Seq(
      ("a fine caption", Array(1.0f, 0.0f)),
      ("another caption", Array(1.0f, 0.0f)))
      .toDF("caption", "embedding")
    val got = Curation.pairSimilarity(pairs, imgEmb, txtEmb,
        minCosine = 0.5)
      .select("doc_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((2L, 1.0)))
  }
}
