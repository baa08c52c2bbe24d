package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The curation passes are plain narrow/stateful-safe DataFrame
  * transforms, so they compose into Structured Streaming unchanged:
  * a continuously-fed corpus can be PII-masked per micro-batch
  * (stateless narrow map) and exact-deduped on the REDACTED content
  * (watermark-bounded state) in one query — the shape a live ingestion
  * pipeline runs before the heavier batch passes. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("redact-then-dedup composes in one streaming query") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val feed = input.toDF().toDF("doc_id", "ms", "text")
      .withColumn("event_time", timestamp_millis(col("ms")))
    val redacted = feed
      .withColumn("redacted", Curation.redactText(col("text")))
    val q = Dedup.streamingExact(redacted, col("redacted"), col("doc_id"),
        col("event_time"), "10 minutes")
      .writeStream.format("memory").queryName("scur")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L, "write to a@x.io now"))
      q.processAllAvailable()
      // doc 2 differs from doc 1 only by the email address — after
      // redaction the content is identical, so the dedup drops it;
      // doc 3 is genuinely new and passes
      input.addData((2L, 2000L, "write to b@y.io now"),
        (3L, 3000L, "call 555-123-4567 instead"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, content_hash FROM scur")
        .collect().map(r => r.getLong(0))
      assert(got.sorted.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("crawl-frontier dedup: first fetch per canonical url wins, live") {
    implicit val sq = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[(Long, Long, String)]
    val feed = input.toDF().toDF("doc_id", "ms", "url")
      .withColumn("event_time", timestamp_millis(col("ms")))
      // normalizeText first: a frontier feed mixes encodings; then the
      // canonical key — both stateless zero-shuffle projections
      .withColumn("curl",
        Curation.canonicalUrl(Curation.normalizeText(col("url"))))
    val q = feed
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("curl")
      .writeStream.format("memory").queryName("sfrontier")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L, "https://www.example.com/page?x=1"))
      q.processAllAvailable()
      // cosmetic re-discoveries of the same page are dropped; a truly
      // different page passes
      input.addData(
        (2L, 2000L, "http://example.com/page/?x=1&utm_source=tw"),
        (3L, 3000L, "https://example.com:443/page?x=1#sec"),
        (4L, 4000L, "https://example.com/other"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sfrontier")
        .as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 4L))
    } finally q.stop()
  }

  test("lm3 gate: a live stream scores against the stored trigram model, stateless per batch") {
    implicit val sq = spark.sqlContext
    // train once, materialize the artifact (the writeLm3Model boundary:
    // the scoring side never touches the training corpus again)
    val train = Seq((0L, "a b c a b d a b c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm3m").toString
    TextAnalysis.writeLm3Model(train, $"text", $"doc_id", dir)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= TextAnalysis
            .lm3ScoreStored(batch, col("text"), col("doc_id"), dir)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }.start()
    try {
      input.addData((10L, "a b c"), (11L, "a b x"))
      q.processAllAvailable()
      input.addData((12L, "z z z"))
      q.processAllAvailable()
    } finally q.stop()
    // batch truth: the identical docs through the two-frame lm3Score
    val scored = Seq((10L, "a b c"), (11L, "a b x"), (12L, "z z z"))
      .toDF("doc_id", "text")
    val expect = TextAnalysis.lm3Score(train, scored, $"text", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // the gate is stateless per batch: replaying a batch re-scores
    // identically (no state advanced by the first pass)
    val replay = TextAnalysis
      .lm3ScoreStored(Seq((10L, "a b c")).toDF("doc_id", "text"),
        col("text"), col("doc_id"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(replay.toSeq == got.sortBy(_._1).take(1).toSeq)
  }

  test("bpe gate: a live stream tokenizes with the stored model, stateless per batch") {
    implicit val sq = spark.sqlContext
    // train once, persist the tokenizer (the writeModel boundary) —
    // the streaming side never sees the training corpus or the
    // in-memory Model, only the artifact path
    val train = Seq((0L, "low low low lower newest newest widest"))
      .toDF("doc_id", "text")
    val model = Bpe.learn(train, $"text", nMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpes").toString
    Bpe.writeModel(spark, model, dir)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= Bpe.encodeStored(batch, col("doc_id"), col("text"), dir)
            .collect()
            .map(r => (r.getLong(0),
              r.getSeq[Long](r.fieldIndex("input_ids")).toSeq))
        }
        ()
      }.start()
    try {
      input.addData((10L, "low lowest"), (11L, "newest quiz"))
      q.processAllAvailable()
      input.addData((12L, "widest 低"))
      q.processAllAvailable()
    } finally q.stop()
    // batch truth: the identical docs through encode with the live model
    val scored = Seq((10L, "low lowest"), (11L, "newest quiz"),
      (12L, "widest 低")).toDF("doc_id", "text")
    val expect = Bpe.encode(scored, $"doc_id", $"text", model)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](r.fieldIndex("input_ids")).toSeq))
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // stateless per batch: a replayed batch re-tokenizes identically
    val replay = Bpe.encodeStored(
        Seq((10L, "low lowest")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), dir)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](r.fieldIndex("input_ids")).toSeq))
    assert(replay.toSeq == got.sortBy(_._1).take(1).toSeq)
  }

  test("unigram/wordpiece gates: live micro-batches score against the stored artifacts") {
    implicit val sq = spark.sqlContext
    // one train corpus, BOTH remaining tokenizer families' artifacts —
    // the streaming side sees only the paths (bpe gate's shape)
    val train = Seq((0L, "ab ab ab abc abc xyz"))
      .toDF("doc_id", "text")
    val um = Unigram.learn(train, $"text", vocabSize = 8)
    val wm = WordPiece.fromCounts(train, $"text", vocabSize = 8)
    val udir = java.nio.file.Files.createTempDirectory("unis").toString
    val wdir = java.nio.file.Files.createTempDirectory("wps").toString
    Unigram.writeModel(spark, um, udir)
    WordPiece.writeModel(spark, wm, wdir)
    val input = MemoryStream[(Long, String)]
    val gotU = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val gotW = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0),
        r.getSeq[Long](r.fieldIndex("input_ids")).toSeq))
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        gotU.synchronized {
          gotU ++= ids(Unigram.encodeStored(batch, col("doc_id"),
            col("text"), udir))
          gotW ++= ids(WordPiece.encodeStored(batch, col("doc_id"),
            col("text"), wdir))
        }
        ()
      }.start()
    try {
      input.addData((10L, "ab abc"), (11L, "xyz 低"))
      q.processAllAvailable()
      input.addData((12L, "abcabc zq"))
      q.processAllAvailable()
    } finally q.stop()
    val scored = Seq((10L, "ab abc"), (11L, "xyz 低"), (12L, "abcabc zq"))
      .toDF("doc_id", "text")
    assert(gotU.sortBy(_._1).toSeq ==
      ids(Unigram.encode(scored, $"doc_id", $"text", um)).sortBy(_._1).toSeq)
    assert(gotW.sortBy(_._1).toSeq ==
      ids(WordPiece.encode(scored, $"doc_id", $"text", wm)).sortBy(_._1).toSeq)
  }

  test("nb gate: the stored classifier scores live micro-batches statelessly") {
    implicit val sq = spark.sqlContext
    // train once, store the model frame (it carries its own smoothing
    // stamps), gate a live crawl stream through nbScore per batch
    val model = TextAnalysis.nbTrain(
      Seq((0L, "good fluent text here")).toDF("id", "text"),
      Seq((1L, "zz qq zz qq")).toDF("id", "text"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("nbm").toString
    model.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= TextAnalysis.nbScore(batch, col("text"), col("doc_id"),
              stored)
            .collect().map(r => (r.getLong(0), r.getLong(4)))
        }
        ()
      }.start()
    try {
      input.addData((10L, "good fluent text"), (11L, "zz qq zz"))
      q.processAllAvailable()
      input.addData((12L, "fluent good zz"))
      q.processAllAvailable()
    } finally q.stop()
    // batch truth through the same stored model
    val expect = TextAnalysis.nbScore(
        Seq((10L, "good fluent text"), (11L, "zz qq zz"),
          (12L, "fluent good zz")).toDF("doc_id", "text"),
        col("text"), col("doc_id"), stored)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // and the gate discriminates: good-typical above bad-typical
    val m = got.toMap
    assert(m(10L) > 0 && m(11L) < 0)
  }

  test("dsir resampling seat: stored importance model gates live batches score-then-sample") {
    implicit val sq = spark.sqlContext
    // fit BOTH distributions once (target sample + raw-crawl sample),
    // freeze the artifact, then run the full published gate per
    // micro-batch: dsir_bits -> affine ppm rate -> Sampling.weighted
    val target = Seq((0L, "the quick brown fox jumps the lazy dog"))
      .toDF("doc_id", "text")
    val crawl = Seq(
      (10L, "the quick brown fox"), // target-typical -> keep
      (11L, "zz qq xx vv"),         // raw-typical    -> drop
      (12L, "jumps kk lazy kk")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dsirm").toString
    TextAnalysis.writeDsirModel(target, crawl, $"text", $"doc_id", dir)
    val input = MemoryStream[(Long, String)]
    val gotScores = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val gotKept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val scored = TextAnalysis.dsirScoreStored(batch, col("text"),
          col("doc_id"), dir)
        val kept = Sampling.weighted(scored, col("doc_id"),
          lit(500000L) + col("dsir_bits") * 600000L, seed = "dsir0")
        gotScores.synchronized {
          gotScores ++= scored.collect().map(r => (r.getLong(0), r.getLong(3)))
          gotKept ++= kept.select("doc_id").as[Long].collect()
        }
        ()
      }.start()
    try {
      input.addData((10L, "the quick brown fox"), (11L, "zz qq xx vv"))
      q.processAllAvailable()
      input.addData((12L, "jumps kk lazy kk"))
      q.processAllAvailable()
    } finally q.stop()
    // batch truth: the two-frame dsirWeights over the same corpora
    // restricted to the streamed ids — the stored artifact must price
    // identically
    val expect = TextAnalysis.dsirWeights(target, crawl, $"text", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(gotScores.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // the sampling decision matches the batch composition and
    // discriminates the saturating ends
    val expectKept = Sampling.weighted(
        TextAnalysis.dsirWeights(target, crawl, $"text", $"doc_id"),
        col("doc_id"), lit(500000L) + col("dsir_bits") * 600000L,
        seed = "dsir0")
      .select("doc_id").as[Long].collect().toSet
    assert(gotKept.toSet == expectKept)
    assert(gotKept.contains(10L) && !gotKept.contains(11L))
    // stateless per batch: replaying one batch re-scores and re-decides
    // identically (nothing advanced by the first pass)
    val replay = TextAnalysis.dsirScoreStored(
        Seq((10L, "the quick brown fox")).toDF("doc_id", "text"),
        col("text"), col("doc_id"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(replay.toSeq == gotScores.sortBy(_._1).take(1).toSeq)
  }

  test("chunking composes in a streaming query (pure narrow projection, live)") {
    // chunkByWords is a stateless narrow projection, so a live feed can
    // be window-split per micro-batch — the context-window splitter
    // running where the documents arrive, no batch re-pass
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Curation.chunkByWords(input.toDF().toDF("doc_id", "text"),
        col("text"), col("doc_id"), sizeWords = 3, strideWords = 2)
      .writeStream.format("memory").queryName("schunk")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b c d e"), (2L, ""))
      q.processAllAvailable()
      input.addData((3L, "x y"))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM schunk ORDER BY doc_id, chunk_idx")
        .as[(Long, Int, String, Int)].collect().toSeq
      // doc 1: 5 words, size 3 stride 2 -> nc = 1 + ceil(2/2) = 2
      assert(got == Seq(
        (1L, 0, "a b c", 3), (1L, 1, "c d e", 3), (3L, 0, "x y", 2)))
    } finally q.stop()
  }

  test("quality gate composes live: c4-clean then gopher-rules per micro-batch") {
    // both passes are stateless narrow projections, so the standard
    // crawl triage (clean lines -> drop bad pages -> score what's
    // left) runs where the pages arrive, no batch re-pass; the
    // page_ok/n_kept filter also keeps zero-word pages away from
    // gopherRules' ANSI division contract
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cleaned = Curation.c4Clean(input.toDF().toDF("doc_id", "text"),
      col("text"), col("doc_id"), minWords = 3)
    val gated = TextAnalysis.gopherRules(
      cleaned.where(col("page_ok") && col("n_kept") > 0),
      col("clean_text"), col("doc_id"))
    val q = gated.select("doc_id", "n_words", "stop_hits")
      .writeStream.format("memory").queryName("sgate")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the and good line here today.\nno terminal so dropped"),
        (2L, "has lorem ipsum somewhere.\nfine line here."))
      q.processAllAvailable()
      input.addData((3L, "one two three.\nfour five six."))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sgate ORDER BY doc_id")
        .as[(Long, Int, Int)].collect().toSeq
      // doc 2's lorem-ipsum page never reaches the scorer; doc 1 keeps
      // its one terminal line (6 words, stop words {the, and}); doc 3
      // keeps both lines (6 words, no stop words)
      assert(got == Seq((1L, 6, 2), (3L, 6, 0)))
    } finally q.stop()
  }

  test("SFT gate composes live: chat stats validate micro-batches statelessly") {
    // Chat.stats is a pure projection, so the conversation gate (parse
    // + alternation) runs per micro-batch with no state store — the
    // same stateless-gate contract as the lm3/nb/dsir seats
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Chat.stats(input.toDF().toDF("doc_id", "conv"),
        col("conv"), col("doc_id"))
      .select("doc_id", "parse_ok", "alternation_ok")
      .writeStream.format("memory").queryName("chatgate")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, """[{"role":"user","content":"q"},""" +
          """{"role":"assistant","content":"a"}]"""),
        (2L, """[{"role":"user","content":"q"},""" +
          """{"role":"user","content":"q2"}]"""))
      q.processAllAvailable()
      input.addData((3L, "truncated ["))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT doc_id, parse_ok, alternation_ok FROM chatgate ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getBoolean(2)))
      assert(got.toSeq == Seq(
        (1L, true, true), (2L, true, false), (3L, false, null)))
    } finally q.stop()
  }

  test("secrets scrub composes live: scrubSecrets stacks on redactText per batch") {
    // the factored Column helpers make the full pre-release scrub
    // (PII + credentials) one stateless projection over a live feed
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        Curation.scrubSecrets(Curation.redactText(col("text"))).as("clean"))
      .writeStream.format("memory").queryName("sscrub")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "mail a@b.co key AKIA" + "0123456789ABCDEF" + " now"),
        (2L, "password: hunter22 from 10.0.0.1"))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sscrub ORDER BY doc_id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq(
        (1L, "mail <EMAIL> key <SECRET> now"),
        (2L, "password: <SECRET> from <IP>")))
    } finally q.stop()
  }

  test("code gate composes live: codeQuality drops blobs per micro-batch") {
    // the code battery is a stateless narrow projection like the prose
    // gates, so the repo-crawl triage runs where the files arrive
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gated = TextAnalysis.codeQuality(
        input.toDF().toDF("doc_id", "text"), col("text"), col("doc_id"))
      .where(col("code_ok"))
    val q = gated.select("doc_id", "n_lines")
      .writeStream.format("memory").queryName("scode")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "val a = 1;\n// sum\nval b = a + a;"),
        (2L, "h=\"" + "deadBEEF" * 4 + "\";"))            // blob: dropped
      q.processAllAvailable()
      input.addData((3L, "x=\"" + "y" * 1200 + "\";"))    // long line: dropped
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM scode ORDER BY doc_id")
        .as[(Long, Int)].collect().toSeq
      assert(got == Seq((1L, 3)))
    } finally q.stop()
  }

  test("image-text pairs: live crawl feed gates on similarity and " +
    "appends pair history replay-safe") {
    // VERDICT r18 #6 + the r20 similarity gate — zero new operator
    // code; the proof is the composition: WARC segments stream in,
    // each micro-batch runs webPages → imageRefs → imagePairs against
    // the fetched-image corpus, the LAION similarity gate
    // (pairSimilarity against the static embedding corpora) drops the
    // mis-captioned pair, and the survivors' canonical-url hashes
    // append into the replay-safe code store (appendCodes' marker +
    // id-level anti join). A url re-paired in a later batch must not
    // duplicate, and a redelivered batch must no-op on its marker.
    val CRLF = "\r\n"
    def rec(uri: String, body: String): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; " +
        s"charset=utf-8$CRLF$CRLF").getBytes("ISO-8859-1") ++
        body.getBytes("UTF-8")
      val hdrs = Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:${uri.hashCode}>",
        "WARC-Date" -> "2026-03-04T05:06:07Z",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response",
        "Content-Length" -> http.length.toString)
      (("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" })
        .mkString(CRLF) + CRLF + CRLF).getBytes("ISO-8859-1") ++ http ++
        (CRLF + CRLF).getBytes("ISO-8859-1")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-imgstream")
    val store = java.nio.file.Files.createTempDirectory("graft-pairst")
      .toString + "/st"
    java.nio.file.Files.write(dir.resolve("seg-0.warc"),
      rec("http://a.example/p1",
        "<img src=\"/a.png\" alt=\"a striped cat\">") ++
      rec("http://b.example/p2",
        "<img src=\"//cdn.other.example/b.png\" alt=\"a good dog\">"))
    // the fetched-image corpus (dims already decoded) — static side
    val images = Seq(
      ("http://a.example/a.png", 20, 16, 100),
      ("http://cdn.other.example/b.png", 24, 18, 90),
      ("http://c.example/c.png", 32, 20, 80))
      .toDF("img_url", "width", "height", "mean_luma")
    // static embedding corpora for the gate: b.png is orthogonal to
    // its own caption (the mis-captioned crawl pair), so the gate
    // must hold it out of the store from the first batch on
    val imgEmb = Seq(
      ("http://a.example/a.png", Array(1.0f, 0.0f)),
      ("http://cdn.other.example/b.png", Array(0.0f, 1.0f)),
      ("http://c.example/c.png", Array(1.0f, 0.0f)))
      .toDF("img_url", "embedding")
    val txtEmb = Seq(
      ("a striped cat", Array(1.0f, 0.0f)),
      ("a good dog", Array(1.0f, 0.0f)),
      ("same cat again", Array(1.0f, 0.0f)),
      ("a third image", Array(1.0f, 0.0f)))
      .toDF("caption", "embedding")
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def urlCodes(pairs: org.apache.spark.sql.DataFrame) =
      pairs.select(Text.hash60(col("canonical_url")).as("vec_id"))
        .distinct()
        .withColumn("b_hi", expr("vec_id >> 32"))
        .withColumn("b_lo", expr("vec_id & 4294967295"))
    val stream = spark.readStream.format("binaryFile")
      .schema(spark.read.format("binaryFile").load(dir.toString).schema)
      .option("pathGlobFilter", "*.warc*")
      .load(dir.toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        graft.sources.WarcCorpus.parseRecords(p, bytes) }
      .toDF()
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val pages = graft.sources.WarcCorpus.webPages(batch)
        val pairs = Curation.imagePairs(
          Curation.imageRefs(pages, col("doc_id"), col("html"),
            col("url")),
          images, minW = 10, minH = 10, minCaptionChars = 5)
        val gated = Curation.pairSimilarity(pairs, imgEmb, txtEmb,
          minCosine = 0.5)
        seenBatches.synchronized { seenBatches += bid }
        Similarity.appendCodes(urlCodes(gated), store, bid)
        ()
      }.start()
    try {
      q.processAllAvailable()
      // batch 1 held the mis-captioned dog pair out at the gate
      assert(spark.read.parquet(s"$store/codes").count() === 1)
      // batch 2: a new page RE-references a.png (id-level dedup must
      // hold it out) and adds the fresh c.png pair
      java.nio.file.Files.write(dir.resolve("seg-1.warc"),
        rec("http://d.example/p3",
          "<img src=\"http://a.example/a.png\" alt=\"same cat again\">" +
            "<img src=\"http://c.example/c.png\" alt=\"a third image\">"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$store/codes").count() === 2)
    } finally q.stop()
    // replay: the second batch redelivered under its original batchId
    // no-ops on the root-level marker — store unchanged
    val replayPairs = Seq(("a.example/a.png", ""), ("c.example/c.png", ""))
      .toDF("canonical_url", "x")
    assert(!Similarity.appendCodes(urlCodes(replayPairs), store,
      seenBatches.max))
    assert(spark.read.parquet(s"$store/codes").count() === 2)
    // ... but the same pairs under a NEW batchId still add nothing —
    // the id-level anti join settles redelivery with fresh numbering
    assert(Similarity.appendCodes(urlCodes(replayPairs), store,
      seenBatches.max + 100L))
    assert(spark.read.parquet(s"$store/codes").count() === 2)
  }
}
