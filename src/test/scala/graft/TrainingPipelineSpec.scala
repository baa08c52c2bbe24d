package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The whole engine end to end, crawl bytes to trainer shards — every
  * seam built this round composed in one pass, the way a production
  * pipeline would run it:
  *
  *   WARC fixture → webDocuments (html_text) → PII redaction →
  *   exact dedup → BPE tokenize → sequence packing → tf.Example →
  *   TFRecord shards → read back + independent decode.
  *
  * Each stage is pinned in its own spec; this one proves the HANDOFFS:
  * schemas line up, determinism survives composition, and the final
  * shard content equals what the input implies. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val CRLF = "\r\n"

  private def rec(uri: String, body: String): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; " +
      s"charset=utf-8$CRLF$CRLF").getBytes("ISO-8859-1") ++ body.getBytes("UTF-8")
    val hdrs = Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:${uri.hashCode}>",
      "WARC-Date" -> "2026-03-04T05:06:07Z",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response",
      "Content-Length" -> http.length.toString)
    (("WARC/1.0" +: hdrs.map { case (k, v) => s"$k: $v" }).mkString(CRLF) +
      CRLF + CRLF).getBytes("ISO-8859-1") ++ http ++
      (CRLF + CRLF).getBytes("ISO-8859-1")
  }

  test("crawl bytes to trainer shards, every seam composed") {
    graft.functions.GraftFunctions.register(spark)
    val warcDir = Files.createTempDirectory("graft-e2e-warc")
    // four pages: two identical bodies (dedup must fold), one with an
    // email (redaction must mask it), one plain
    val page = "<html><body><p>the newest lowest rates</p></body></html>"
    Files.write(warcDir.resolve("seg.warc"),
      rec("http://a.example/1", page) ++
      rec("http://b.example/2", page) ++
      rec("http://c.example/3",
        "<p>write to billing@corp.example for the newest rates</p>") ++
      rec("http://d.example/4", "<p>the lowest newest widest rates</p>"))

    // 1. crawl → documents
    val docs = sources.WarcCorpus.webDocuments(
      sources.WarcCorpus.readWarc(spark, warcDir.toString).records)
    assert(docs.count() == 4)

    // 2. redact, then dedup on the REDACTED text (the streaming-proven
    // order: near-identical pages differing only in PII still fold)
    val redacted = docs.select(col("doc_id"), col("url"),
      ext.Curation.redactText(col("text")).as("text"))
    assert(redacted.where(col("text").contains("billing@corp.example"))
      .count() == 0)
    val keep = ext.Dedup.exact(redacted, col("text"), col("doc_id"))
      .select(col("keeper_doc_id").as("doc_id"))
    val unique = redacted.join(keep, "doc_id")
    assert(unique.count() == 3) // the twin pages folded to one

    // 3. tokenize: learn on the surviving corpus, encode it
    val model = ext.Bpe.learn(unique, col("text"), nMerges = 8)
    assert(model.merges.nonEmpty)
    val encoded = ext.Bpe.encode(unique, col("doc_id"), col("text"), model)
    // nothing out-of-vocabulary when encoding the training corpus itself
    assert(encoded.where(array_contains(col("input_ids"), -1L)).count() == 0)
    // the Unigram-LM tokenizer is a drop-in for the same seat: learn on
    // the surviving corpus, encode it, and the decode round-trips up to
    // encode's own normalization — both tokenizer families run the e2e
    val uni = ext.Unigram.learn(unique, col("text"), vocabSize = 200)
    val uniEnc = ext.Unigram.encode(unique, col("doc_id"), col("text"), uni)
    val uniBack = ext.Unigram.decode(uniEnc, col("doc_id"),
      col("input_ids"), uni)
    val norm = unique.select(col("doc_id"), regexp_replace(
      trim(lower(col("text"))), "\\s+", " ").as("expect"))
    assert(uniBack.join(norm, "doc_id")
      .where(col("text") =!= col("expect")).count() == 0)

    // WordPiece takes the same seat: a covering frequency vocabulary
    // (large enough for zero [UNK]s on this corpus) encodes the
    // survivors and decode round-trips identically
    val wpm = ext.WordPiece.fromCounts(unique, col("text"), vocabSize = 500)
    val wpEnc = ext.WordPiece.encode(unique, col("doc_id"), col("text"), wpm)
    val wpBack = ext.WordPiece.decode(wpEnc, col("doc_id"),
      col("input_ids"), wpm)
    assert(wpBack.join(norm, "doc_id")
      .where(col("text") =!= col("expect")).count() == 0)

    // 4. pack into fixed context windows
    val packed = ext.Packing.packSequences(encoded, col("doc_id"),
      col("n_tokens"), budget = 8)
    val packedRows = packed.collect()
    assert(packedRows.nonEmpty)

    // 4b. the epoch seat: the same token frame lays out per-epoch
    // trainer shards through the seeded permutation — same documents,
    // same stream length, shard order a pure function of the seed
    val ep = ext.Packing.epochLayout(encoded, col("doc_id"),
      col("n_tokens"), seed = "e2e-epoch0", budget = 8)
    val epRows = ep.collect()
    assert(epRows.map(_.getLong(0)).toSet ==
      packedRows.map(_.getLong(0)).toSet)
    assert(ep.agg(max("end_off")).collect()(0).getLong(0) ==
      packed.agg(max("end_off")).collect()(0).getLong(0))

    // 4c. materialize the windows the trainer actually loads: every
    // row exactly budget ids, token mass conserved end to end, only
    // the stream's final window padded — and the windows themselves
    // export/round-trip as tf.Examples (the true trainer tensor seam)
    val bins = ext.Packing.materializeBins(packed,
      encoded.select(col("doc_id"), col("input_ids")), budget = 8)
    val binRows = bins.orderBy("bin").collect()
    assert(binRows.nonEmpty)
    assert(binRows.forall(_.getSeq[Long](1).length == 8))
    assert(bins.agg(sum("n_tokens")).collect()(0).getLong(0) ==
      encoded.agg(sum("n_tokens")).collect()(0).getLong(0))
    assert(binRows.dropRight(1).forall(_.getLong(3) == 0L))
    val winDir = Files.createTempDirectory("graft-e2e-win").toString + "/w"
    val winPay = bins.select(concat(
      expr("tf_feat_i64('bin', array(bin))"),
      expr("tf_feat_i64('input_ids', input_ids)")).as("ex"))
    assert(sources.TfRecord.write(winPay, "ex", winDir) >= 1L)
    val wback = sources.TfRecord.read(spark, winDir)
    assert(wback.corrupt.count() == 0)
    assert(wback.records.count() == binRows.length.toLong)

    // 5. export: tf.Example payloads into TFRecord shards
    val outDir = Files.createTempDirectory("graft-e2e-out").toString + "/shards"
    val payloads = encoded.select(concat(
      expr("tf_feat_i64('doc_id', array(doc_id))"),
      expr("tf_feat_i64('input_ids', input_ids)")).as("ex"))
    assert(sources.TfRecord.write(payloads, "ex", outDir) == 3L)

    // 6. read back; independently decode lengths (varint count = token
    // count) and doc ids, compare against the pre-export frame
    val back = sources.TfRecord.read(spark, outDir)
    assert(back.corrupt.count() == 0)
    val expected = encoded.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.records.select("payload").collect().map { r =>
      val m = decodeExample(r.getAs[Array[Byte]](0))
      readPackedVarints(m("doc_id")).head -> readPackedVarints(m("input_ids")).length.toLong
    }.toMap
    assert(got == expected)
    CacheScope.release()
  }

  test("multimodal leg: crawl pages to (image bytes, caption) shards") {
    graft.functions.GraftFunctions.register(spark)
    val warcDir = Files.createTempDirectory("graft-e2e-img")
    // three pages, five img refs: a good absolute-path pair, an
    // under-dims thumbnail, a protocol-relative CDN pair, a dup URL
    // with an EMPTY caption, and a reference whose image the crawler
    // never fetched
    Files.write(warcDir.resolve("seg.warc"),
      rec("http://a.example/page1",
        "<p>intro</p><img src=\"/img/cat.png\" alt=\"a striped cat\">" +
          "<img src=\"tiny.png\" alt=\"too small\">") ++
      rec("http://b.example/page2",
        "<img src=\"//cdn.other.example/dog.png\" alt=\"a good dog\">" +
          "<img src=\"http://a.example/img/cat.png\" alt=\"\">") ++
      rec("http://c.example/page3",
        "<img src=\"/missing.png\" alt=\"this one was never fetched\">" +
          "<img src=\"//cdn.other.example/dog.png\"" +
          " alt=\"unrelated caption here\">"))
    // crawl → RAW pages (the markup-level sibling of webDocuments)
    val pages = sources.WarcCorpus.webPages(
      sources.WarcCorpus.readWarc(spark, warcDir.toString).records)
    val refs = ext.Curation.imageRefs(pages,
      col("doc_id"), col("html"), col("url"))
    assert(refs.count() == 6)
    // the fetched-image corpus: three real PNGs through the real
    // pixel decode; tiny.png sits under the dims floor
    val fetched = Seq(
      ("http://a.example/img/cat.png", 20, 16),
      ("http://cdn.other.example/dog.png", 24, 18),
      ("http://a.example/tiny.png", 8, 8))
    val media = fetched.zipWithIndex.map { case ((u, w, h), i) =>
      (i.toLong, u, ext.Multimodal.synthPngPayloadSized(i.toLong, w, h)) }
    val pix = ext.Multimodal.pixelsBatched(
      media.map { case (id, _, p) =>
        ext.Multimodal.MediaRow(id, p, "image/png") }.toDS()).toDF()
    val images = pix
      .join(media.map { case (id, u, _) => (id, u) }
        .toDF("media_id", "img_url"), "media_id")
      .select(col("img_url"), col("width"), col("height"),
        col("mean_luma"))
    // a fetch-log VARIANT of the cat image (www + tracking param, same
    // canonical) — imagePairs must collapse it, not duplicate the pair
    val imagesWithVariant = images.union(
      Seq(("http://www.a.example/img/cat.png?utm_source=x", 20, 16, 255))
        .toDF("img_url", "width", "height", "mean_luma"))
    val pairs = ext.Curation.imagePairs(refs, imagesWithVariant,
      minW = 10, minH = 10, minCaptionChars = 5)
    // floor survivors: the cat (page 1), the dog (page 2), and page
    // 3's mis-captioned dog reference; the thumbnail fails dims, the
    // dup-URL ref fails the caption floor, the unfetched ref drops
    // through the inner join, and the cat's raw-URL variant collapsed
    // instead of duplicating
    assert(pairs.count() == 3)
    val got = pairs.select("canonical_url", "caption").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("a.example/img/cat.png", "a striped cat"),
      ("cdn.other.example/dog.png", "a good dog"),
      ("cdn.other.example/dog.png", "unrelated caption here")))
    // the LAION similarity gate (the semantic filter the floors
    // cannot provide): image/caption embeddings where the two true
    // pairs align and page 3's mis-caption is orthogonal to its image
    // — the gate must drop exactly that one. The image side rides a
    // RAW fetch-log URL variant to prove the gate canonicalizes too.
    val imgEmb = Seq(
      ("http://www.a.example/img/cat.png?utm_source=x",
        Array(1.0f, 0.1f)),
      ("http://cdn.other.example/dog.png", Array(0.6f, 0.8f)),
      ("http://a.example/tiny.png", Array(1.0f, 1.0f)))
      .toDF("img_url", "embedding")
    val txtEmb = Seq(
      ("a striped cat", Array(1.0f, 0.0f)),
      ("a good dog", Array(0.6f, 0.8f)),
      ("unrelated caption here", Array(-0.8f, 0.6f)),
      ("too small", Array(1.0f, 0.0f)))
      .toDF("caption", "embedding")
    val gated = ext.Curation.pairSimilarity(pairs, imgEmb, txtEmb,
      minCosine = 0.5)
    val sims = gated.collect()
      .map(r => (r.getAs[String]("caption"), r.getAs[Double]("sim")))
      .toMap
    assert(sims === Map("a striped cat" -> 0.995037,
      "a good dog" -> 1.0))
    // export: one WebDataset sample per GATED pair — image bytes
    // beside the caption under one key, the loader contract of the
    // multimodal trainers — and round-trip the shard
    val payloads = media.map { case (_, u, p) => (u, p) }
      .toDF("img_url", "png")
      .select(ext.Curation.canonicalUrl(col("img_url"))
        .as("canonical_url"), col("png"))
    val samples = gated.join(payloads, "canonical_url")
      .select(concat_ws("-", col("doc_id"), col("ref_idx")).as("key"),
        array(
          struct(lit("png").as("ext"), col("png").as("data")),
          struct(lit("txt").as("ext"),
            encode(col("caption"), "UTF-8").as("data"))).as("parts"))
    val outDir = Files.createTempDirectory("graft-e2e-wds").toString + "/sh"
    val shards = sources.WebDataset.write(
      samples.repartition(1), "key", "parts", outDir)
    assert(shards.map(_.records).sum == 2L)
    val back = sources.WebDataset.read(spark, outDir)
    assert(back.corrupt.count() == 0)
    val caps = back.samples.select("parts").collect()
      .map(_.getMap[String, Array[Byte]](0))
      .map(m => (new String(m("txt"), "UTF-8"), m("png").toSeq)).toSet
    // each caption came back beside ITS OWN image's exact bytes — a
    // swapped pairing (cat caption on dog bytes) must fail
    val pngByUrl = media.map { case (_, u, p) => u -> p.toSeq }.toMap
    assert(caps === Set(
      ("a striped cat", pngByUrl("http://a.example/img/cat.png")),
      ("a good dog", pngByUrl("http://cdn.other.example/dog.png"))))
    CacheScope.release()
  }

  test("SFT leg: conversations gate, flatten, and feed the tokenizer/packer") {
    graft.functions.GraftFunctions.register(spark)
    val clean =
      """[{"role":"system","content":"be brief"},""" +
        """{"role":"user","content":"hi there"},""" +
        """{"role":"assistant","content":"hello"}]"""
    val doubled = """[{"role":"user","content":"a"},""" +
      """{"role":"user","content":"b"}]"""
    val convs = Seq((1L, clean), (2L, doubled), (3L, clean.dropRight(2)))
      .toDF("doc_id", "conv")

    // 1. gate: quarantined and structurally-broken conversations drop
    val st = ext.Chat.stats(convs, col("conv"), col("doc_id"))
    val keep = st.where(col("parse_ok") && col("alternation_ok"))
      .select("doc_id")
    assert(keep.collect().map(_.getLong(0)).toSeq == Seq(1L))

    // 2. flatten with the template the tokenizer will see
    val flat = ext.Chat.render(convs, col("conv"), col("doc_id"))
      .join(keep, "doc_id")

    // 3. the loss-mask spans address that exact text
    val spans = ext.Chat.assistantSpans(convs, col("conv"), col("doc_id"))
      .join(keep, "doc_id").collect()
      .map(r => (r.getLong(2).toInt, r.getLong(3).toInt))
    val rendered = flat.collect().head.getString(1)
    assert(spans.map { case (s, e) => rendered.substring(s, e) }.toSeq
      == Seq("hello"))

    // 4. tokenize + pack the flattened conversations — the same seats
    // the document corpus uses, no chat-specific forks downstream
    val model = ext.Bpe.learn(flat, col("text"), nMerges = 4)
    val enc = ext.Bpe.encode(flat, col("doc_id"), col("text"), model)
    assert(enc.where(array_contains(col("input_ids"), -1L)).count() == 0)
    val packed = ext.Packing.packSequences(enc, col("doc_id"),
      col("n_tokens"), budget = 64)
    assert(packed.count() >= 1)
    CacheScope.release()
  }

  test("selection triad wiring: NB and DSIR scores drive score-proportional sampling") {
    import spark.implicits._
    // good reference = fluent "english"; crawl = a mix of good-typical,
    // bad-typical, and neutral docs. Train the classifier on the two
    // slices, score the crawl, map log-odds bits into a ppm keep rate
    // (clamped affine — proportional in the middle, saturating at the
    // ends), and thin with Sampling.weighted: the published gate shape.
    val good = Seq((0L, "the quick brown fox jumps the lazy dog")).toDF("id", "text")
    val bad = Seq((1L, "zz qq xx vv kk zz qq xx")).toDF("id", "text")
    val crawl = Seq(
      (10L, "the quick brown fox"), // good-typical -> rate saturates high
      (11L, "zz qq xx vv"),         // bad-typical  -> rate saturates low
      (12L, "jumps kk lazy kk")     // mixed        -> hash-decided
    ).toDF("doc_id", "text")
    // hand arithmetic: nb_bits(10) = +5, nb_bits(11) = -7; the affine
    // map saturates both ends (1e6-clamped high, 0-clamped low)
    val rate = lit(500000L) + col("nb_bits") * 600000L
    val nb = ext.TextAnalysis.nbScore(crawl, col("text"), col("doc_id"),
      ext.TextAnalysis.nbTrain(good, bad, col("text")))
    val kept = ext.Sampling.weighted(nb, col("doc_id"), rate)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(10L) && !kept.contains(11L))
    // DSIR takes the same seat: importance bits -> ppm rate -> weighted
    // (dsir_bits(10) = +1 from the doubled target "the"; (11) = -7)
    val dsir = ext.TextAnalysis.dsirWeights(good.toDF("doc_id", "text"),
      crawl, col("text"), col("doc_id"))
    val resampled = ext.Sampling.weighted(dsir, col("doc_id"),
        (lit(500000L) + col("dsir_bits") * 600000L), seed = "dsir0")
      .select("doc_id").as[Long].collect().toSet
    assert(resampled.contains(10L) && !resampled.contains(11L))
    // the whole composition is deterministic under repartitioning
    val again = ext.Sampling.weighted(
        ext.TextAnalysis.nbScore(crawl.repartition(4), col("text"),
          col("doc_id"),
          ext.TextAnalysis.nbTrain(good.repartition(2), bad, col("text"))),
        col("doc_id"), rate)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("day two: url + content incremental dedup against history, manifest export") {
    graft.functions.GraftFunctions.register(spark)

    // Day 1 (the accumulated corpus): three distinct pages.
    val day1Dir = Files.createTempDirectory("graft-e2e-d1")
    Files.write(day1Dir.resolve("seg.warc"),
      rec("http://a.example/page", "<p>the newest lowest rates</p>") ++
      rec("http://c.example/contact", "<p>write for the newest rates</p>") ++
      rec("http://d.example/4", "<p>the lowest newest widest rates</p>"))
    val history = sources.WarcCorpus.webDocuments(
      sources.WarcCorpus.readWarc(spark, day1Dir.toString).records)
      .select(col("doc_id"), col("url"), col("text"))

    // Day 2: a re-crawl of page a under a tracking URL, a NEW url whose
    // body duplicates day-1 content, and one genuinely new page.
    val day2Dir = Files.createTempDirectory("graft-e2e-d2")
    Files.write(day2Dir.resolve("seg.warc"),
      rec("https://www.a.example/page?utm_source=feed",
        "<p>the newest lowest rates (v2)</p>") ++
      rec("http://m.example/mirror", "<p>the lowest newest widest rates</p>") ++
      rec("http://n.example/fresh", "<p>entirely fresh reporting</p>"))
    val day2 = sources.WarcCorpus.webDocuments(
      sources.WarcCorpus.readWarc(spark, day2Dir.toString).records)
      .select(col("doc_id"), col("url"), col("text"))

    // Streaming-tier tag on CONTENT: the body dup is flagged, the
    // fresh page is not (tag, never drop).
    val bloom = ext.Dedup.historyFilter(history, col("text"), 1000)
    val tags = ext.Dedup.tagAgainstHistory(day2, col("text"), bloom)
      .select("url", "maybe_in_history").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(tags("http://m.example/mirror"))
    assert(!tags("http://n.example/fresh"))

    // Batch tier 1 — URL identity: "already crawled" drops the utm
    // re-crawl even though its BODY changed (the crawl-frontier rule).
    val newUrls = ext.Dedup.newAgainst(history, day2,
      ext.Curation.canonicalUrl(col("url")), col("doc_id"), 1000)
      .select(col("doc_id"))
    val urlSurvivors = day2.join(newUrls, "doc_id")
    assert(urlSurvivors.select("url").as[String].collect().toSet ==
      Set("http://m.example/mirror", "http://n.example/fresh"))

    // Batch tier 2 — content identity: the mirrored body folds.
    val fresh = ext.Dedup.newAgainst(history, urlSurvivors,
      col("text"), col("doc_id"), 1000)
    val freshDocs = urlSurvivors.join(fresh.select("doc_id"), "doc_id")
    assert(freshDocs.select("url").as[String].collect().toSeq ==
      Seq("http://n.example/fresh"))

    // Export the day's novelty with its dataset card.
    val outDir = Files.createTempDirectory("graft-e2e-d2out").toString + "/shards"
    val payloads = freshDocs.coalesce(1).select(
      expr("tf_feat_bytes('text', CAST(text AS BINARY))").as("ex"))
    val shards = sources.TfRecord.writeWithManifest(payloads, "ex", outDir)
    assert(shards.map(_.records).sum == 1L)
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "_MANIFEST.json")), "UTF-8")
    assert(manifest.contains("\"records\":1"), manifest)

    // Same novelty as a WebDataset shard (the multimodal trainer
    // handoff): one sample, text + url-metadata parts, independently
    // decoded from the raw tar bytes.
    val wdsDir = Files.createTempDirectory("graft-e2e-wds").toString + "/shards"
    val wdsSamples = freshDocs.coalesce(1).select(
      format_string("%06d", pmod(col("doc_id"), lit(1000000))).as("key"),
      array(
        struct(lit("txt").as("ext"), col("text").cast("binary").as("data")),
        struct(lit("url.txt").as("ext"), col("url").cast("binary").as("data"))
      ).as("parts"))
    val wds = sources.WebDataset.writeWithManifest(wdsSamples, "key", "parts", wdsDir)
    assert(wds.map(_.records).sum == 1L)
    val tarBytes = Files.readAllBytes(
      java.nio.file.Paths.get(wdsDir, wds.head.file))
    val Right(entries) = sources.WebDataset.decodeEntries(tarBytes)
    assert(entries.map(_._1).forall(_.endsWith(".txt")))
    assert(entries.exists { case (n, d) =>
      n.endsWith(".url.txt") && new String(d, "UTF-8") == "http://n.example/fresh" })
    CacheScope.release()
  }

  // independent minimal protobuf walk (same approach as TfExampleSpec,
  // reduced to name → list-payload)
  private def decodeExample(b: Array[Byte]): Map[String, Array[Byte]] = {
    var out = Map.empty[String, Array[Byte]]
    def varintAt(i: Int): (Long, Int) = {
      var v = 0L; var s = 0; var j = i
      while ({ val x = b(j) & 0xff; j += 1; v |= (x & 0x7fL) << s; s += 7
               (x & 0x80) != 0 }) ()
      (v, j)
    }
    def walk(from: Int, to: Int, depth: Int, name: String): Unit = {
      var i = from
      while (i < to) {
        val (tag, afterTag) = varintAt(i)
        val (len, afterLen) = varintAt(afterTag)
        val body = afterLen
        val end = body + len.toInt
        depth match {
          case 0 | 1 => walk(body, end, depth + 1, name) // Example/Features
          case 2 => // map entry: key(1) then Feature(2)
            if ((tag >>> 3) == 1)
              walk(end, to, depth, new String(b, body, len.toInt, "UTF-8"))
            else walk(body, end, 3, name)
            return
          case 3 => walk(body, end, 4, name) // Feature oneof → *List
          case 4 => out += name -> java.util.Arrays.copyOfRange(b, body, end)
        }
        i = end
      }
    }
    walk(0, b.length, 0, null)
    out
  }

  private def readPackedVarints(p: Array[Byte]): Seq[Long] = {
    var i = 0
    val out = Seq.newBuilder[Long]
    while (i < p.length) {
      var v = 0L; var s = 0
      while ({ val x = p(i) & 0xff; i += 1; v |= (x & 0x7fL) << s; s += 7
               (x & 0x80) != 0 }) ()
      out += v
    }
    out.result()
  }
}
