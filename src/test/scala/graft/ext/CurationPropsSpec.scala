package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based invariants for the curation rewrites, over random
  * corpora drawn from a tiny vocabulary (which makes cross-document
  * collisions — the interesting case — common). Spark-backed
  * properties run a handful of cases each (every case is a full job);
  * the pure-expression redaction property runs hundreds.
  */
class CurationPropsSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("ab", "cd", "ef", "gh", "ij")
  private val doc = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(2, 8)
    .flatMap(n => Gen.listOfN(n, doc))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("cutSpans: counts reconcile and survivors are an ordered subsequence") {
    checkProp(Prop.forAll(corpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = Curation.cutSpans(df, $"text", $"doc_id", k = 2, minCount = 2)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      graft.CacheScope.release()
      docs.forall { case (id, text) =>
        val words = text.split(" ").toSeq
        val (nWords, nCut, clean) = out(id)
        val cleanWords =
          if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        // every document survives; totals reconcile; the survivors are
        // a subsequence of the original words (order preserved)
        nWords == words.length &&
          cleanWords.length == nWords - nCut &&
          isSubsequence(cleanWords, words)
      }
    }, cases = 8)
  }

  test("chunkByWords: full coverage, contiguous indices, exact window content") {
    val sized = for {
      size <- Gen.chooseNum(2, 6)
      stride <- Gen.chooseNum(1, size)
      docs <- corpus
    } yield (size, stride, docs)
    checkProp(Prop.forAll(sized) { case (size, stride, docs) =>
      val df = docs.toDF("doc_id", "text")
      val out = Curation.chunkByWords(df, $"text", $"doc_id", size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        val words = text.split(" ").toSeq
        val chunks = out.getOrElse(id, Array.empty).sortBy(_._2)
        val nc = 1 + (math.max(words.length - size, 0) + stride - 1) / stride
        // chunk_idx contiguous from 0; every chunk is EXACTLY the
        // declared window of the original words; n_words reconciles;
        // the union of windows covers every word position
        chunks.length == nc &&
          chunks.map(_._2).toSeq == (0 until nc) &&
          chunks.forall { case (_, i, txt, nw) =>
            val w = words.slice(i * stride, i * stride + size)
            txt == w.mkString(" ") && nw == w.length
          } &&
          chunks.flatMap { case (_, i, _, _) =>
            i * stride until math.min(i * stride + size, words.length)
          }.toSet == words.indices.toSet
      }
    }, cases = 10)
  }

  test("chunkBySentences: exact match against an independent reference") {
    // random corpora with random terminal punctuation, checked against
    // a straight-line Scala re-implementation of the declared
    // semantics (word-level boundaries, window membership by start
    // offset, sparse chunk indices) — the CodeProfile property-test
    // convention: the reference shares NO code with the operator.
    // terminal draw spans all three script families (Latin, CJK
    // fullwidth, Arabic/Devanagari) — the r18 multilingual extension
    val pword = for {
      w <- word
      p <- Gen.frequency(3 -> Gen.const(""),
        1 -> Gen.oneOf(".", "!", "?", "。", "！", "？", "؟", "۔", "।", "॥"))
    } yield w + p
    val pdoc = Gen.chooseNum(1, 14)
      .flatMap(n => Gen.listOfN(n, pword)).map(_.mkString(" "))
    val sized = for {
      size <- Gen.chooseNum(2, 6)
      stride <- Gen.chooseNum(1, size)
      n <- Gen.chooseNum(2, 6)
      docs <- Gen.listOfN(n, pdoc)
    } yield (size, stride, docs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    def ref(text: String, size: Int, stride: Int): Seq[(Int, String, Int, Int)] = {
      val words = text.trim.split(" +").toSeq
      // stated independently of Curation.SentenceTerminals on purpose
      // (the reference shares no code with the operator)
      val ends = Set('.', '!', '?', '。', '！', '？', '؟', '۔', '।', '॥')
      val bp = (1 to words.length).filter(i =>
        i == words.length || ends.contains(words(i - 1).last))
      val sents = bp.zipWithIndex.map { case (e, k) =>
        val st = if (k == 0) 1 else bp(k - 1) + 1
        (st - 1, e - st + 1, words.slice(st - 1, e).mkString(" "))
      }
      (0 to sents.last._1 / stride).flatMap { i =>
        val ss = sents.filter(s => i * stride <= s._1 && s._1 < i * stride + size)
        if (ss.isEmpty) None
        else Some((i, ss.map(_._3).mkString(" "), ss.length, ss.map(_._2).sum))
      }
    }
    checkProp(Prop.forAll(sized) { case (size, stride, docs) =>
      val out = Curation.chunkBySentences(docs.toDF("doc_id", "text"),
          $"text", $"doc_id", size, stride)
        .collect()
        .map(r => (r.getLong(0),
          (r.getInt(1), r.getString(2), r.getInt(3), r.getInt(4))))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        out.getOrElse(id, Array.empty).map(_._2).sortBy(_._1).toSeq ==
          ref(text, size, stride)
      }
    }, cases = 10)
  }

  test("duplicateSpans: spans are disjoint, in bounds, at least k long") {
    checkProp(Prop.forAll(corpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val spans = Curation.duplicateSpans(df, $"text", $"doc_id",
          k = 2, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      graft.CacheScope.release()
      val byDoc = docs.toMap
      spans.forall { case (id, s, e, n) =>
        val len = byDoc(id).split(" ").length
        s >= 0 && e < len && n == e - s + 1 && n >= 2
      } && spans.groupBy(_._1).values.forall { ss =>
        // merged spans never touch: a gap of at least one word
        ss.sortBy(_._2).toSeq.sliding(2).forall {
          case Seq(a, b) => b._2 > a._3 + 1
          case _ => true
        }
      }
    }, cases = 8)
  }

  test("dedupLines: kept lines are exactly the locally-unique ones") {
    val linedDoc = Gen.chooseNum(1, 5)
      .flatMap(n => Gen.listOfN(n, doc)).map(_.mkString("\n"))
    val linedCorpus = Gen.chooseNum(2, 6)
      .flatMap(n => Gen.listOfN(n, linedDoc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    checkProp(Prop.forAll(linedCorpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = Curation.dedupLines(df, $"text", $"doc_id")
        .collect().map(r => (r.getLong(0), r.getString(3))).toMap
      graft.CacheScope.release()
      // reference model: line -> number of distinct docs containing it
      val docFreq = docs.flatMap { case (_, t) => t.split("\n", -1).distinct }
        .groupBy(identity).view.mapValues(_.length).toMap
      docs.forall { case (id, text) =>
        val expect = text.split("\n", -1).filter(docFreq(_) < 2)
        out(id).split("\n", -1).filter(_.nonEmpty).toSeq ==
          expect.filter(_.nonEmpty).toSeq
      }
    }, cases = 8)
  }

  test("gopherRepetition matches an independent per-doc model on random pages") {
    val line = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "c", "dd ee")).map(_.mkString(" ")))
    val page = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, line))
      // join with a mix of single and double newlines so paragraphs
      // and lines genuinely differ
      .flatMap(ls => Gen.listOfN(math.max(ls.length - 1, 0),
          Gen.oneOf("\n", "\n\n"))
        .map(seps => ls.zipAll(seps, "", "").map { case (l, s) => l + s }
          .mkString))
    checkProp(Prop.forAll(Gen.listOfN(10, page)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val out = TextAnalysis.gopherRepetition(df, $"text", $"doc_id")
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6))).toMap
      def model(t: String) = {
        def pm(xs: Seq[String]) = {
          val n = xs.length
          val d = xs.distinct
          val ct = xs.map(_.length.toLong).sum
          val cd = d.map(_.length.toLong).sum
          ((n - d.length) * 1000L / n, (ct - cd) * 1000L / math.max(ct, 1L), n)
        }
        val ls = t.split("\n", -1).filter(_.nonEmpty).toSeq
        val ps = t.split("\n\n", -1).filter(_.nonEmpty).toSeq
        (pm(ls), pm(ps))
      }
      docs.filter { case (_, t) => t.split("\n", -1).exists(_.nonEmpty) }
        .forall { case (id, t) =>
          val ((lp, lc, ln), (pp, pc, pn)) = model(t)
          out(id) == ((ln, pn, lp, lc, pp, pc))
        }
    }, cases = 8)
  }

  test("redactText is idempotent and leaves PII-free text alone (expression-level)") {
    val noise = Gen.listOfN(6, Gen.oneOf("lorem", "ipsum", "x", "-", "."))
      .map(_.mkString(" "))
    val pii = Gen.oneOf(
      "a.b@example.com", "10.0.0.1", "555-123-4567", "")
    val gen = for { a <- noise; p <- pii; b <- noise } yield s"$a $p $b"
    checkProp(Prop.forAll(Gen.listOfN(12, gen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Curation.redactPii(df, $"text", $"doc_id")
      val twice = once.select($"doc_id",
        Curation.redactText($"redacted").as("again"),
        $"redacted", $"n_emails", $"n_ips", $"n_phones")
        .collect()
      twice.forall { r =>
        val stable = r.getString(1) == r.getString(2)
        // counted PII implies the original text actually changed
        val masked = (r.getInt(3) + r.getInt(4) + r.getInt(5) == 0) ||
          r.getString(2).contains("<")
        stable && masked
      }
    }, cases = 5)
  }

  /** `xs` appears within `ys` preserving order (not necessarily
    * contiguously). */
  private def isSubsequence(xs: Seq[String], ys: Seq[String]): Boolean = {
    var i = 0
    ys.foreach { y => if (i < xs.length && xs(i) == y) i += 1 }
    i == xs.length
  }

  // --- code_profile: the one-pass run scanner vs a naive reference ---

  /** The obvious-but-slow formulation: Java split + regex findAllIn.
    * Deliberately a DIFFERENT algorithm (regex maximal-run matching vs
    * the scanner's incremental run tracking) so a disagreement means a
    * real edge-case bug, not a shared blind spot. */
  private def naiveCodeProfile(s: String): (Int, Int, Long, Int, Long, Long, Long) = {
    val lines = s.split("\n", -1)
    val nLines = lines.length
    val maxLl = lines.map(l => l.codePointCount(0, l.length)).max
    val sumLl = lines.map(l => l.codePointCount(0, l.length).toLong).sum
    val nComment = lines.count { l =>
      val t = l.dropWhile(c => c == ' ' || c == '\t')
      t.startsWith("//") || t.startsWith("#")
    }
    val nAlnum = s.count(c => c < 128 && c.isLetterOrDigit).toLong
    val hex = "[0-9A-Fa-f]{16,}".r.findAllIn(s).map(_.length.toLong).sum
    val b64 = "[A-Za-z0-9+/=]{40,}".r.findAllIn(s).map(_.length.toLong).sum
    (nLines, maxLl, sumLl, nComment, nAlnum, hex, b64)
  }

  test("code_profile equals the regex reference on random hostile strings") {
    import graft.functions.CodeProfileUtil.profile
    import org.apache.spark.unsafe.types.UTF8String
    // alphabet tuned so runs straddle both thresholds often: hex chars
    // dominate, with run-breakers (space, newline, quote), comment
    // markers, base64-only chars, and a non-ASCII codepoint
    val ch = Gen.frequency(
      (8, Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f', '0', '9', 'A', 'F')),
      (3, Gen.oneOf('x', 'y', 'Z', '+', '/', '=')),
      (2, Gen.oneOf(' ', '\n', '\t')),
      (1, Gen.oneOf('#', '/', '"', ';', 'é')))
    val str = Gen.chooseNum(0, 120)
      .flatMap(n => Gen.listOfN(n, ch)).map(_.mkString)
    checkProp(Prop.forAll(str) { s =>
      val r = profile(UTF8String.fromString(s))
      val got = (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      val want = naiveCodeProfile(s)
      if (got != want) println(s"MISMATCH on ${s.replace("\n", "\\n")}: " +
        s"got $got want $want")
      got == want
    }, cases = 500)
  }

  test("pairSimilarity equals the quantized-cosine reference on random embeddings") {
    // engine-exactness pin for the gate: random float embeddings
    // (zero vectors included) against an independent Scala model of
    // the documented arithmetic — quantize to the 1e-6 grid, exact
    // integer dots/norms, one double division, HALF_UP round to 6 dp,
    // zero-norm pairs drop. Any quantization or guard drift breaks it.
    val rnd = new scala.util.Random(42)
    def vec(dim: Int): Array[Float] =
      if (rnd.nextInt(8) == 0) Array.fill(dim)(0.0f) // occasional zero
      else Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    def quant(v: Array[Float]): Array[Long] =
      // HALF_UP away from zero, matching Spark's round() — math.round
      // rounds half toward +infinity and would diverge on a negative
      // component landing exactly on the 1e-6 grid's .5 point
      v.map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 3).foreach { trial =>
      val dim = 2 + trial * 3 // 2, 5, 8
      // pairs carry the CANONICAL form (imagePairs' output contract);
      // the embedding corpus carries raw fetch-log URLs the gate must
      // canonicalize to meet them
      val urls = (0 until 6).map(i => s"h$i.ex/p$i.png")
      val caps = (0 until 6).map(i => s"caption number $i")
      val imgV = urls.map(_ -> vec(dim)).toMap
      val txtV = caps.map(_ -> vec(dim)).toMap
      val pairRows = (0 until 30).map { i =>
        (i.toLong, 0L, urls(rnd.nextInt(6)), caps(rnd.nextInt(6)),
          10, 10, 50) }
      val thr = Seq(0.0, 0.3, 0.9)(trial)
      // independent reference over the SAME rows
      val expect = pairRows.flatMap { case (id, _, u, c, _, _, _) =>
        val qi = quant(imgV(u)); val qt = quant(txtV(c))
        val ni = qi.map(x => x * x).sum; val nt = qt.map(x => x * x).sum
        if (ni == 0 || nt == 0) None
        else {
          val dot = qi.zip(qt).map { case (a, b) => a * b }.sum
          val sim = round6(dot.toDouble / math.sqrt(ni.toDouble * nt.toDouble))
          if (sim >= thr) Some(id -> sim) else None
        }
      }.toMap
      val got = Curation.pairSimilarity(
          pairRows.toDF("doc_id", "ref_idx", "canonical_url", "caption",
            "width", "height", "mean_luma"),
          urls.map(u => (s"http://$u", imgV(u))).toDF("img_url", "embedding"),
          caps.map(c => (c, txtV(c))).toDF("caption", "embedding"),
          minCosine = thr)
        .select("doc_id", "sim").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === expect, s"trial $trial (dim=$dim thr=$thr)")
    }
  }

  test("dedupPairs equals an independent shingle-set reference on random pair corpora") {
    // pins the struct pair key, the df cap, the jaccard arithmetic
    // and the same_image flag end-to-end against a from-scratch Scala
    // model — random captions from a tiny vocabulary make shared and
    // capped shingles common, and ref_idx > 0 keeps the composite key
    // load-bearing
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 3).foreach { trial =>
      val cap = Seq(Int.MaxValue, 6, 3)(trial)
      val rows = (0 until 20).map { i =>
        val caption = Seq.fill(3 + rnd.nextInt(5))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
        ((i / 2).toLong, (i % 2).toLong,
          s"cdn.ex/i${rnd.nextInt(4)}.png", caption)
      }
      // independent model: distinct word 3-shingles per pair, df cap,
      // pairwise jaccard over the capped sets, url equality flag
      val shingleSets = rows.map { case (d, r, _, c) =>
        ((d, r), c.split(" +").toSeq.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSeq.distinct)
      }
      val df = shingleSets.flatMap(_._2.map(s => s -> 1))
        .groupBy(_._1).map { case (k, v) => k -> v.size }
      val capped = shingleSets.map { case (k, sh) =>
        k -> sh.filter(s => df(s) <= cap).toSet }.toMap
      val urlOf = rows.map { case (d, r, u, _) => ((d, r), u) }.toMap
      val keys = rows.map { case (d, r, _, _) => (d, r) }
      val expect = (for {
        a <- keys; b <- keys
        if (a._1 < b._1) || (a._1 == b._1 && a._2 < b._2)
        inter = (capped(a) & capped(b)).size
        if inter > 0
        union = capped(a).size + capped(b).size - inter
        j = round6(inter.toDouble / union)
        if j >= 0.2
      } yield (a._1, a._2, b._1, b._2, inter.toLong, union.toLong, j,
        urlOf(a) == urlOf(b))).toSet
      val got = Curation.dedupPairs(
          rows.toDF("doc_id", "ref_idx", "canonical_url", "caption"),
          k = 3, minJaccard = 0.2, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
          r.getBoolean(7))).toSet
      graft.CacheScope.release()
      assert(got === expect, s"trial $trial (cap=$cap)")
    }
  }
}
