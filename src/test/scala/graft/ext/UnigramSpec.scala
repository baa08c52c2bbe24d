package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer against a hand-derivable corpus (word
  * frequencies ab:6 abc:2) — BpeSpec's discipline: every expected
  * cost, vocabulary cut, and segmentation below is paper arithmetic,
  * including the lexicographic (cost, nTokens, cutMask) tie-breaks,
  * so a change to counting, cost quantization, or the DP shows up as
  * a diff against the comments, not against the code's own output. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // candidate substring counts (each in-chunk occurrence, weighted by
  // word freq): a=8 b=8 ab=8 from both words; c=2 bc=2 abc=2 from
  // "abc" only. vocabSize=4 keeps (cnt desc, piece asc): a, ab, b,
  // then abc ("abc" < "bc" < "c" at count 2). total = 8+8+8+2 = 26.
  private def corpus = Seq(
    (1L, "ab ab abc"),
    (2L, "ab ab"),
    (3L, "abc ab ab")).toDF("doc_id", "text")

  test("costOf: quarter-bit integer surprisal, by hand") {
    // cnt=8 total=26: ppm = 8e6//26 = 307692, q = 1e9//307692 = 3250,
    // 3250^4 ≈ 1.1157e14 ∈ [2^46, 2^47) -> bitlen 47
    assert(Unigram.costOf(8, 26) == 47L)
    // cnt=2: ppm = 76923, q = 13000, 13000^4 ≈ 2.856e16 ∈ [2^54, 2^55)
    assert(Unigram.costOf(2, 26) == 55L)
    // vanishing piece: ppm clamps to 1, q = 1e9, 1e36 ∈ [2^119, 2^120)
    assert(Unigram.costOf(1, 1000000000L) == 120L)
    // cheaper than one fallback BYTE always (learned range ≤ 120 < 160)
    assert(Unigram.costOf(1, Long.MaxValue / 2000000) <= 120L)
  }

  test("learn: vocabulary cut and costs match the hand computation") {
    val m = Unigram.learn(corpus, col("text"), vocabSize = 4)
    assert(m.costs == Map("a" -> 47L, "ab" -> 47L, "b" -> 47L, "abc" -> 55L))
    // id space: learned pieces + 256 byte symbols + the word marker,
    // sorted; ids are stable positions in that list
    assert(m.vocab.length == 4 + 256 + 1)
    assert(m.vocab.contains(Unigram.WordStart))
    assert(m.ids("a") == m.vocab.indexOf("a"))
    // a second learn over a different partitioning is bit-identical
    val m2 = Unigram.learn(corpus.repartition(7), col("text"), vocabSize = 4)
    assert(m2.costs == m.costs && m2.vocab == m.vocab)
  }

  test("viterbi: cost minimum, then fewer tokens, then longest-first-piece") {
    // one piece beats two at equal character coverage when cheaper
    val c1 = Map("a" -> 10L, "b" -> 10L, "ab" -> 15L)
    assert(Unigram.viterbi("ab", c1) == (Seq("ab"), 15L, 1L))
    // exact cost TIE (20 = 10+10): fewer emitted tokens wins
    val c2 = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(Unigram.viterbi("ab", c2) == (Seq("ab"), 20L, 1L))
    // cost and token ties both ways ([ab,c] vs [a,bc], 30 qb / 2 toks):
    // the smaller cut mask — cut later — prefers the LONGER first piece
    val c3 = Map("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 20L, "bc" -> 20L)
    assert(Unigram.viterbi("abc", c3) == (Seq("ab", "c"), 30L, 2L))
  }

  test("viterbi: byte fallback fires only when nothing else can") {
    val c = Map("a" -> 10L, "b" -> 10L)
    // unknown single cp: one piece, FallbackCostQb per UTF-8 byte
    assert(Unigram.viterbi("axb", c) == (Seq("a", "x", "b"), 180L, 3L))
    // multi-byte cp: 低 = 3 UTF-8 bytes -> 480 qb, THREE emitted tokens
    // (the byte ids), but one piece in the segmentation
    assert(Unigram.viterbi("低", c) == (Seq("低"), 480L, 3L))
    // an unknown MULTI-cp span never segments as one piece — it must
    // fall back cp-by-cp (the DP only proposes known pieces or 1-cp)
    assert(Unigram.viterbi("xy", c) == (Seq("x", "y"), 320L, 2L))
  }

  test("encode ids are total, decode inverts, chunks split at 10 cp") {
    val m = Unigram.learn(corpus, col("text"), vocabSize = 4)
    val texts = Seq(
      "ab abc",                   // in-vocabulary words
      "  Mixed   CASE\tab  ",     // normalization: lower + \s+ split
      "quiz 低 a😀b",             // fallback: ASCII, CJK, astral pair
      "ababababababababababab")   // 22 cp -> chunks 10/10/2
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "txt")
    val enc = Unigram.encode(df, col("id"), col("txt"), m)
    val rows = enc.orderBy("doc_id").as[(Long, Seq[Long], Long)].collect()
    // every id resolves (total encoding, never -1 / out of range)
    rows.foreach { case (_, ids, n) =>
      assert(ids.length.toLong == n)
      assert(ids.forall(i => i >= 0 && i < m.vocab.length))
    }
    // doc 0 by hand: ▁ ab ▁ abc
    assert(rows(0)._2 == Seq(m.wordStartId.toLong, m.ids("ab").toLong,
      m.wordStartId.toLong, m.ids("abc").toLong))
    // doc 3: one word, one ▁, chunks [ab×5][ab×5][ab] -> 11 "ab" pieces
    assert(rows(3)._2.count(_ == m.ids("ab").toLong) == 11)
    assert(rows(3)._2.count(_ == m.wordStartId.toLong) == 1)
    val back = Unigram.decode(enc, col("doc_id"), col("input_ids"), m)
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    val expected = texts.map(_.toLowerCase.trim.split("\\s+").mkString(" "))
    assert(back.toSeq == expected)
  }

  test("tokStats agrees with encode on the real corpus; deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Unigram.learn(docs, col("text"), vocabSize = 2000)
    val fromEnc = Unigram.encode(docs, col("doc_id"), col("text"), m)
      .select(col("doc_id"), col("n_tokens").as("ne"))
    val fromStats = Unigram.tokStats(docs, col("doc_id"), col("text"), m)
    // n_tokens: the stats row counts a fallen-back cp as its byte ids,
    // exactly what encode emits — the two paths must agree everywhere
    assert(fromStats.join(fromEnc, "doc_id")
      .where(col("n_tokens") =!= col("ne")).count() == 0)
    assert(fromStats.where(col("cost_q") <= 0).count() == 0)
    // partitioning-invariant (mapPartitions carries no partition state)
    val again = Unigram.tokStats(docs.repartition(13), col("doc_id"),
      col("text"), m).orderBy("doc_id").collect().toSeq
    assert(fromStats.orderBy("doc_id").collect().toSeq == again)
  }

  test("refine: EM pass drops never-winning pieces, recosts the rest") {
    val m = Unigram.learn(corpus, col("text"), vocabSize = 4)
    // under m every word segments as a single piece ("ab" 47 < 94 =
    // a+b; "abc" 55 < any split), so lone "a"/"b" win nothing and are
    // dropped; usage counts are the word freqs (ab:6 abc:2, total 8):
    // costOf(6,8) = bitlen((1e9//750000)^4) = bitlen(1333^4) = 42,
    // costOf(2,8) = bitlen(4000^4) = 48
    val r = Unigram.refine(corpus, col("text"), m)
    assert(r.costs == Map("ab" -> 42L, "abc" -> 48L))
    // refined model still total: everything encodes, round-trips
    val enc = Unigram.encode(Seq((9L, "ab abc ba")).toDF("id", "t"),
      col("id"), col("t"), r)
    val back = Unigram.decode(enc, col("doc_id"), col("input_ids"), r)
      .as[(Long, String)].collect()(0)._2
    assert(back == "ab abc ba")
  }

  test("stored artifact: round-trip, byte-identical re-export, encodeStored parity") {
    val m = Unigram.learn(corpus, col("text"), vocabSize = 4)
    val dir = java.nio.file.Files.createTempDirectory("unim").toString
    Unigram.writeModel(spark, m, s"$dir/m1")
    // structural round-trip: costs and ids come back exactly
    assert(Unigram.readModel(spark, s"$dir/m1") == m)
    // re-export of the same model is byte-identical (canonical order,
    // one file per frame) — the lm3/DSIR/NB/Bpe artifact contract
    Unigram.writeModel(spark, m, s"$dir/m2")
    def bytesOf(sub: String, gen: String) = {
      val fs = new java.io.File(s"$dir/$gen/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(fs.length == 1, s"expected ONE $sub file, got ${fs.length}")
      java.nio.file.Files.readAllBytes(fs.head.toPath).toSeq
    }
    Seq("costs", "vocab").foreach { sub =>
      assert(bytesOf(sub, "m1") == bytesOf(sub, "m2"),
        s"$sub re-export is not byte-identical")
    }
    // encodeStored == encode BY SHARED CODE on a foreign corpus that
    // exercises piece hits, unseen compositions, and byte fallback
    val foreign = Seq((1L, "ab abc ba"), (2L, "zq 低 abab"))
      .toDF("doc_id", "text")
    val direct = Unigram.encode(foreign, col("doc_id"), col("text"), m)
      .orderBy("doc_id").collect().toSeq
    val stored = Unigram.encodeStored(foreign, col("doc_id"), col("text"),
        s"$dir/m1")
      .orderBy("doc_id").collect().toSeq
    assert(stored == direct)
  }
}
