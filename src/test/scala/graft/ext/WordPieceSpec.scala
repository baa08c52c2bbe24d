package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece against first principles: the greedy longest-match-first
  * inference rules by hand (word-initial vs ## forms, whole-word [UNK]
  * collapse, the MaxWordCp guard), the frequency vocabulary cut, the
  * likelihood-scored merge trainer on hand arithmetic, decode
  * inversion, and determinism on the real fixture corpus. */
class WordPieceSpec extends SparkSpec {
  import WordPiece._
  import spark.implicits._

  test("encodeWord: longest match first, ## continuation, UNK collapse") {
    val pieces = Set("un", "##aff", "##able", "##ff", "a", "##a", "##b", "unaff")
    // longest-first at position 0: "unaff" (5) beats "un" (2)
    assert(encodeWord("unaffable", pieces) == (Seq("unaff", "##able"), false))
    // after the first piece, only ## forms match
    assert(encodeWord("unaff", pieces) == (Seq("unaff"), false))
    assert(encodeWord("aab", pieces) == (Seq("a", "##a", "##b"), false))
    // a stuck position UNKs the WHOLE word, discarding earlier matches
    assert(encodeWord("unz", pieces) == (Seq(Unk), true))
    // word-initial form does not leak into continuation positions:
    // "a" in vocab but "##a" needed at pos>0 — present here, absent -> UNK
    assert(encodeWord("za", pieces) == (Seq(Unk), true))
    // over MaxWordCp -> UNK outright
    assert(encodeWord("x" * (MaxWordCp + 1), pieces + "x" + "##x") ==
      (Seq(Unk), true))
    // empty word -> no pieces
    assert(encodeWord("", pieces) == (Seq.empty, false))
  }

  test("fromCounts: vocabulary cut and fence match the hand computation") {
    // corpus: "aa ab aa" -> words aa(2), ab(1). candidates:
    //   aa: a(+2), aa(+2), ##a(+2)   ab: a(+1), ab(+1), ##b(+1)
    // counts: a=3, aa=2, ##a=2, ab=1, ##b=1
    val docs = Seq((1L, "aa ab AA")).toDF("id", "text")
    val m = fromCounts(docs, col("text"), vocabSize = 3)
    assert(m.pieces == Set("a", "##a", "aa")) // top-3: a(3), ##a(2), aa(2) — tie aa/##a broken piece-asc: '#'<'a'
    assert(m.vocab == Seq("##a", "[UNK]", "a", "aa").sorted)
    assert(m.ids(Unk) == m.unkId)
    // fence: '#'-bearing and literal [unk] words mint no pieces
    val fenced = fromCounts(Seq((1L, "c#d [unk] ee")).toDF("id", "text"),
      col("text"), vocabSize = 10)
    assert(fenced.pieces == Set("e", "ee", "##e"))
  }

  test("learn: likelihood-scored merges by hand, ## survives at the front") {
    // corpus: "ab ab cb" -> symbol table: a ##b (x2), c ##b (x1)
    // singles: a=2, ##b=3, c=1; pairs: (a,##b)=2 score 2/(2*3)=0.333,
    // (c,##b)=1 dropped by the pc>=2 floor -> merge (a,##b) -> "a##b"?
    // no: fused strips b's marker INTO a's form -> piece "ab"
    val docs = Seq((1L, "ab ab cb")).toDF("id", "text")
    val m = learn(docs, col("text"), nMerges = 5)
    assert(m.pieces.contains("ab"))
    assert(m.pieces.contains("c") && m.pieces.contains("##b"))
    assert(!m.pieces.contains("a")) // fully fused away
    // greedy encode with the learned vocabulary
    assert(encodeWord("ab", m.pieces) == (Seq("ab"), false))
    assert(encodeWord("cb", m.pieces) == (Seq("c", "##b"), false))
  }

  test("encode/tokStats/decode: ids total over vocab, stats agree, decode inverts") {
    val docs = Seq((1L, "Unaffable views"), (2L, "zq zq")).toDF("id", "text")
    val model = fromCounts(docs, col("text"), vocabSize = 100)
    val enc = encode(docs, col("id"), col("text"), model)
      .orderBy("doc_id").collect()
    val stats = tokStats(docs, col("id"), col("text"), model)
      .orderBy("doc_id").collect()
    enc.zip(stats).foreach { case (e, st) =>
      assert(e.getLong(2) == st.getLong(1)) // n_tokens agree
      val ids = e.getSeq[Long](1)
      assert(ids.forall(i => i >= 0 && i < model.vocab.length))
    }
    // a 100-piece vocab over this tiny corpus covers every word
    assert(stats.forall(_.getLong(2) == 0L)) // n_unk
    val dec = decode(enc.map(r => (r.getLong(0), r.getSeq[Long](1)))
        .toSeq.toDF("doc_id", "ids"), col("doc_id"), col("ids"), model)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(dec.toSeq == Seq("unaffable views", "zq zq"))
    // UNK round-trip is lossy by contract: unknown word -> [UNK] text
    val tiny = Model(Set("zq"), Seq("[UNK]", "zq"))
    val e2 = encode(Seq((1L, "zq mystery")).toDF("id", "text"),
      col("id"), col("text"), tiny).collect()(0).getSeq[Long](1)
    assert(decodeIds(e2, tiny) == "zq [UNK]")
  }

  test("real corpus: stats deterministic under repartitioning, every branch fires") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = fromCounts(docs, col("text"), vocabSize = 60)
    val a = tokStats(docs, col("doc_id"), col("text"), model)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = tokStats(docs.repartition(7), col("doc_id"), col("text"), model)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
    // the 60-piece cut leaves all three branches live on the fixture
    assert(a.exists(_._3 > 0))                  // some UNKs
    assert(a.exists(r => r._2 > r._3))          // some real pieces
    val words = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(length(col("w")) > 0).distinct().count()
    assert(words == 31L) // the fixture contract the oracle's CTE relies on
  }

  test("stored artifact: round-trip, byte-identical re-export, encodeStored parity") {
    val m = fromCounts(Seq((1L, "aa ab aa")).toDF("id", "text"),
      col("text"), vocabSize = 3)
    val dir = java.nio.file.Files.createTempDirectory("wpm").toString
    writeModel(spark, m, s"$dir/m1")
    // structural round-trip: pieces and ids come back exactly
    assert(readModel(spark, s"$dir/m1") == m)
    // re-export byte-identical — the shared artifact contract
    writeModel(spark, m, s"$dir/m2")
    def bytesOf(sub: String, gen: String) = {
      val fs = new java.io.File(s"$dir/$gen/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(fs.length == 1, s"expected ONE $sub file, got ${fs.length}")
      java.nio.file.Files.readAllBytes(fs.head.toPath).toSeq
    }
    Seq("pieces", "vocab").foreach { sub =>
      assert(bytesOf(sub, "m1") == bytesOf(sub, "m2"),
        s"$sub re-export is not byte-identical")
    }
    // encodeStored == encode BY SHARED CODE on a foreign corpus that
    // exercises piece hits, continuations, and the [UNK] collapse
    val foreign = Seq((1L, "aa ab aaa"), (2L, "zq aab"))
      .toDF("doc_id", "text")
    val direct = encode(foreign, col("doc_id"), col("text"), m)
      .orderBy("doc_id").collect().toSeq
    val stored = encodeStored(foreign, col("doc_id"), col("text"),
        s"$dir/m1")
      .orderBy("doc_id").collect().toSeq
    assert(stored == direct)
  }
}
