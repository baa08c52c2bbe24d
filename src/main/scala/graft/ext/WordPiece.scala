package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** WordPiece tokenization — the third public tokenizer family beside
  * [[Bpe]] (merge list, greedy merges) and [[Unigram]] (piece costs,
  * Viterbi): a piece vocabulary split into WORD-INITIAL pieces and
  * `##`-prefixed CONTINUATION pieces, applied by greedy
  * longest-match-first segmentation, with a whole word collapsing to
  * the reserved `[UNK]` token the moment any position has no matching
  * piece (the BERT inference algorithm, published in the original
  * paper and every reference implementation).
  *
  * Two vocabulary constructions, mirroring the repo's tokenizer
  * discipline:
  *
  *  - [[fromCounts]] — frequency-threshold vocabulary over the
  *    position-split substring table (word-initial and continuation
  *    candidates counted as the distinct pieces they are). One corpus
  *    pass (`groupBy(word)`), then work proportional to the DISTINCT
  *    word table; selection is a `TakeOrdered` of exactly `vocabSize`
  *    rows. Fully deterministic and ORACLE-CHECKABLE — greedy
  *    longest-match from a position depends only on that position, so
  *    the DuckDB mirror precomputes the per-position greedy piece and
  *    walks it with a linear recursive CTE.
  *  - [[learn]] — the likelihood-scored merge trainer (the published
  *    WordPiece learner: at each round merge the adjacent pair
  *    maximizing `freq(ab) / (freq(a)·freq(b))`, the pair whose fusion
  *    most improves a unigram LM's likelihood). Iterative like
  *    [[Bpe.learn]] (same corpus-pass structure and stopping rule),
  *    hence spec-verified rather than oracle-expressible.
  *
  * Encoding is one shuffle-free `mapPartitions` with the
  * vocabulary-sized model in the closure and a per-partition word memo
  * ([[Bpe.encode]]'s execution shape). Unlike BPE/Unigram there is
  * deliberately NO byte fallback: `[UNK]` totality is WordPiece's
  * published contract, and the `n_unk` count it yields is itself a
  * corpus-quality signal (a spiking unknown rate flags encoding rot or
  * domain shift at the tokenizer boundary).
  */
object WordPiece {

  /** Continuation-piece prefix (BERT's `##`). */
  val ContPrefix = "##"

  /** The reserved unknown-word token. */
  val Unk = "[UNK]"

  /** Maximum piece length in code points (candidate generation and
    * greedy match window share it). */
  val MaxPieceCp = 8

  /** Words longer than this many code points are `[UNK]` outright —
    * BERT's max_input_chars_per_word guard, which bounds the greedy
    * scan per word. */
  val MaxWordCp = 20

  /** A learned tokenizer: the piece set (continuation pieces carry
    * their `##` prefix) plus the id-indexed vocabulary (sorted pieces +
    * [[Unk]]) — ids are positions in `vocab`, deterministic for a
    * deterministic piece set, the [[Bpe.Model]] scheme. */
  final case class Model(pieces: Set[String], vocab: Seq[String]) {
    lazy val ids: Map[String, Int] = vocab.zipWithIndex.toMap
    lazy val unkId: Int = ids(Unk)
  }

  private def codePoints(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Frequency-threshold vocabulary: top `vocabSize` candidate pieces
    * by (weighted count desc, piece asc). Candidates are the
    * substrings of each distinct word, weighted by word frequency —
    * word-initial substrings as themselves, interior ones with the
    * [[ContPrefix]] — so `ing` at a word start and `##ing` inside one
    * are the distinct vocabulary entries WordPiece treats them as.
    * Collision fence ([[Bpe.learn]]'s discipline, as a filter):
    * candidates from words containing '#' or spelling [[Unk]] are
    * excluded, so notation never aliases corpus text. */
  def fromCounts(docs: DataFrame, text: Column, vocabSize: Int): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = docs
      .select(explode(split(lower(text), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        // collision fence on the SOURCE WORD: a word containing '#'
        // would mint pieces aliasing the ## notation, and a literal
        // "[unk]" word would alias the reserved token
        if (w.contains("#") || w == Unk.toLowerCase) Seq.empty
        else {
          val cps = codePoints(w)
          for {
            s <- cps.indices
            e <- (s + 1) to math.min(s + MaxPieceCp, cps.length)
            sub = cps.slice(s, e).mkString
          } yield (if (s == 0) sub else ContPrefix + sub, f)
        }
      }
      .toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .orderBy(desc("cnt"), asc("piece"))
      .limit(vocabSize)
      .as[(String, Long)].collect()
    val pieces = kept.map(_._1).toSet
    Model(pieces, (pieces.toSeq :+ Unk).distinct.sorted)
  }

  /** Greedy longest-match-first segmentation of one word: at each
    * position take the LONGEST matching piece (word-initial form at
    * position 0, `##` form after); any position with no match — or a
    * word over [[MaxWordCp]] — collapses the WHOLE word to [[Unk]].
    * Returns (pieces, isUnk). */
  private[ext] def encodeWord(w: String, pieces: Set[String]): (Seq[String], Boolean) = {
    val cps = codePoints(w)
    val L = cps.length
    if (L == 0) return (Seq.empty, false)
    if (L > MaxWordCp) return (Seq(Unk), true)
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < L) {
      var len = math.min(MaxPieceCp, L - pos)
      var hit: String = null
      var hitCp = 0
      while (len >= 1 && hit == null) {
        val sub = cps.slice(pos, pos + len).mkString
        val cand = if (pos == 0) sub else ContPrefix + sub
        if (pieces.contains(cand)) { hit = cand; hitCp = len }
        len -= 1
      }
      if (hit == null) return (Seq(Unk), true)
      out += hit
      pos += hitCp // code points consumed, not UTF-16 units
    }
    (out.result(), false)
  }

  /** Tokenize a corpus: (doc_id, input_ids, n_tokens). One narrow
    * `mapPartitions`, model in the closure, per-partition word memo. */
  def encode(docs: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = model.pieces
    docs.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[Int]]
        def wordIds(w: String): Seq[Int] = memo.getOrElseUpdate(w,
          encodeWord(w, pieces)._1.map(model.ids))
        it.map { case (docId, t) =>
          val ids = t.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(wordIds).map(_.toLong).toSeq
          (docId, ids, ids.length.toLong)
        }
      }
      .toDF("doc_id", "input_ids", "n_tokens")
  }

  /** The oracle-checkable segmentation statistics row (`wp`): per
    * document — emitted token count (an `[UNK]` word is ONE token),
    * unknown-word count, and the position-weighted piece fingerprint
    * `Σ (h60(piece) mod 10⁶)·j` (j = 1-based piece index within its
    * word; an `[UNK]` contributes its own hash at j=1) — pinning WHICH
    * pieces won and their order, [[Unigram.tokStats]]'s discipline. */
  def tokStats(docs: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = model.pieces
    docs.select(id.cast("long").as("doc_id"), lower(text).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]
        def stats(w: String): (Long, Long, Long) = memo.getOrElseUpdate(w, {
          val (ps, unk) = encodeWord(w, pieces)
          val fp = ps.zipWithIndex.map { case (p, j) =>
            (graft.functions.SimHashUtil.hash60(
              p.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 1000000L) *
              (j + 1)
          }.sum
          (ps.length.toLong, if (unk) 1L else 0L, fp)
        })
        it.map { case (docId, t) =>
          var nt = 0L; var nu = 0L; var fp = 0L
          t.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            val (n, u, f) = stats(w); nt += n; nu += u; fp += f
          }
          (docId, nt, nu, fp)
        }
      }
      .toDF("doc_id", "n_tokens", "n_unk", "fp")
  }

  /** Invert one id sequence: a non-`##` piece opens a word, a `##`
    * piece extends it, `[UNK]` is a word by itself. Lossy exactly
    * where [[encode]] is (lowercasing, whitespace normalization) AND
    * at unknown words — the published WordPiece round-trip contract. */
  def decodeIds(ids: Seq[Long], model: Model): String = {
    val words = Seq.newBuilder[String]
    val cur = new StringBuilder
    def endWord(): Unit = if (cur.nonEmpty) { words += cur.toString; cur.clear() }
    ids.foreach { i =>
      if (i >= 0 && i < model.vocab.length) {
        val p = model.vocab(i.toInt)
        if (p.startsWith(ContPrefix) && p.length > ContPrefix.length)
          cur.append(p.substring(ContPrefix.length))
        else { endWord(); cur.append(p) }
      }
    }
    endWord()
    words.result().mkString(" ")
  }

  /** Corpus-wide [[decodeIds]] — the mirror of [[encode]]'s shape. */
  def decode(docs: DataFrame, id: Column, idsCol: Column,
             model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(id.cast("long").as("doc_id"), idsCol.as("ids"))
      .as[(Long, Seq[Long])]
      .mapPartitions(_.map { case (docId, ids) =>
        (docId, decodeIds(ids, model))
      })
      .toDF("doc_id", "text")
  }

  private[ext] final case class WordSyms(freq: Long, syms: Seq[String])

  /** The likelihood-scored merge trainer: start from per-code-point
    * symbols (first bare, rest `##`-prefixed), and each round fuse the
    * adjacent pair with the highest `freq(ab)·SCALE div
    * (freq(a)·freq(b))` — integer-scaled so the selection is exact and
    * deterministic (ties break on the pair's lexicographic order).
    * Merging `(a, ##b)` yields `a##b`'s natural form: the `##` marker
    * survives only at the fused piece's FRONT. Same corpus-pass
    * structure, persistence, and early stop as [[Bpe.learn]]; stops
    * when no pair occurs twice. The resulting symbol set becomes the
    * piece vocabulary (word-initial and `##` forms as distinct
    * entries), consumed by the same greedy [[encode]]. */
  def learn(docs: DataFrame, text: Column, nMerges: Int): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val Scale = 1000000000000L
    def strip(s: String) =
      if (s.startsWith(ContPrefix)) s.substring(ContPrefix.length) else s
    var words = docs
      .select(explode(split(lower(text), "\\s+")).as("w"))
      .where(length(col("w")) > 0 && !col("w").contains("#") &&
        col("w") =!= Unk)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) =>
        val cps = codePoints(w)
        WordSyms(f, cps.head +: cps.tail.map(ContPrefix + _))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    words.count()

    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val singles = words
        .flatMap(ws => ws.syms.iterator.map(s => (s, ws.freq)))
        .toDF("s", "f").groupBy("s").agg(sum("f").as("cnt"))
      val pairs = words
        .flatMap(ws => ws.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p(0), p(1), ws.freq)))
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("pc"))
        .where(col("pc") >= 2)
      val top = pairs
        .join(singles.withColumnRenamed("s", "a")
          .withColumnRenamed("cnt", "ca"), "a")
        .join(singles.withColumnRenamed("s", "b")
          .withColumnRenamed("cnt", "cb"), "b")
        .withColumn("score",
          col("pc") * Scale / (col("ca") * col("cb")))
        .orderBy(desc("score"), asc("a"), asc("b"))
        .select("a", "b")
        .limit(1)
        .collect()
      top.headOption match {
        case None => done = true
        case Some(row) =>
          val (a, b) = (row.getString(0), row.getString(1))
          val fused = a + strip(b)
          val next = words.map { ws =>
            val out = Seq.newBuilder[String]
            var i = 0
            while (i < ws.syms.length) {
              if (i + 1 < ws.syms.length && ws.syms(i) == a &&
                  ws.syms(i + 1) == b) { out += fused; i += 2 }
              else { out += ws.syms(i); i += 1 }
            }
            ws.copy(syms = out.result())
          }.persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words = next
          round += 1
      }
    }
    val pieces = words.flatMap(_.syms).distinct().collect().toSet
    words.unpersist()
    Model(pieces, (pieces.toSeq :+ Unk).distinct.sorted)
  }

  /** Persist a learned model as a self-describing parquet artifact —
    * the train/score boundary contract the lm3/DSIR/NB/[[Bpe]]/
    * [[Unigram]] artifacts carry. The piece set and the id-indexed
    * vocab are stored as separate frames so ANY model round-trips
    * exactly (not just ones from [[fromCounts]]/[[learn]], whose vocab
    * is derivable from the pieces); pieces land before the vocab —
    * `vocab/_SUCCESS` marks the whole artifact complete. Re-export of
    * the same model is byte-identical (canonical sort, one file per
    * frame). Both frames are vocabulary-sized, never corpus-sized. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                 path: String): Unit = {
    import spark.implicits._
    spark.createDataset(model.pieces.toSeq.sorted).toDF("piece")
      .coalesce(1).sortWithinPartitions("piece")
      .write.mode("overwrite").parquet(s"$path/pieces")
    spark.createDataset(model.vocab.zipWithIndex.map { case (s, i) => (i, s) })
      .toDF("id", "sym")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Rehydrate a [[writeModel]] artifact — vocabulary-bounded collects,
    * ids exactly as written; `readModel(write(m)) == m` structurally,
    * the round-trip WordPieceSpec pins. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    import spark.implicits._
    val pieces = spark.read.parquet(s"$path/pieces")
      .select("piece").as[String].collect().toSet
    val vocab = spark.read.parquet(s"$path/vocab")
      .select("id", "sym").as[(Int, String)]
      .collect().sortBy(_._1).map(_._2).toSeq
    Model(pieces, vocab)
  }

  /** Tokenize against a STORED [[writeModel]] artifact — identical
    * results to [[encode]] BY SHARED CODE (greedy-match semantics
    * cannot drift), one shuffle-free `mapPartitions`; stateless per
    * input frame, composing into `foreachBatch` exactly like
    * [[Bpe.encodeStored]]/[[Unigram.encodeStored]]. */
  def encodeStored(docs: DataFrame, id: Column, text: Column,
                   path: String): DataFrame =
    encode(docs, id, text, readModel(docs.sparkSession, path))
}
