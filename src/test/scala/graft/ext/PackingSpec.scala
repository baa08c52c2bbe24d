package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def lens = Seq(
    1L -> 100L, 2L -> 400L, 3L -> 50L, 4L -> 600L, 5L -> 0L,
    6L -> 12L, 7L -> 512L, 8L -> 1L, 9L -> 1023L, 10L -> 3L)

  private def docs = lens.toDF("doc_id", "n_tokens")

  // The single-machine truth: running offsets in doc_id order.
  private def expected(budget: Long) = {
    var off = 0L
    lens.filter(_._2 > 0).sortBy(_._1).map { case (id, n) =>
      val start = off; off += n
      val first = start / budget
      val last = (off - 1) / budget
      (id, n, start, off, first, last, last - first + 1)
    }
  }

  test("offsets form one contiguous stream and bins match the budget math") {
    val got = Packing.packSequences(docs, $"doc_id", $"n_tokens", budget = 512)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == expected(512L))
  }

  test("result is independent of the partition count") {
    val twoPart = Packing
      .packSequences(docs.repartition(7), $"doc_id", $"n_tokens",
        budget = 512, numParts = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val manyPart = Packing
      .packSequences(docs, $"doc_id", $"n_tokens", budget = 512,
        numParts = 16)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(twoPart == expected(512L))
    assert(manyPart == expected(512L))
  }

  test("binSlices partitions every bin and every document exactly") {
    val budget = 512L
    val packed = Packing.packSequences(docs, $"doc_id", $"n_tokens", budget)
    val slices = Packing.binSlices(packed, budget)
      .as[(Long, Long, Long, Long, Long)] // bin, doc_id, doc_off, bin_off, len
      .collect().toSeq
    val total = lens.filter(_._2 > 0).map(_._2).sum
    // slices tile the stream: lengths sum to the stream, no empty slices
    assert(slices.map(_._5).sum == total)
    assert(slices.forall(_._5 > 0))
    // each document's slices cover [0, n_tokens) contiguously
    val byDoc = slices.groupBy(_._2)
    lens.filter(_._2 > 0).foreach { case (id, n) =>
      val s = byDoc(id).sortBy(_._3)
      assert(s.head._3 == 0L && s.map(_._5).sum == n)
      assert(s.sliding(2).forall {
        case Seq(a, b) => a._3 + a._5 == b._3
        case _ => true
      })
    }
    // each full bin holds exactly `budget` tokens (last bin may be short)
    val byBin = slices.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, tokens) =>
      if (bin < lastBin) assert(tokens == budget, s"bin $bin holds $tokens")
    }
  }

  test("shuffledOrdinal is a permutation, seed-determined, partition-independent") {
    val ids = (0L until 500L).toDF("doc_id")
    def run(seed: String, parts: Int) =
      Packing.shuffledOrdinal(ids, $"doc_id", seed, numParts = parts)
        .select("doc_id", "ord")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = run("epoch0", 4)
    // every position 0..n-1 appears exactly once
    assert(a.map(_._2).sorted == (0L until 500L))
    // same seed, different partitioning → identical order
    assert(run("epoch0", 13) == a)
    // a different seed is a genuinely different permutation
    assert(run("epoch1", 4) != a)
  }

  test("epochLayout: packs the permuted stream, seed is the only knob") {
    def run(seed: String, parts: Int) =
      Packing.epochLayout(docs, $"doc_id", $"n_tokens", seed,
          budget = 512, numParts = parts)
        .select("doc_id", "ord", "n_tokens", "start_off", "end_off",
          "first_bin", "last_bin", "n_bins")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._2).toSeq
    val a = run("e1", 4)
    // single-machine truth: ord from shuffledOrdinal, then the same
    // running-offset arithmetic as packSequences over ord order
    val ord = Packing.shuffledOrdinal((1L to 10L).toDF("doc_id"),
        $"doc_id", "e1", numParts = 4)
      .select("doc_id", "ord").as[(Long, Long)].collect().toMap
    var off = 0L
    val want = lens.filter(_._2 > 0).sortBy(p => ord(p._1)).map { case (id, n) =>
      val start = off; off += n
      (id, ord(id), n, start, off, start / 512, (off - 1) / 512,
        (off - 1) / 512 - start / 512 + 1)
    }
    assert(a == want)
    // the zero-token doc holds an ordinal but packs nothing
    assert(!a.exists(_._1 == 5L) && ord.contains(5L))
    // partition-count independent; a new seed is a new layout
    assert(run("e1", 13) == a)
    assert(run("e2", 4) != a)
  }

  test("no global single-partition window over the document frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Packing
      .packSequences(docs, $"doc_id", $"n_tokens", budget = 512)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    // The ONLY Window is the partition-count-sized base-offset prefix
    // sum, and it sits above the per-pid aggregate — one row per
    // partition — never above the raw doc rows. The per-doc running sum
    // is a narrow mapPartitions, not a Window at all.
    assert(windows.size == 1, plan.toString)
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        "global window over non-aggregated rows:\n" + plan)
    }
  }

  test("materializeBins: windows hold the exact ids, only the tail pads") {
    // docs 1..3 of 5/3/4 tokens at budget 6: stream = d1[1..5] d2[1..3]
    // d3[1..4]; bin 0 = d1 tokens 1..5 + d2 token 1, bin 1 = d2 tokens
    // 2..3 + d3 tokens 1..4 — full; no bin 2
    val toks = Seq(1L -> 5L, 2L -> 3L, 3L -> 4L).toDF("doc_id", "n_tokens")
    val ids = toks.select($"doc_id",
      expr("transform(sequence(1, CAST(n_tokens AS INT)), " +
        "t -> doc_id * 100L + CAST(t AS BIGINT))").as("input_ids"))
    val packed = Packing.packSequences(toks, $"doc_id", $"n_tokens", 6L)
    val out = Packing.materializeBins(packed, ids, 6L, padId = -1L)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 2)
    assert(out(0) == ((0L, Seq(101L, 102L, 103L, 104L, 105L, 201L),
      6L, 0L, 2L)))
    assert(out(1) == ((1L, Seq(202L, 203L, 301L, 302L, 303L, 304L),
      6L, 0L, 2L)))
    // a short final window pads with padId and prices the padding
    val toks2 = Seq(1L -> 4L).toDF("doc_id", "n_tokens")
    val ids2 = toks2.select($"doc_id",
      expr("transform(sequence(1, 4), t -> CAST(t AS BIGINT))")
        .as("input_ids"))
    val tail = Packing.materializeBins(
        Packing.packSequences(toks2, $"doc_id", $"n_tokens", 6L),
        ids2, 6L, padId = -1L)
      .collect().map(r => (r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
    assert(tail.toSeq == Seq((Seq(1L, 2L, 3L, 4L, -1L, -1L), 4L, 2L)))
    // doc_spans carry the loss-mask sidecar in window order
    val spans = Packing.materializeBins(packed, ids, 6L)
      .orderBy("bin").select("doc_spans")
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))))
    assert(spans(0).toSeq == Seq((1L, 0L, 5L), (2L, 5L, 1L)))
    assert(spans(1).toSeq == Seq((2L, 0L, 2L), (3L, 2L, 4L)))
    // tokenizer drift raises loudly in ALL THREE shapes: shorter
    // arrays, LONGER arrays (which a slice-length check alone would
    // silently truncate), and a doc missing from ids entirely (which
    // an inner join would silently drop)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def raises(ids2: org.apache.spark.sql.DataFrame): Unit = {
      val ex = intercept[Exception] {
        Packing.materializeBins(packed, ids2, 6L).collect()
      }
      assert(msgs(ex).exists(_.contains("materializeBins")), msgs(ex))
    }
    raises(toks.select($"doc_id",
      expr("transform(sequence(1, CAST(n_tokens AS INT) - 1), " +
        "t -> CAST(t AS BIGINT))").as("input_ids")))
    raises(toks.select($"doc_id",
      expr("transform(sequence(1, CAST(n_tokens AS INT) + 1), " +
        "t -> CAST(t AS BIGINT))").as("input_ids")))
    raises(ids.where($"doc_id" =!= 2L))
    // ... and the FOURTH shape (r18 ADVICE): a DUPLICATED doc_id,
    // whose rows each pass a bare length check but would duplicate
    // every slice through the join and over-fill windows past budget
    raises(ids.union(ids.where($"doc_id" === 2L)))
    graft.CacheScope.release()
  }

  test("materializeBins property: equals an independent straight-line packer") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // independent reference: walk the concatenated stream in plain
    // Scala, cutting at every budget boundary — no shared arithmetic
    // with the operator (which goes through the distributed prefix sum
    // and slice algebra)
    def reference(lens: Seq[(Long, Long)], budget: Int,
        padId: Long): Seq[(Long, Seq[Long], Long, Seq[(Long, Long, Long)])] = {
      val stream = lens.filter(_._2 > 0).sortBy(_._1).flatMap {
        case (id, n) => (1L to n).map(t => (id, id * 100L + t))
      }
      stream.grouped(budget).zipWithIndex.map { case (chunk, bin) =>
        val ids = chunk.map(_._2)
        val spans = chunk.zipWithIndex.groupBy(_._1._1).toSeq
          .map { case (id, xs) =>
            (id, xs.head._2.toLong, xs.length.toLong) }
          .sortBy(_._2)
        (bin.toLong, ids ++ Seq.fill(budget - ids.length)(padId),
          ids.length.toLong, spans)
      }.toSeq
    }
    val lensGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 13L)))
      .map(_.zipWithIndex.map { case (l, i) => (i.toLong, l) })
    val prop = Prop.forAll(lensGen, Gen.chooseNum(2, 9)) { (lens, budget) =>
      val toks = lens.toDF("doc_id", "n_tokens")
      val ids = toks.where($"n_tokens" > 0).select($"doc_id",
        expr("transform(sequence(1, CAST(n_tokens AS INT)), " +
          "t -> doc_id * 100L + CAST(t AS BIGINT))").as("input_ids"))
      val got = Packing.materializeBins(
          Packing.packSequences(toks, $"doc_id", $"n_tokens", budget),
          ids, budget, padId = -7L)
        .orderBy("bin").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](5)
            .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq))
      graft.CacheScope.release()
      got.toSeq == reference(lens, budget, -7L)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // straight-line per-item BFD: items by (len desc, id), each into the
  // open bin with the smallest remaining capacity >= len, capacity
  // ties to the lowest bin id — the operator's documented tie-breaks,
  // but none of its histogram/range-group machinery
  private def refBfd(lens: Seq[(Long, Long)],
                     budget: Long): Map[Long, Long] = {
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable.Map.empty[Long, Long]
    lens.sortBy { case (id, l) => (-l, id) }.foreach { case (id, l) =>
      val fits = rem.zipWithIndex.filter(_._1 >= l)
      if (fits.isEmpty) { rem += (budget - l); out(id) = rem.size - 1L }
      else {
        val bi = fits.minBy { case (c, i) => (c, i) }._2
        rem(bi) -= l; out(id) = bi.toLong
      }
    }
    out.toMap
  }

  // sequential document-atomic next-fit in id order — the naive
  // alternative packBestFit exists to beat; returns total pad tokens
  private def refNextFitPad(lens: Seq[(Long, Long)],
                            budget: Long): Long = {
    var bins = 0L; var room = 0L
    lens.sortBy(_._1).foreach { case (_, l) =>
      if (l > room) { bins += 1; room = budget }
      room -= l
    }
    bins * budget - lens.map(_._2).sum
  }

  private def bfdCollect(lens: Seq[(Long, Long)], budget: Long,
                         parts: Int = 0): Map[Long, Long] = {
    val got = Packing.packBestFit(lens.toDF("doc_id", "n_tokens"),
        $"doc_id", $"n_tokens", budget, parts)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    graft.CacheScope.release()
    got
  }

  test("packBestFit: hand fixture, invariants, exact straight-line match") {
    // budget 10, lens 6,6,4,4,3,3,2 — BFD by hand: [6,4] [6,4] [3,3,2]
    val hand = Seq(0L -> 6L, 1L -> 6L, 2L -> 4L, 3L -> 4L,
      4L -> 3L, 5L -> 3L, 6L -> 2L)
    val got = bfdCollect(hand, 10L)
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 2L))
    // pseudo-random lengths: distributed result == straight-line BFD,
    // independent of the partition count
    val lens = (0L until 300L).map(i => (i, i * 37 % 97 + 1))
    val ref = refBfd(lens, 128L)
    val a = bfdCollect(lens, 128L, parts = 3)
    assert(a === ref)
    assert(bfdCollect(lens, 128L, parts = 7) === ref)
    // invariants: every doc exactly once, no bin over budget, dense ids
    val loads = lens.groupMapReduce(kv => a(kv._1))(_._2)(_ + _)
    assert(a.keySet === lens.map(_._1).toSet)
    assert(loads.values.forall(_ <= 128L))
    assert(loads.keySet === (0L until loads.size.toLong).toSet)
  }

  test("packBestFit: padding beats sequential atomic packing on skew") {
    // skewed mix: every long doc arrives BEFORE the tiny ones — the
    // shape where id-order next-fit strands a 38-token hole behind
    // each long doc that BFD fills with the tinies
    val lens = (0L until 240L).map(i =>
      (i, if (i < 120) 90L else i % 13 + 1))
    val a = bfdCollect(lens, 128L)
    val loads = lens.groupMapReduce(kv => a(kv._1))(_._2)(_ + _)
    val bfdPad = loads.size * 128L - lens.map(_._2).sum
    assert(bfdPad <= refNextFitPad(lens, 128L))
    assert(bfdPad < refNextFitPad(lens, 128L)) // strictly, on this skew
  }

  test("materializeAtomicBins: whole docs per window, spans, tail pads") {
    // the hand BFD fixture: budget 10, lens 6,6,4,4,3,3,2 →
    // bins [6,4] [6,4] [3,3,2]; ids are the closed form doc_id·100+t
    val lens = Seq(0L -> 6L, 1L -> 6L, 2L -> 4L, 3L -> 4L,
      4L -> 3L, 5L -> 3L, 6L -> 2L)
    val toks = lens.toDF("doc_id", "n_tokens")
    val ids = toks.select($"doc_id",
      expr("transform(sequence(1, CAST(n_tokens AS INT)), " +
        "t -> doc_id * 100L + CAST(t AS BIGINT))").as("input_ids"))
    val assign = Packing.packBestFit(toks, $"doc_id", $"n_tokens", 10L)
    val out = Packing.materializeAtomicBins(assign, ids, 10L, padId = -1L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        r.getSeq[org.apache.spark.sql.Row](5)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))))
    assert(out.length == 3)
    assert(out(0) == ((0L, Seq(1L, 2L, 3L, 4L, 5L, 6L,
      201L, 202L, 203L, 204L), 10L, 0L, 2L, Seq((0L, 0L, 6L), (2L, 6L, 4L)))))
    assert(out(1) == ((1L, Seq(101L, 102L, 103L, 104L, 105L, 106L,
      301L, 302L, 303L, 304L), 10L, 0L, 2L, Seq((1L, 0L, 6L), (3L, 6L, 4L)))))
    assert(out(2) == ((2L, Seq(401L, 402L, 403L, 501L, 502L, 503L,
      601L, 602L, -1L, -1L), 8L, 2L, 3L,
      Seq((4L, 0L, 3L), (5L, 3L, 3L), (6L, 6L, 2L)))))
    // the shared four-shape drift fence is wired: a duplicated doc_id
    // raises through the atomic path too
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Packing.materializeAtomicBins(assign,
        ids.union(ids.where($"doc_id" === 2L)), 10L).collect()
    }
    assert(msgs(ex).exists(_.contains("materializeAtomicBins")), msgs(ex))
    // ... and a MISMATCHED materialization budget (assignment packed
    // at 10, materialized at 5) raises instead of silently emitting
    // longer-than-budget rows with negative n_pad
    val ex2 = intercept[Exception] {
      Packing.materializeAtomicBins(assign, ids, 5L).collect()
    }
    assert(msgs(ex2).exists(_.contains("more than the 5-token budget")),
      msgs(ex2))
    graft.CacheScope.release()
  }

  test("packBestFit: an oversized document raises loudly") {
    val ex = intercept[Exception] {
      bfdCollect(Seq(1L -> 5L, 2L -> 11L), 10L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("packBestFit")), msgs(ex))
    graft.CacheScope.release()
  }

  test("packBestFit: a byte-scale budget misuse hits the histogram " +
    "bound loudly (VERDICT r19 #4)") {
    import spark.implicits._
    // byte-packing shape: a huge budget and near-unique "lengths" —
    // the histogram degenerates toward one row per document, which
    // must raise (routing to the splitting packer), never silently
    // collect an unbounded histogram to the driver
    val docs = (1L to 64L).map(i => (i, 1000L + i * 7L))
    val ex = intercept[IllegalArgumentException] {
      Packing.packBestFit(docs.toDF("doc_id", "n_tokens"),
        $"doc_id", $"n_tokens", budget = 1000000000L,
        maxDistinctLengths = 16)
    }
    assert(ex.getMessage.contains("distinct token lengths"), ex.getMessage)
    assert(ex.getMessage.contains("packSequences"), ex.getMessage)
    graft.CacheScope.release()
    // the same corpus under a cap that holds packs normally
    val ok = Packing.packBestFit(docs.toDF("doc_id", "n_tokens"),
      $"doc_id", $"n_tokens", budget = 1000000000L,
      maxDistinctLengths = 64)
    assert(ok.count() === 64)
    graft.CacheScope.release()
    // the repo's Int.MaxValue "no cap" sentinel must not wrap the
    // limit negative (saturating +1)
    val unc = Packing.packBestFit(docs.toDF("doc_id", "n_tokens"),
      $"doc_id", $"n_tokens", budget = 1000000000L,
      maxDistinctLengths = Int.MaxValue)
    assert(unc.count() === 64)
    graft.CacheScope.release()
  }
}
