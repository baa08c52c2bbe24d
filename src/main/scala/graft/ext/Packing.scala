package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: documents are concatenated
  * in deterministic `id` order into one notional token stream, and the
  * stream is cut into fixed `budget`-token context windows. Each
  * document gets its absolute token offsets and the range of windows
  * ("bins") it lands in — the bookkeeping a packed-dataset writer needs
  * to emit fixed-length training rows (including which documents
  * straddle a window boundary).
  *
  * The core is a GLOBAL PREFIX SUM, which is where naive Spark goes
  * wrong: `sum().over(Window.orderBy(id))` with no partition key drags
  * the whole corpus through ONE task. This is the scalable two-level
  * formulation:
  *
  *  1. range-repartition by `id` (contiguous ordered ranges, so the
  *     global order is partition 0 ++ partition 1 ++ …) and sort within
  *     each partition;
  *  2. per-partition running sum — a NARROW single-pass `mapPartitions`,
  *     all partitions in parallel. (A `Window.partitionBy(pid)` would be
  *     wrong here: Catalyst can't see that `pid` IS the physical
  *     partition, so it inserts a second full-data hash shuffle.)
  *  3. per-partition totals (one row per partition) prefix-summed on a
  *     PARTITION-COUNT-sized frame — the only single-task window, over
  *     hundreds of rows, not billions — and broadcast-joined back as
  *     each partition's base offset.
  *
  * The ranged frame is persisted: its partition ids come from sampled
  * range boundaries, so both consumers (totals + join left side) must
  * read the SAME materialization — a narrow 4-long-column frame, cheap
  * to cache at any scale. Documents with no tokens are dropped (they
  * occupy no stream position). `id` must be unique (same contract as
  * [[Dedup.minhashSignatures]]).
  */
object Packing {

  def packSequences(df: DataFrame, id: Column, nTokens: Column,
                    budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val ranged = graft.CacheScope.persistTracked(
      df.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
        .where(col("n_tokens") > 0)
        .repartitionByRange(parts, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .as[(Long, Long)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var cum = 0L
          it.map { case (docId, n) => cum += n; (pid, docId, n, cum) }
        }
        .toDF("pid", "doc_id", "n_tokens", "local_cum"))
    // local_cum is monotone within a partition, so max == the total.
    val offsets = ranged.groupBy("pid").agg(max("local_cum").as("ptotal"))
      .withColumn("base", coalesce(
        sum("ptotal").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "base")
    ranged.join(broadcast(offsets), "pid")
      .withColumn("start_off", col("base") + col("local_cum") - col("n_tokens"))
      .withColumn("end_off", col("start_off") + col("n_tokens"))
      // Integral `div`, not `/`: double division loses exactness past
      // 2^53, and a 100 TB corpus has more tokens than that.
      .withColumn("first_bin", expr(s"start_off div ${budget}L"))
      .withColumn("last_bin", expr(s"(end_off - 1L) div ${budget}L"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("end_off"), col("first_bin"), col("last_bin"),
        (col("last_bin") - col("first_bin") + 1).as("n_bins"))
  }

  /** The writer-side view of [[packSequences]]: one row per
    * (document, context window) slice — which token range of the
    * document lands at which offset of which fixed-length window. This
    * is exactly the manifest a packed-dataset writer walks to emit
    * training rows; a document straddling a window boundary appears
    * once per window it touches.
    *
    * Pure per-row arithmetic + an explode over each document's own bin
    * range (avg bins/doc ≈ 1 + doc_tokens/budget) — narrow, no
    * shuffle beyond what [[packSequences]] already did.
    */
  def binSlices(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    packed
      .select(col("doc_id"), col("start_off"), col("end_off"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .withColumn("slice_start",
        greatest(col("start_off"), col("bin") * budget))
      .withColumn("slice_end",
        least(col("end_off"), (col("bin") + 1L) * budget))
      .select(col("bin"), col("doc_id"),
        (col("slice_start") - col("start_off")).as("doc_off"),
        (col("slice_start") - col("bin") * budget).as("bin_off"),
        (col("slice_end") - col("slice_start")).as("len"))
  }

  /** The TRAINER-FACING materialization of a packed layout — the step
    * between [[binSlices]]' bookkeeping and the TfRecord/WebDataset
    * export: each context window becomes one fixed-length row of
    * actual token ids. `packed` is [[packSequences]]' output; `ids`
    * carries each document's tokenized `input_ids` (the [[graft.ext.Bpe]]/
    * [[graft.ext.Unigram]]/[[graft.ext.WordPiece]] encode shape), whose length
    * must equal the `n_tokens` the layout was computed from — a doc
    * missing from `ids`, or an array longer OR shorter than the
    * layout (tokenizer drift between the two passes), raises loudly
    * per offending document instead of silently dropping, truncating,
    * or under-filling windows (the fence costs one extra doc_id-keyed
    * join of the narrow layout frame).
    *
    * Output, one row per bin: `input_ids` (exactly `budget` long —
    * only the stream's final window carries `n_pad` trailing `padId`s),
    * `n_tokens` (real ids), `n_docs`, and `doc_spans` —
    * (doc_id, off, len) per document slice in window order, the
    * attention-reset / loss-masking sidecar every packed-pretraining
    * loader needs. Callers wanting an EOD separator add one to each
    * document's `n_tokens` BEFORE packing and append the EOD id to its
    * `input_ids` — the layout and this materialization stay mechanical.
    *
    * Scale shape: slices join `ids` on a uniform `doc_id` hash (the one
    * corpus-sized exchange), window assembly shuffles rows already cut
    * to ≤ budget tokens keyed by `bin` (uniform by construction — bins
    * are a dense integer range), and per-window order is a
    * `sort_array` over an ≤ budget-sized list, never a window
    * function. Nothing collects; lists are budget-bounded. */
  def materializeBins(packed: DataFrame, ids: DataFrame, budget: Long,
                      padId: Long = 0L): DataFrame = {
    require(budget > 0, "budget must be positive")
    // TWO-SIDED tokenizer-drift fence: every packed doc must appear in
    // `ids` EXACTLY ONCE with EXACTLY the token count the layout was
    // computed from. A one-sided slice-length check would let a doc
    // MISSING from `ids` vanish through the join (under-filled windows
    // whose spans point at the wrong tokens) and a LONGER array
    // silently truncate; a DUPLICATED doc_id would pass a bare length
    // check row-by-row and then duplicate every slice through the
    // join, silently over-filling windows past `budget` (r18 ADVICE)
    // — all three raise loudly per doc_id instead. The duplicate count
    // rides the aggregation that dedups the join's build side, keyed
    // on the same uniform doc_id hash the join shuffles on, so the
    // fence still costs one exchange of the narrow ids frame.
    // size(NULL) is null, so the missing-doc case falls through the
    // `when`s to the error.
    val checked = packed.select(col("doc_id"), col("n_tokens"))
      .join(ids.select(col("doc_id"), col("input_ids"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("__dup"), first("input_ids").as("input_ids")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__dup") > 1, raise_error(concat(
            lit("materializeBins: doc "), col("doc_id"),
            lit(" appears more than once in ids — every doc_id must "),
            lit("carry exactly one tokenized array"))))
          .when(size(col("input_ids")) === col("n_tokens").cast("int"),
            col("input_ids"))
          .otherwise(raise_error(concat(
            lit("materializeBins: input_ids of doc "), col("doc_id"),
            lit(" are missing or do not match the packed layout's "),
            lit("token count — re-pack from the same tokenizer output"))))
          .as("input_ids"))
    val chunk = expr("slice(input_ids, CAST(doc_off + 1 AS INT), " +
      "CAST(len AS INT))")
    val guarded = binSlices(packed, budget)
      .join(checked, "doc_id")
      .select(col("bin"), col("bin_off"), col("doc_id"), col("len"),
        chunk.as("chunk"))
    guarded.groupBy("bin")
      .agg(sort_array(collect_list(struct(col("bin_off"), col("doc_id"),
        col("len"), col("chunk")))).as("sl"))
      .select(col("bin"),
        expr("flatten(transform(sl, s -> s.chunk))").as("toks"),
        expr("transform(sl, s -> struct(s.doc_id AS doc_id, " +
          "s.bin_off AS off, s.len AS len))").as("doc_spans"))
      .select(col("bin"),
        concat(col("toks"), expr(
          s"array_repeat(${padId}L, CAST(${budget}L - size(toks) AS INT))"))
          .as("input_ids"),
        size(col("toks")).cast("long").as("n_tokens"),
        (lit(budget) - size(col("toks"))).cast("long").as("n_pad"),
        size(col("doc_spans")).cast("long").as("n_docs"),
        col("doc_spans"))
  }

  /** Deterministic global shuffle: the training-order step that
    * precedes packing. Each document's position is its rank under
    * `hash60(seed + ":" + id)` (ties broken by id), so the permutation
    * is a pure function of (corpus, seed) — reproducible across runs,
    * engines, and partitionings, and changing the seed is a fresh epoch
    * order with zero state.
    *
    * Same scale shape as [[packSequences]]: a global `row_number()` is
    * a one-task plan, so rank = range-partition by the hash, narrow
    * per-partition ordinals, partition-count base offsets broadcast
    * back.
    */
  def shuffledOrdinal(df: DataFrame, id: Column, seed: String,
                      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val ranged = graft.CacheScope.persistTracked(
      df.select(id.cast("long").as("doc_id"),
          Text.hash60(concat_ws(":", lit(seed), id.cast("long"))).as("h"))
        .repartitionByRange(parts, col("h"), col("doc_id"))
        .sortWithinPartitions("h", "doc_id")
        .as[(Long, Long)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var i = 0L
          it.map { case (docId, h) => i += 1; (pid, docId, h, i) }
        }
        .toDF("pid", "doc_id", "h", "local_rank"))
    val offsets = ranged.groupBy("pid").agg(max("local_rank").as("ptotal"))
      .withColumn("base", coalesce(
        sum("ptotal").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "base")
    ranged.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("h"),
        (col("base") + col("local_rank") - 1L).as("ord"))
  }

  /** Epoch shard layout — the missing step between packing and export:
    * the deterministic global permutation ([[shuffledOrdinal]]) feeds
    * the prefix-sum packer ([[packSequences]]) keyed by `ord` instead
    * of `doc_id`, so documents concatenate in EPOCH order and
    * `first_bin` is the document's trainer shard for that epoch.
    * Changing the seed is a fresh epoch layout with zero state; the
    * whole layout is a pure function of (corpus, seed, budget) —
    * engine-exact, reproducible, re-exportable byte-identically
    * ([[graft.sources.TfRecord.writeEpoch]]).
    *
    * The doc_id rejoin after packing is ord-keyed over the narrow
    * 3-long-column bookkeeping frame — metadata-sized at any corpus
    * scale, and the packer's range partitioning by ord already
    * co-locates one side.
    *
    * Output: (doc_id, ord, n_tokens, start_off, end_off, first_bin,
    * last_bin, n_bins). */
  def epochLayout(df: DataFrame, id: Column, nTokens: Column, seed: String,
                  budget: Long, numParts: Int = 0): DataFrame = {
    val toks = df.select(id.cast("long").as("__did"),
      nTokens.cast("long").as("__nt"))
    val ord = shuffledOrdinal(df.select(id.cast("long").as("doc_id")),
        col("doc_id"), seed, numParts)
      .select(col("doc_id").as("__did"), col("ord"))
    val packed = packSequences(toks.join(ord, "__did"),
      col("ord"), col("__nt"), budget, numParts)
    // packSequences' doc_id column carries the ord key; rejoin doc ids
    packed.select(col("doc_id").as("ord"), col("n_tokens"),
        col("start_off"), col("end_off"), col("first_bin"),
        col("last_bin"), col("n_bins"))
      .join(ord.select(col("__did").as("doc_id"), col("ord")), "ord")
      .select("doc_id", "ord", "n_tokens", "start_off", "end_off",
        "first_bin", "last_bin", "n_bins")
  }
}
