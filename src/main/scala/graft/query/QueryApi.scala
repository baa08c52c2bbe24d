package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's read surface (`DatabaseClient`, postgres.rs:309-383)
  * as DataFrame plan builders. Postgres was the optimizer/executor for
  * these in the reference; here Catalyst is — the keyset-pagination
  * cursors become pushed-down range predicates on the id column, and the
  * `ati/cti ⋈ summaries` FK join stays an equi-join Catalyst can
  * broadcast once the paged side is filtered down.
  *
  * All pages are ordered by id — the clustered-key order the reference
  * documents (ORDER BY ati.id, postgres.rs:100-118).
  */
object QueryApi {

  /** B1/B2 — `query_account`: summaries affecting one account, keyset
    * cursor `from`, ascending or descending (postgres.rs:100-181).
    * Returns the reference row shape (id, block, timestamp, height,
    * summary). */
  def accountTransactions(ati: DataFrame, summaries: DataFrame, account: Column,
                          from: Long, limit: Option[Int], ascending: Boolean): DataFrame = {
    val cursor =
      if (ascending) col("summary") >= from else col("summary") <= from
    val page = ati.where(col("account") === account && cursor)
    val joined = page.join(summaries, page("summary") === summaries("id"))
      .select(summaries("id"), summaries("block"), summaries("timestamp"),
        summaries("height"), summaries("summary"))
    val sorted = joined.orderBy(if (ascending) col("id").asc else col("id").desc)
    limit.fold(sorted)(sorted.limit)
  }

  /** B3 — `query_contract`: composite-key variant (postgres.rs:120-181). */
  def contractTransactions(cti: DataFrame, summaries: DataFrame, index: Long, subindex: Long,
                           from: Long, limit: Option[Int], ascending: Boolean): DataFrame = {
    val cursor =
      if (ascending) col("summary") >= from else col("summary") <= from
    val page = cti.where(col("index") === index && col("subindex") === subindex && cursor)
    val joined = page.join(summaries, page("summary") === summaries("id"))
      .select(summaries("id"), summaries("block"), summaries("timestamp"),
        summaries("height"), summaries("summary"))
    val sorted = joined.orderBy(if (ascending) col("id").asc else col("id").desc)
    limit.fold(sorted)(sorted.limit)
  }

  /** The page's summary-id plan on the account-bucketed mirror: bucket
    * pruning on the `account = ?` literal (only the account's bucket
    * files are read) and top-`limit` by cursor order — orderBy+limit
    * fuse to `TakeOrderedAndProject`, so the plan has ZERO Exchange.
    * Split out of [[accountPageServed]] so ServingPageSpec can assert
    * both properties on the exact plan the serving path executes.
    * `account` must be a LITERAL (any address type the mirror carries —
    * long fixture or 32-byte binary): bucket pruning evaluates the
    * predicate against the bucket hash at planning time, which a
    * non-literal column reference defeats. */
  def accountPageIds(atiMirror: DataFrame, account: Column, from: Long,
                     limit: Int, ascending: Boolean): DataFrame = {
    val cursor =
      if (ascending) col("summary") >= from else col("summary") <= from
    val ord = if (ascending) col("summary").asc else col("summary").desc
    atiMirror.where(col("account") === account && cursor)
      .orderBy(ord).limit(limit)
      .select("summary")
  }

  /** B1/B2 SERVING path over bucketed mirrors — the btree analog of the
    * reference's `<0.5 s` account page (postgres.rs:94-99, served by the
    * m0001 btree): `atiMirror` is bucketed by account and `summariesMirror`
    * by id ([[graft.sources.ServingMirrors]]), so
    *  1. the account+cursor probe ([[accountPageIds]]) reads ONLY the
    *     account's bucket files (bucket pruning on the `account = ?`
    *     literal) with the cursor pushed into the sorted row groups, and
    *  2. the page's ≤`limit` summary ids become a LITERAL `id IN (…)`
    *     predicate on the summaries scan — bucket-pruned AND row-group-
    *     skipped (the mirror is id-sorted), the Spark spelling of the
    *     reference's per-id pkey lookups.
    * EAGER, unlike the other builders here: calling it runs the id job
    * now (two bounded jobs total, like the reference's two index reads).
    * The driver-side id collect is bounded by the PAGE SIZE (≤ `limit`
    * rows, like the nprobe centroid collect in
    * [[graft.ext.Similarity.annIvfIndexedVec]]) — never by the data.
    * ServingPageSpec pins both scans' pruning and zero-Exchange plans,
    * and CORRECTNESS rows b1/b2_served pin equality with
    * [[accountTransactions]]. For the unbounded iterate surface (B4)
    * use [[accountTransactions]]/[[contractTransactions]] — a full-page
    * collect there would be data-sized. */
  def accountPageServed(atiMirror: DataFrame, summariesMirror: DataFrame,
                        account: Column, from: Long, limit: Int,
                        ascending: Boolean): DataFrame = {
    // ati carries at most one row per (account, summary), and every
    // summary id resolves (FK), so ordering the ati side by summary and
    // cutting the page BEFORE the lookup is exactly join-order-limit.
    val ids = accountPageIds(atiMirror, account, from, limit, ascending)
      .collect().map(_.getLong(0)).toSeq
    servedLookup(summariesMirror, ids, limit, ascending)
  }

  /** The contract-side id plan — same shape as [[accountPageIds]] on
    * the cti mirror (bucketed by the leading composite key `index`):
    * bucket pruning on the `index = ?` literal, zero Exchange. */
  def contractPageIds(ctiMirror: DataFrame, index: Long, subindex: Long,
                      from: Long, limit: Int, ascending: Boolean): DataFrame = {
    val cursor =
      if (ascending) col("summary") >= from else col("summary") <= from
    val ord = if (ascending) col("summary").asc else col("summary").desc
    ctiMirror.where(col("index") === index && col("subindex") === subindex &&
        cursor)
      .orderBy(ord).limit(limit)
      .select("summary")
  }

  /** B3 SERVING path — [[accountPageServed]]'s contract twin
    * (postgres.rs:120-181 over the cti PK btree), probing the shared
    * id-bucketed summaries mirror with the page's literal id set. Same
    * eager two-job contract; ServingPageSpec pins the plans. */
  def contractPageServed(ctiMirror: DataFrame, summariesMirror: DataFrame,
                         index: Long, subindex: Long, from: Long, limit: Int,
                         ascending: Boolean): DataFrame = {
    val ids = contractPageIds(ctiMirror, index, subindex, from, limit,
      ascending).collect().map(_.getLong(0)).toSeq
    servedLookup(summariesMirror, ids, limit, ascending)
  }

  /** The shared page lookup: a LITERAL `id IN (…)` probe of the
    * id-bucketed, id-sorted summaries mirror — bucket-pruned and
    * row-group-skipped. The id dedup guards the serving path against a
    * REPLAYED mirror generation (the
    * [[graft.sources.BucketedMirror.appendOnce]] crash window commits
    * data files before the marker, so a replay can duplicate one
    * batch's rows until compaction): duplicate rows are byte-identical,
    * and because the mirror is BUCKETED by id the aggregation's
    * required distribution is already satisfied by the scan — the
    * dedup adds a HashAggregate but NO Exchange, preserving the
    * zero-Exchange page plan ServingPageSpec pins. The final
    * limit(limit) fuses the output order into TakeOrderedAndProject
    * (no Sort exchange). */
  private def servedLookup(summariesMirror: DataFrame, ids: Seq[Long],
                           limit: Int, ascending: Boolean): DataFrame =
    summariesMirror.where(col("id").isin(ids: _*))
      .select(col("id"), col("block"), col("timestamp"), col("height"),
        col("summary"))
      .dropDuplicates("id")
      .orderBy(if (ascending) col("id").asc else col("id").desc)
      .limit(limit)

  /** B5 — row decode: project fields out of the JSON envelope, SILENTLY
    * DROPPING rows whose summary fails to parse — the reference's
    * `construct_row` is applied via `filter_map`, so undecodable rows
    * vanish from every page instead of erroring (postgres.rs:387-391,
    * 333, 360). Validity = the typed envelope parse succeeds AND lands
    * in a known variant (serde's `Either` deserialize fails on both
    * malformed JSON and unknown variants — both are dropped). */
  def decodeRows(summaries: DataFrame): DataFrame = {
    // One typed parse expression (the old per-field get_json_object
    // chain string-parsed each document once per projected field).
    // Catalyst's OptimizeJsonExprs splits the validity predicate into
    // schema-pruned parses pushed into the scan's DataFilters, so
    // undecodable rows are dropped at scan time and only survivors pay
    // the full-schema parse. A row is kept iff the typed parse lands in
    // a known variant — exactly the reference's
    // `filter_map(|r| from_value::<Either<L,R>>(r).ok())`: malformed
    // JSON and unknown variants both vanish from the page rather than
    // erroring (contrast the strict WRITE-path policy below).
    val env = from_json(col("summary"), graft.model.Schemas.summaryEnvelope)
    summaries.select(col("id"), env.as("env"))
      .where(col("env.Left").isNotNull || col("env.Right").isNotNull)
      .select(col("id"),
        col("env.Left.k").cast("string").as("left_k"),
        col("env.Right.k").cast("string").as("right_k"))
  }

  /** Optimizer fence: value-identical to `c` (monotonically_increasing_id
    * is always >= 0, so the branch always takes `c`), but the
    * nondeterminism flag stops PushPredicateThroughNonJoin and
    * CollapseProject from inlining the aliased expression into
    * downstream filters/projections. Used by the FAILFAST decoders
    * ([[decodeRowsStrict]], [[decodeRowsDeep]]) where the guard filters
    * referencing the parsed envelope were being pushed below the parse
    * projection with the parse SUBSTITUTED into each guard — every row
    * paid the full envelope parse 3-4 times (FAILFAST parses cannot be
    * schema-pruned by OptimizeJsonExprs without changing abort
    * semantics, so each copy was a full parse; measured 3.5 s → 2.1 s
    * at sf0.1 going to parse-once). `rand()`-comparison fences do NOT
    * work here: the optimizer folds full-range rand comparisons away.
    *
    * The cost is symmetric: the fence also blocks CALLER predicates
    * from pushing down through the decode — fine for these two, which
    * are WRITE-path interpreters consumed whole-batch per ingested
    * block (the reference aborts ingestion on any undecodable row, so
    * every row is interpreted; there is no selective probe to push).
    * The read-path [[decodeRows]] stays unfenced on purpose: its
    * PERMISSIVE validity filter pushing into the scan IS the plan
    * (rows die at scan time; PlanSpec pins the pushed DataFilters). */
  private def parseOnce(c: Column): Column =
    when(monotonically_increasing_id() >= -1, c)

  /** B5 strict variant — typed decode of the summary envelope through a
    * real `StructType` ([[graft.model.Schemas.summaryEnvelope]]) instead
    * of per-field `get_json_object`, with the reference's hard-stop
    * policy (lib.rs:307-311): malformed JSON aborts the job (`from_json`
    * FAILFAST), and a structurally valid envelope that is NEITHER Left
    * nor Right (unknown variant) aborts via `raise_error` — data the
    * engine cannot interpret must never be silently dropped on the
    * WRITE/interpret path (contrast [[decodeRows]], the read-path
    * filter_map drop). The guard is a FILTER (`assert_true`), not an
    * output column: a filter survives downstream column pruning, so the
    * hard-stop fires even when a caller selects only `left_k` —
    * an output-column guard would be silently pruned away with it. */
  def decodeRowsStrict(summaries: DataFrame): DataFrame = {
    val env = parseOnce(from_json(col("summary"),
      graft.model.Schemas.summaryEnvelope, Map("mode" -> "FAILFAST")))
    summaries.select(col("id"), env.as("env"))
      .where(assert_true(
        col("env.Left").isNotNull || col("env.Right").isNotNull,
        concat(lit("unknown summary variant at id "),
          col("id").cast("string"))).isNull)
      .select(col("id"),
        when(col("env.Left").isNotNull, lit("Left"))
          .otherwise(lit("Right"))
          .as("variant"),
        col("env.Left.k").as("left_k"),
        col("env.Right.k").as("right_k"))
  }

  /** B5 deep variant — strict decode of the REFERENCE-SHAPED envelope
    * ([[graft.model.Schemas.summaryEnvelopeDeep]]: nested
    * `BlockItemSummary` with details type tag, sender, and events array)
    * with BOTH hard-stop policies of the reference's interpret path:
    *  - malformed JSON / type-mismatched fields abort (FAILFAST parse);
    *  - an envelope that is neither Left nor Right aborts
    *    (unknown VARIANT, lib.rs:307-311); and
    *  - a Left whose `details.type` tag is outside
    *    [[graft.model.Schemas.KnownDetailsTypes]] aborts — the
    *    `Upward::Unknown` case `key_update_account` refuses to guess at
    *    (main.rs:686-700): data the engine cannot interpret must never
    *    be silently projected as nulls.
    * Both guards are FILTERS (`assert_true`), so they survive column
    * pruning when a caller selects a single nested field (same design
    * note as [[decodeRowsStrict]]). Output: nested projections — the
    * sender/type/events fields the reference's key-update scan reads. */
  def decodeRowsDeep(summaries: DataFrame): DataFrame = {
    val env = parseOnce(from_json(col("summary"),
      graft.model.Schemas.summaryEnvelopeDeep, Map("mode" -> "FAILFAST")))
    summaries.select(col("id"), env.as("env"))
      .where(assert_true(
        col("env.Left").isNotNull || col("env.Right").isNotNull,
        concat(lit("unknown summary variant at id "),
          col("id").cast("string"))).isNull)
      // isInCollection over a NULL type tag yields null, and assert_true
      // aborts on anything not true — a Left with missing/unknown details
      // both stop here
      .where(assert_true(
        col("env.Left").isNull ||
          col("env.Left.details.type")
            .isInCollection(graft.model.Schemas.KnownDetailsTypes),
        concat(lit("unknown block item details type at id "),
          col("id").cast("string"))).isNull)
      .select(col("id"),
        when(col("env.Left").isNotNull, lit("Left"))
          .otherwise(lit("Right"))
          .as("variant"),
        col("env.Left.index").as("tx_index"),
        col("env.Left.details.type").as("details_type"),
        col("env.Left.details.sender").as("sender"),
        when(col("env.Left").isNotNull,
          size(coalesce(col("env.Left.details.events"),
            array().cast("array<struct<tag:string,amount:string,to:string>>"))))
          .as("n_events"),
        // get(), not getItem: ANSI mode makes an out-of-bounds index an
        // ERROR, and an empty events array is a legal summary
        get(col("env.Left.details.events"), lit(0)).getField("tag")
          .as("first_event_tag"),
        col("env.Right.tag").as("protocol_tag"),
        col("env.Right.amount").as("protocol_amount"))
  }

  /** B6 — most-recent-k summaries per account, for all accounts at once
    * (the generalization of wallet-proxy-indexer/README.md:113-122):
    * window `row_number` over id desc, one shuffle on account.
    *
    * HOT-ACCOUNT bound: a window partition is one key, and an exchange
    * hot account at 100x would be the classic skewed-window stall — but
    * the `rn <= k` predicate lets Catalyst's InferWindowGroupLimit plan
    * a PARTIAL WindowGroupLimit before the exchange and a Final one
    * after (pinned in PlanSpec): each map task forwards at most k rows
    * per account, so the hot account's reducer receives <= k x
    * #map-partitions rows regardless of how many rows the account has.
    * That IS the salted two-phase top-k (salt = input partition), planned
    * by the optimizer instead of hand-rolled; QueryApiSpec drives a
    * fixture where one account owns >80% of all rows. */
  def topKPerAccount(ati: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("account")).orderBy(col("summary").desc)
    ati.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** B7 — change-feed page: ascending cursor poll keeping only rows not
    * sent by the account itself ("incoming", monitor-postgres.rs:44-98;
    * sender is null for protocol events → kept). */
  def changeFeed(ati: DataFrame, summariesWithSender: DataFrame, account: Column,
                 afterId: Long, pageSize: Int): DataFrame = {
    val page = ati.where(col("account") === account && col("summary") > afterId)
    val sws = summariesWithSender
    page.join(sws, page("summary") === sws("id"))
      .where(sws("sender").isNull || sws("sender") =!= account)
      .select(sws("id"), sws("block"), sws("timestamp"), sws("height"),
        sws("summary"), sws("sender"))
      .orderBy(col("id").asc)
      .limit(pageSize)
  }

  /** B12 — account page restricted to a height or timestamp range (the
    * queries migration m0003 optimizes; m0003-...sql:1-12). */
  def accountTransactionsInRange(ati: DataFrame, summaries: DataFrame, account: Column,
                                 lo: Column, hi: Column, rangeCol: String): DataFrame = {
    val page = ati.where(col("account") === account)
    page.join(summaries, page("summary") === summaries("id"))
      .where(summaries(rangeCol).between(lo, hi))
      .select(summaries("id"), summaries("block"), summaries("timestamp"),
        summaries("height"), summaries("summary"))
      .orderBy(col("id").asc)
  }
}
