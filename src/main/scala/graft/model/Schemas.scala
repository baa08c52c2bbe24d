package graft.model

import org.apache.spark.sql.types._

/** Schemas for the five relational tables of the reference engine
  * (reference: `wallet-proxy-indexer/resources/m0001-initial.sql`,
  * `m0002-accounts-public-key-bindings.sql`; see SURVEY.md §1.2).
  *
  * The reference stores these in Postgres; this engine derives them as
  * DataFrames (parquet mirrors partitioned for scale + JDBC serving sink).
  *
  * Account/address representation is kept generic: the Concordium wire
  * format is a 32-byte address (`BinaryType`); the synthetic test feed
  * uses `LongType` ids. All ingest operators are structural (explode /
  * join / agg by column name) and work for either.
  */
object Schemas {

  /** `summaries` — one row per transaction outcome or protocol event
    * (m0001-initial.sql:2-9). `summary` is the `{"Left":…}|{"Right":…}`
    * JSON envelope (main.rs:99-109). */
  def summaries(addressType: DataType = BinaryType): StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("block", StringType, nullable = false), // hex block hash
    StructField("timestamp", LongType, nullable = false), // ms since epoch
    StructField("height", LongType, nullable = false),
    StructField("summary", StringType, nullable = false)
  ))

  /** `ati` — account-transaction index (m0001-initial.sql:12-20). */
  def ati(addressType: DataType = BinaryType): StructType = StructType(Seq(
    StructField("account", addressType, nullable = false),
    StructField("summary", LongType, nullable = false)
  ))

  /** `cti` — contract-transaction index (m0001-initial.sql:23-31). */
  val cti: StructType = StructType(Seq(
    StructField("index", LongType, nullable = false),
    StructField("subindex", LongType, nullable = false),
    StructField("summary", LongType, nullable = false)
  ))

  /** `cis2_tokens` — running token supply (m0001-initial.sql:34-44).
    * `total_supply` is NUMERIC(80,0) in the reference — exceeds Spark's
    * Decimal(38), so it is carried as a decimal string and summed with
    * [[graft.functions.U256]] (BigInt aggregator). */
  val cis2Tokens: StructType = StructType(Seq(
    StructField("index", LongType, nullable = false),
    StructField("subindex", LongType, nullable = false),
    StructField("token_id", StringType, nullable = false),
    StructField("total_supply", StringType, nullable = false)
  ))

  /** `account_public_key_bindings` (m0002-...sql:2-15). */
  def bindings(addressType: DataType = BinaryType): StructType = StructType(Seq(
    StructField("address", addressType, nullable = false),
    StructField("public_key", StringType, nullable = false),
    StructField("credential_index", IntegerType, nullable = false),
    StructField("key_index", IntegerType, nullable = false),
    StructField("is_simple_account", BooleanType, nullable = false)
  ))

  /** Input feed schema — the A1/A2 shape of FIXTURES.md: one row per
    * block item (user transaction) or special outcome, already enriched
    * (what `on_finalized_block` assembles, main.rs:786-861). */
  def blockFeed(addressType: DataType = BinaryType): StructType = StructType(Seq(
    StructField("height", LongType, nullable = false),
    StructField("seq_in_block", IntegerType, nullable = false),
    StructField("block_hash", StringType, nullable = false),
    StructField("block_time_ms", LongType, nullable = false),
    StructField("payload_json", StringType, nullable = false),
    StructField("is_special", BooleanType, nullable = false),
    StructField("sender", addressType, nullable = true),
    StructField("affected_accounts", ArrayType(addressType), nullable = false),
    StructField("affected_contracts", ArrayType(StructType(Seq(
      StructField("index", LongType), StructField("subindex", LongType)))), nullable = false),
    StructField("cis2_events", ArrayType(StructType(Seq(
      StructField("index", LongType), StructField("subindex", LongType),
      StructField("token_id", StringType), StructField("kind", StringType),
      StructField("amount", StringType)))), nullable = false),
    StructField("key_bindings", ArrayType(StructType(Seq(
      StructField("credential_index", IntegerType), StructField("key_index", IntegerType),
      StructField("public_key", StringType), StructField("is_simple_account", BooleanType)))),
      nullable = true)
  ))

  /** The `{"Left":…}|{"Right":…}` summary-envelope payload as a REAL
    * struct schema for interpreted-field access (SURVEY §7.4 item 7).
    * The reference round-trips the full SDK JSON and HARD-FAILS on data
    * it cannot interpret (`SummaryRow::new` → `UnknownData`,
    * wallet-proxy-indexer/src/lib.rs:307-311) — the strict decode path
    * ([[graft.query.QueryApi.decodeRowsStrict]]) mirrors that with
    * `from_json` in FAILFAST mode plus an unknown-variant `raise_error`
    * guard. Interpreted fields here cover the synthetic feed's payload
    * (`{"k": n}`); a production deployment would widen the two structs
    * to the SDK's `BlockItemSummary` / `SpecialTransactionOutcome`
    * shapes — the policy machinery is independent of the field list. */
  val summaryEnvelope: StructType = StructType(Seq(
    StructField("Left", StructType(Seq(
      StructField("k", LongType, nullable = true))), nullable = true),
    StructField("Right", StructType(Seq(
      StructField("k", LongType, nullable = true))), nullable = true)
  ))

  /** The REFERENCE-SHAPED deep envelope: `Left` carries a
    * `BlockItemSummary` (index, energyCost, hash, details with a serde
    * `type` tag, sender, cost, and an events array — the layout
    * `DatabaseSummaryEntry` round-trips, postgres.rs:17-28, and
    * `key_update_account` pattern-matches on, main.rs:686-700), `Right`
    * a `SpecialTransactionOutcome` (serde `tag`-keyed protocol event).
    * The event/effect field lists here are representative, not the full
    * SDK union — widening them is mechanical column addition; the policy
    * machinery (FAILFAST parse, unknown-variant and unknown-details-type
    * hard stops, nested projection pruning) is what
    * [[graft.query.QueryApi.decodeRowsDeep]] + DeepEnvelopeSpec pin. */
  val summaryEnvelopeDeep: StructType = {
    val event = StructType(Seq(
      StructField("tag", StringType, nullable = true),
      StructField("amount", StringType, nullable = true),
      StructField("to", StringType, nullable = true)))
    StructType(Seq(
      StructField("Left", StructType(Seq(
        StructField("index", LongType, nullable = true),
        StructField("energyCost", LongType, nullable = true),
        StructField("hash", StringType, nullable = true),
        StructField("details", StructType(Seq(
          StructField("type", StringType, nullable = true),
          StructField("cost", StringType, nullable = true),
          StructField("sender", StringType, nullable = true),
          StructField("events", ArrayType(event), nullable = true))),
          nullable = true))), nullable = true),
      StructField("Right", StructType(Seq(
        StructField("tag", StringType, nullable = true),
        StructField("account", StringType, nullable = true),
        StructField("amount", StringType, nullable = true))), nullable = true)))
  }

  /** The details `type` tags the reference interprets
    * (`BlockItemSummaryDetails`: AccountTransaction / AccountCreation /
    * Update, main.rs:687-696); anything else is the `Upward::Unknown`
    * case the write path must hard-stop on (lib.rs:307-311). */
  val KnownDetailsTypes: Seq[String] =
    Seq("accountTransaction", "accountCreation", "update")

  /** Deterministic, order-preserving summary id: replaces Postgres
    * `RETURNING id` (main.rs:219). Ids are strictly increasing in
    * (height, seq_in_block) and may have gaps, matching the documented
    * invariant (wallet-proxy-indexer/README.md:101). 2^20 items per
    * block is far above any real block size. */
  val SeqBits: Int = 20
  val SeqMod: Long = 1L << SeqBits // 1048576
}
