package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Adapters producing the canonical block-feed shape (FIXTURES.md §A,
  * Schemas.blockFeed) from raw inputs.
  *
  * The reference consumes finalized blocks over gRPC and enriches them
  * per block (`on_finalized_block`, main.rs:786-861). In this repo the
  * driver-generated `events` table is the deterministic stand-in for that
  * stream (TESTDATA.md), so [[fromEvents]] maps it onto the reference's
  * data model with fixed, oracle-reproducible rules:
  *
  *  - 8 events per block: `height = event_id div 8`,
  *    `seq_in_block = event_id % 8` (intra-block order,
  *    wallet-proxy-indexer/README.md:99-100);
  *  - `event_type = 'error'` rows play the role of protocol-generated
  *    `SpecialTransactionOutcome`s (`{"Right":…}` envelope, no sender);
  *    all others are user transactions (`{"Left":…}`, sender = user_id);
  *  - `purchase` affects two accounts (sender + counterparty) — the
  *    multi-account fan-out of `affected_addresses()` (main.rs:823);
  *  - `purchase`/`click` touch contract `(user_id % 50, user_id % 3)`
  *    (main.rs:331-352) and log a CIS-2 mint/burn of `round(value*100)`
  *    on token `(user_id % 50, 0, user_id % 20)` (main.rs:461-504);
  *  - `signup` is a key-update event (main.rs:686-701): the account's
  *    binding snapshot has `user_id % 3 + 1` keys whose key material
  *    depends on the event id, so later signups overwrite earlier ones
  *    observably (last-write-wins, main.rs:506-531).
  */
object BlockFeed {

  /** Map the driver `events` table to the canonical feed shape.
    * Addresses are LongType user ids in this mapping. */
  def fromEvents(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      expr("event_id div 8").cast("long").as("height"),
      (col("event_id") % 8).cast("int").as("seq_in_block"),
      md5(expr("cast(event_id div 8 as string)")).as("block_hash"),
      unix_millis(col("ts")).as("block_time_ms"),
      col("props").as("payload_json"),
      (col("event_type") === "error").as("is_special"),
      when(col("event_type") === "error", lit(null).cast("long"))
        .otherwise(col("user_id")).as("sender"),
      when(col("event_type") === "purchase", array(col("user_id"), col("user_id") + 1))
        .otherwise(array(col("user_id"))).as("affected_accounts"),
      when(col("event_type").isin("purchase", "click"),
        array(struct((col("user_id") % 50).as("index"), (col("user_id") % 3).as("subindex"))))
        .otherwise(array().cast("array<struct<index:long,subindex:long>>"))
        .as("affected_contracts"),
      when(col("event_type").isin("purchase", "click"),
        array(struct(
          (col("user_id") % 50).as("index"),
          lit(0L).as("subindex"),
          (col("user_id") % 20).cast("string").as("token_id"),
          when(col("event_type") === "purchase", "mint").otherwise("burn").as("kind"),
          round(col("value") * 100).cast("long").cast("string").as("amount"))))
        .otherwise(array().cast(
          "array<struct<index:long,subindex:long,token_id:string,kind:string,amount:string>>"))
        .as("cis2_events"),
      when(col("event_type") === "signup",
        transform(
          sequence(lit(0), (col("user_id") % 3).cast("int")),
          k => struct(
            lit(0).as("credential_index"),
            k.as("key_index"),
            md5(concat_ws(":", col("user_id").cast("string"),
              col("event_id").cast("string"), k.cast("string"))).as("public_key"),
            (col("user_id") % 3 === 0).as("is_simple_account"))))
        .otherwise(lit(null).cast(
          "array<struct<credential_index:int,key_index:int,public_key:string,is_simple_account:boolean>>"))
        .as("key_bindings")
    )
  }
}
