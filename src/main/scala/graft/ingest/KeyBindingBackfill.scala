package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.streaming.{Dialect, Migrations}

/** m0002 public-key-binding backfill as a batch job — the Spark analog of
  * `m0002_acoount_public_key_binding.rs:19-164`: account-list snapshot →
  * bounded-concurrency `get_account_info` fan-out (CONCURRENT_QUERY_LIMIT
  * = 50, m0002:17) → flatten the credential→keys tree to rows
  * (m0002:82-111) → 1000-row batched bulk insert (m0002:107-117,127-164).
  *
  * The node is abstracted as a pluggable `fetch` function (the engine has
  * no gRPC client; in production this wraps the SDK, in tests a
  * deterministic fake). Everything else is the real distributed shape:
  * the fan-out runs on executors via `mapPartitions` with at most
  * `concurrency` addresses per fetch call, the flatten is a double
  * explode, and the bulk insert is statement-batched JDBC with the same
  * last-write-wins guards as the streaming sink — backfill rows carry
  * `src_id = 0`, so any stream-derived snapshot (id > 0) wins and reruns
  * are exact no-ops.
  */
object KeyBindingBackfill {

  /** One account's credential→keys tree as fetched from the node
    * (`get_account_info`; field names match the binding row columns). */
  case class AccountKey(key_index: Int, public_key: String)
  case class CredentialKeys(credential_index: Int, keys: Seq[AccountKey])
  case class AccountKeys(address: Long, credentials: Seq[CredentialKeys])

  /** A9 — bounded-concurrency enrichment: fetch account info for a
    * snapshot of addresses, at most `concurrency` addresses per fetch
    * call per partition (the `buffer_unordered(50)` analog; total
    * in-flight = concurrency × partitions, tune partitions to bound
    * node load). */
  def enrich(accounts: Dataset[Long],
             fetch: Seq[Long] => Seq[AccountKeys],
             concurrency: Int = 50): Dataset[AccountKeys] =
    accounts.mapPartitions(it =>
      it.grouped(concurrency).flatMap(g => fetch(g)))(Encoders.product[AccountKeys])

  /** Flatten credentials → keys to binding rows (double explode,
    * m0002:82-111). `is_simple_account` = exactly one credential holding
    * exactly one key (`num_keys == 1`, main.rs:738-740). */
  def bindingRows(infos: Dataset[AccountKeys]): DataFrame =
    infos.toDF()
      .withColumn("is_simple",
        size(col("credentials")) === 1 &&
          size(col("credentials").getItem(0).getField("keys")) === 1)
      .select(col("address"), col("is_simple"), explode(col("credentials")).as("cred"))
      .select(col("address"), col("is_simple"),
        col("cred.credential_index").as("credential_index"),
        explode(col("cred.keys")).as("k"))
      .select(col("address"), col("credential_index"),
        col("k.key_index").as("key_index"),
        col("k.public_key").as("public_key"),
        col("is_simple").as("is_simple_account"))

  /** A13 — batched, idempotent bulk insert of the flattened rows into
    * the serving `bindings` table: `batchSize`-row statement batches,
    * one commit per batch. Guards: never writes an address that already
    * has a stream-derived snapshot (src_id > 0), never duplicates a
    * row — safe to rerun and safe concurrently with the stream. */
  def run(infos: Dataset[AccountKeys], url: String, dialect: Dialect,
          batchSize: Int = 1000): Unit = {
    val dummy = dialect.dummyFrom
    bindingRows(infos).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val c = Migrations.connect(url)
        try {
          c.setAutoCommit(false)
          val ins = c.prepareStatement(
            s"""INSERT INTO bindings (address, src_id, credential_index, key_index, public_key, is_simple_account)
               |SELECT ?, 0, ?, ?, ?, ? $dummy
               |WHERE NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id > 0)
               |  AND NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id = 0
               |                  AND credential_index = ? AND key_index = ?)""".stripMargin)
          var n = 0
          rows.foreach { r =>
            val addr = r.getAs[Long]("address")
            val cred = r.getAs[Int]("credential_index")
            val key = r.getAs[Int]("key_index")
            ins.setLong(1, addr)
            ins.setInt(2, cred); ins.setInt(3, key)
            ins.setString(4, r.getAs[String]("public_key"))
            ins.setBoolean(5, r.getAs[Boolean]("is_simple_account"))
            ins.setLong(6, addr)
            ins.setLong(7, addr); ins.setInt(8, cred); ins.setInt(9, key)
            ins.addBatch()
            n += 1
            if (n % batchSize == 0) { ins.executeBatch(); c.commit() }
          }
          ins.executeBatch()
          c.commit()
        } catch {
          case e: Throwable => c.rollback(); throw e
        } finally c.close()
      }
    }
  }
}
