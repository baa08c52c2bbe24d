package graft.streaming

import java.math.BigInteger
import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ingest.BlockIngest

/** Exactly-once JDBC sink for the block-feed stream — the Spark analog of
  * the reference's per-block transactional writer (insert_block,
  * main.rs:543-574) with the retry/replay semantics of its use_db loop
  * (lib.rs:284-361).
  *
  * Exactly-once is BY CONSTRUCTION, not by ledger:
  *  - every row has a deterministic natural key (engine-derived ids,
  *    SURVEY §7.4), so all appends are conditional inserts
  *    (`INSERT … WHERE NOT EXISTS`) — a replayed micro-batch inserts 0
  *    rows;
  *  - the CIS-2 running supply is updated only by the deltas that were
  *    NEWLY inserted in this transaction (the conditional insert's
  *    update count says which), so a replay adds nothing twice; the
  *    batch is repartitioned by token key so no two tasks race on the
  *    same supply row;
  *  - key-binding snapshots are last-write-wins by source id: older
  *    snapshots never overwrite newer ones, replays are no-ops; the
  *    batch is repartitioned by address.
  *
  * Each partition writes in ONE JDBC transaction (per-partition
  * atomicity; a task retry replays into a consistent state because every
  * statement is idempotent).
  */
object TransactionalSink extends Serializable {

  /** Write one micro-batch of feed rows (Schemas.blockFeed + id) into
    * the serving DB. Pure function of the batch — usable from
    * foreachBatch (streaming) or directly (batch backfill, A13). */
  def writeBatch(feedBatch: DataFrame, url: String, dialect: Dialect): Unit = {
    val withId = BlockIngest.withId(feedBatch)

    val summaries = BlockIngest.summaries(feedBatch)
    val ati = BlockIngest.ati(feedBatch)
    val cti = BlockIngest.cti(feedBatch)
    val deltas = BlockIngest.cis2DeltaRows(withId)
    val bindings = withId
      .where(col("key_bindings").isNotNull)
      .select(coalesce(col("sender"), col("affected_accounts").getItem(0)).as("address"),
        col("id"), explode(col("key_bindings")).as("b"))
      .select(col("address"), col("id"), col("b.credential_index"),
        col("b.key_index"), col("b.public_key"), col("b.is_simple_account"))

    val dummy = dialect.dummyFrom

    insertIfAbsent(summaries, url,
      s"""INSERT INTO summaries (id, block, ts, height, summary)
         |SELECT ?, ?, ?, ?, ? $dummy
         |WHERE NOT EXISTS (SELECT 1 FROM summaries WHERE id = ?)""".stripMargin,
      (ps, r) => {
        ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
        ps.setLong(3, r.getLong(2)); ps.setLong(4, r.getLong(3))
        ps.setString(5, r.getString(4)); ps.setLong(6, r.getLong(0))
      })

    insertIfAbsent(ati, url,
      s"""INSERT INTO ati (account, summary)
         |SELECT ?, ? $dummy
         |WHERE NOT EXISTS (SELECT 1 FROM ati WHERE account = ? AND summary = ?)""".stripMargin,
      (ps, r) => {
        ps.setLong(1, r.getLong(0)); ps.setLong(2, r.getLong(1))
        ps.setLong(3, r.getLong(0)); ps.setLong(4, r.getLong(1))
      })

    insertIfAbsent(cti, url,
      s"""INSERT INTO cti (idx, subidx, summary)
         |SELECT ?, ?, ? $dummy
         |WHERE NOT EXISTS (SELECT 1 FROM cti WHERE idx = ? AND subidx = ? AND summary = ?)""".stripMargin,
      (ps, r) => {
        ps.setLong(1, r.getLong(0)); ps.setLong(2, r.getLong(1))
        ps.setLong(3, r.getLong(2)); ps.setLong(4, r.getLong(0))
        ps.setLong(5, r.getLong(1)); ps.setLong(6, r.getLong(2))
      })

    applyCis2(deltas, url, dialect)
    applyBindings(bindings, url, dialect)
  }

  /** Conditional-insert appender: one JDBC transaction per partition,
    * statement batching (A13's 1000-row batching analog). */
  private def insertIfAbsent(df: DataFrame, url: String, sql: String,
                             bind: (java.sql.PreparedStatement, Row) => Unit): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) withTx(url) { c =>
        val ps = c.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          bind(ps, r); ps.addBatch(); n += 1
          if (n % 1000 == 0) ps.executeBatch()
        }
        ps.executeBatch()
      }
    }

  /** CIS-2: persist deltas idempotently, then fold ONLY the newly
    * inserted deltas into the running supply (BigInteger arithmetic —
    * NUMERIC(80,0) analog, beyond both Decimal(38) and Derby's
    * DECIMAL(31)). Keyed repartition ⇒ one task owns a token key. */
  private def applyCis2(deltas: DataFrame, url: String, dialect: Dialect): Unit =
    deltas.repartition(col("index"), col("subindex"), col("token_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) withTx(url) { c =>
          val ins = c.prepareStatement(
            s"""INSERT INTO cis2_deltas (summary, seq, idx, subidx, token_id, delta)
               |SELECT ?, ?, ?, ?, ?, ? ${dialect.dummyFrom}
               |WHERE NOT EXISTS (SELECT 1 FROM cis2_deltas WHERE summary = ? AND seq = ?)""".stripMargin)
          val acc = scala.collection.mutable.Map.empty[(Long, Long, String), BigInteger]
          rows.foreach { r =>
            val (sum, seq) = (r.getLong(0), r.getInt(1))
            val key = (r.getLong(2), r.getLong(3), r.getString(4))
            val delta = new BigInteger(r.getString(5))
            ins.setLong(1, sum); ins.setInt(2, seq)
            ins.setLong(3, key._1); ins.setLong(4, key._2)
            ins.setString(5, key._3); ins.setString(6, delta.toString)
            ins.setLong(7, sum); ins.setInt(8, seq)
            if (ins.executeUpdate() == 1) // newly inserted → apply
              acc.updateWith(key)(v => Some(v.getOrElse(BigInteger.ZERO).add(delta)))
          }
          val sel = c.prepareStatement(
            "SELECT total_supply FROM cis2_tokens WHERE idx = ? AND subidx = ? AND token_id = ?")
          val upd = c.prepareStatement(
            "UPDATE cis2_tokens SET total_supply = ? WHERE idx = ? AND subidx = ? AND token_id = ?")
          val insTok = c.prepareStatement(
            "INSERT INTO cis2_tokens (idx, subidx, token_id, total_supply) VALUES (?, ?, ?, ?)")
          acc.foreach { case ((i, s, t), d) =>
            sel.setLong(1, i); sel.setLong(2, s); sel.setString(3, t)
            val rs = sel.executeQuery()
            if (rs.next()) {
              val cur = new BigInteger(rs.getString(1))
              upd.setString(1, cur.add(d).toString)
              upd.setLong(2, i); upd.setLong(3, s); upd.setString(4, t)
              upd.executeUpdate()
            } else {
              insTok.setLong(1, i); insTok.setLong(2, s); insTok.setString(3, t)
              insTok.setString(4, d.toString)
              insTok.executeUpdate()
            }
          }
        }
      }

  /** Key bindings: last-write-wins snapshot by source id (delete older
    * rows, insert guarded against newer — main.rs:506-540 semantics,
    * replay/ordering safe). Keyed repartition ⇒ one task per address. */
  private def applyBindings(bindings: DataFrame, url: String, dialect: Dialect): Unit =
    bindings.repartition(col("address"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) withTx(url) { c =>
          val del = c.prepareStatement(
            "DELETE FROM bindings WHERE address = ? AND src_id < ?")
          val ins = c.prepareStatement(
            s"""INSERT INTO bindings (address, src_id, credential_index, key_index, public_key, is_simple_account)
               |SELECT ?, ?, ?, ?, ?, ? ${dialect.dummyFrom}
               |WHERE NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id > ?)
               |  AND NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id = ?
               |                  AND credential_index = ? AND key_index = ?)""".stripMargin)
          rows.foreach { r =>
            val (addr, id) = (r.getLong(0), r.getLong(1))
            del.setLong(1, addr); del.setLong(2, id); del.executeUpdate()
            ins.setLong(1, addr); ins.setLong(2, id)
            ins.setInt(3, r.getInt(2)); ins.setInt(4, r.getInt(3))
            ins.setString(5, r.getString(4)); ins.setBoolean(6, r.getBoolean(5))
            ins.setLong(7, addr); ins.setLong(8, id)
            ins.setLong(9, addr); ins.setLong(10, id)
            ins.setInt(11, r.getInt(2)); ins.setInt(12, r.getInt(3))
            ins.executeUpdate()
          }
        }
      }

  private def withTx(url: String)(f: Connection => Unit): Unit = {
    val c = Migrations.connect(url)
    try {
      c.setAutoCommit(false)
      f(c)
      c.commit()
    } catch {
      case e: Throwable => c.rollback(); throw e
    } finally c.close()
  }
}
