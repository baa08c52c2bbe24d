package graft.streaming

import java.math.BigInteger
import java.sql.{Connection, PreparedStatement, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ingest.BlockIngest
import graft.model.Schemas

/** Exactly-once JDBC sink for the block-feed stream — the Spark analog of
  * the reference's per-block transactional writer (insert_block,
  * main.rs:543-574; "each block is one DB transaction", README.md:41-44)
  * with the retry/replay semantics of its use_db loop (lib.rs:284-361).
  *
  * **Per-block atomic visibility.** All rows derived from one block —
  * summaries, ati, cti, cis2 deltas + supply, key bindings — are written
  * in ONE JDBC transaction: the batch is repartitioned by `height` so a
  * single task owns every row of a block, rows are sorted by height
  * within the partition, and the writer commits once per block on a
  * single connection (commit-by-height). A crash or kill at any point
  * leaves every block either fully visible in all five tables or not
  * visible at all — never a block with `summaries` present but `ati`
  * missing. Blocks commit in height order within a partition; across
  * partitions order is not guaranteed, which is why the streaming
  * CHECKPOINT (not the A11 max-height query) is the resume authority
  * mid-stream: a replayed micro-batch re-fills any inter-block gap
  * idempotently. A11 remains correct for cold starts from a cleanly
  * stopped DB.
  *
  * Exactly-once is BY CONSTRUCTION, not by ledger:
  *  - every row has a deterministic natural key (engine-derived ids,
  *    SURVEY §7.4), so all appends are conditional inserts
  *    (`INSERT … WHERE NOT EXISTS`) — a replayed micro-batch inserts 0
  *    rows;
  *  - CIS-2 deltas are inserted as a STATEMENT BATCH and the per-
  *    statement update counts from `executeBatch` say which deltas are
  *    NEW; only those fold into the running supply (BigInteger
  *    arithmetic — NUMERIC(80,0) analog), so replays add nothing twice.
  *    The supply read-modify-write is an optimistic CAS
  *    (`UPDATE … WHERE total_supply = <read value>`, savepoint-guarded
  *    insert race) so two partitions touching the same token converge;
  *    a deadlock abort fails the task and the idempotent retry heals;
  *  - key bindings are pre-reduced to the LATEST snapshot per (address,
  *    BLOCK) — per block, not per batch, so every block transaction
  *    carries its own snapshot and the all-five-tables atomic-visibility
  *    invariant holds for bindings too (a reader between two commits of
  *    one batch never sees block N present with block N's binding
  *    missing). Across blocks and replayed batches the src_id
  *    last-write-wins guards make older snapshots no-ops, matching the
  *    reference's final state (main.rs:506-540).
  *
  * Driver requirement: `executeBatch` per-statement counts MUST be real
  * row counts — the CIS-2 supply fold depends on them. A driver
  * returning `Statement.SUCCESS_NO_INFO` (e.g. pgjdbc with
  * `reWriteBatchedInserts=true`) would silently treat new deltas as
  * replays, permanently under-counting supply; the writer fails fast on
  * any negative count instead. Keep `reWriteBatchedInserts` OFF for the
  * Postgres dialect.
  */
object TransactionalSink extends Serializable {

  private def heightOfId(id: org.apache.spark.sql.Column) =
    shiftright(id, Schemas.SeqBits)

  /** Write one micro-batch of feed rows (Schemas.blockFeed + id) into
    * the serving DB with per-block atomicity. Pure function of the
    * batch — usable from foreachBatch (streaming) or directly (batch
    * backfill, A13). */
  def writeBatch(feedBatch: DataFrame, url: String, dialect: Dialect): Unit = {
    val withId = BlockIngest.withId(feedBatch)

    val summaries = BlockIngest.summaries(feedBatch).select(
      col("height"), lit(0).as("tag"),
      col("id").as("s_id"), col("block").as("s_block"),
      col("timestamp").as("s_ts"), col("summary").as("s_summary"))

    val ati = BlockIngest.ati(feedBatch).select(
      heightOfId(col("summary")).as("height"), lit(1).as("tag"),
      col("account").as("a_account"), col("summary").as("a_summary"))

    val cti = BlockIngest.cti(feedBatch).select(
      heightOfId(col("summary")).as("height"), lit(2).as("tag"),
      col("index").as("c_idx"), col("subindex").as("c_subidx"),
      col("summary").as("c_summary"))

    val deltas = BlockIngest.cis2DeltaRows(withId).select(
      heightOfId(col("summary")).as("height"), lit(3).as("tag"),
      col("summary").as("d_summary"), col("seq").as("d_seq"),
      col("index").as("d_idx"), col("subindex").as("d_subidx"),
      col("token_id").as("d_token"), col("delta").as("d_delta"))

    // Latest snapshot per (address, block): each block transaction writes
    // its own snapshot (atomic visibility); src_id LWW guards resolve
    // across blocks.
    val bindings = withId
      .where(col("key_bindings").isNotNull)
      .select(coalesce(col("sender"), col("affected_accounts").getItem(0)).as("address"),
        col("id"), col("key_bindings"))
      .groupBy(col("address"), heightOfId(col("id")).as("b_height"))
      .agg(max_by(struct(col("id"), col("key_bindings")), col("id")).as("w"))
      .select(col("address"), col("w.id").as("id"), explode(col("w.key_bindings")).as("b"))
      .select(heightOfId(col("id")).as("height"), lit(4).as("tag"),
        col("address").as("b_address"), col("id").as("b_src"),
        col("b.credential_index").as("b_cred"), col("b.key_index").as("b_key"),
        col("b.public_key").as("b_pub"), col("b.is_simple_account").as("b_simple"))

    val all = Seq(summaries, ati, cti, deltas, bindings)
      .reduce(_.unionByName(_, allowMissingColumns = true))

    all.repartition(col("height"))
      .sortWithinPartitions(col("height"), col("tag"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) writePartition(rows, url, dialect)
      }
  }

  /** One connection per partition; one transaction (commit) per block. */
  private def writePartition(rows: Iterator[Row], url: String, dialect: Dialect): Unit = {
    val c = Migrations.connect(url)
    try {
      c.setAutoCommit(false)
      val st = new BlockStatements(c, dialect)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      var curHeight = Long.MinValue
      def flush(): Unit = if (buf.nonEmpty) {
        writeBlock(c, st, buf.toSeq)
        c.commit()
        buf.clear()
      }
      rows.foreach { r =>
        val h = r.getAs[Long]("height")
        if (h != curHeight) { flush(); curHeight = h }
        buf += r
      }
      flush()
      st.close()
    } catch {
      case e: Throwable => c.rollback(); throw e
    } finally c.close()
  }

  /** All writes of one block, in the reference's insert order
    * (main.rs:543-574): summaries → ati → cti → cis2 → bindings. */
  private def writeBlock(c: Connection, st: BlockStatements, rows: Seq[Row]): Unit = {
    val byTag = rows.groupBy(_.getAs[Int]("tag"))

    byTag.getOrElse(0, Nil).foreach { r =>
      st.insSummary.add(Seq(r.getAs[Long]("s_id"), r.getAs[String]("s_block"),
        r.getAs[Long]("s_ts"), r.getAs[Long]("height"), r.getAs[String]("s_summary")))
    }
    st.insSummary.executeBatch()

    byTag.getOrElse(1, Nil).foreach { r =>
      st.insAti.add(Seq(r.getAs[Long]("a_account"), r.getAs[Long]("a_summary")))
    }
    st.insAti.executeBatch()

    byTag.getOrElse(2, Nil).foreach { r =>
      st.insCti.add(Seq(r.getAs[Long]("c_idx"), r.getAs[Long]("c_subidx"),
        r.getAs[Long]("c_summary")))
    }
    st.insCti.executeBatch()

    // CIS-2: batched conditional inserts; executeBatch update counts say
    // which deltas are NEW in this transaction — only those fold into
    // the running supply (replay inserts 0 ⇒ applies 0).
    val deltaRows = byTag.getOrElse(3, Nil)
    deltaRows.foreach { r =>
      st.insDelta.add(Seq(r.getAs[Long]("d_summary"), r.getAs[Int]("d_seq"),
        r.getAs[Long]("d_idx"), r.getAs[Long]("d_subidx"),
        r.getAs[String]("d_token"), r.getAs[String]("d_delta")))
    }
    val inserted = st.insDelta.executeBatch()
    // The supply fold is only sound with REAL per-statement counts; a
    // driver answering SUCCESS_NO_INFO (-2) would silently misclassify
    // new deltas as replays (permanent, invisible supply corruption) —
    // fail the task instead and let the idempotent retry surface it.
    require(inserted.forall(_ >= 0),
      "cis2 delta executeBatch returned SUCCESS_NO_INFO; exact update " +
        "counts are required (disable driver batch rewriting, e.g. " +
        "pgjdbc reWriteBatchedInserts)")
    val acc = scala.collection.mutable.LinkedHashMap.empty[(Long, Long, String), BigInteger]
    deltaRows.zip(inserted).foreach { case (r, n) =>
      if (n == 1) {
        val key = (r.getAs[Long]("d_idx"), r.getAs[Long]("d_subidx"),
          r.getAs[String]("d_token"))
        val d = new BigInteger(r.getAs[String]("d_delta"))
        acc.updateWith(key)(v => Some(v.getOrElse(BigInteger.ZERO).add(d)))
      }
    }
    acc.foreach { case (key, d) => applySupply(c, st, key, d) }

    byTag.getOrElse(4, Nil).foreach { r =>
      val (addr, id) = (r.getAs[Long]("b_address"), r.getAs[Long]("b_src"))
      st.delBindings.setLong(1, addr); st.delBindings.setLong(2, id)
      st.delBindings.executeUpdate()
      st.insBinding.setLong(1, addr); st.insBinding.setLong(2, id)
      st.insBinding.setInt(3, r.getAs[Int]("b_cred"))
      st.insBinding.setInt(4, r.getAs[Int]("b_key"))
      st.insBinding.setString(5, r.getAs[String]("b_pub"))
      st.insBinding.setBoolean(6, r.getAs[Boolean]("b_simple"))
      st.insBinding.setLong(7, addr); st.insBinding.setLong(8, id)
      st.insBinding.setLong(9, addr); st.insBinding.setLong(10, id)
      st.insBinding.setInt(11, r.getAs[Int]("b_cred"))
      st.insBinding.setInt(12, r.getAs[Int]("b_key"))
      st.insBinding.executeUpdate()
    }
  }

  /** Optimistic read-modify-write of one token's running supply:
    * compare-and-swap on the read value (two concurrent block
    * transactions on the same token converge — the loser's UPDATE
    * matches 0 rows and retries); the first-insert race is
    * savepoint-guarded so a PK violation degrades to a retry instead of
    * poisoning the block transaction. */
  private def applySupply(c: Connection, st: BlockStatements,
                          key: (Long, Long, String), d: BigInteger): Unit = {
    val (i, s, t) = key
    var done = false
    while (!done) {
      st.selTok.setLong(1, i); st.selTok.setLong(2, s); st.selTok.setString(3, t)
      val rs = st.selTok.executeQuery()
      if (rs.next()) {
        val cur = rs.getString(1)
        st.updTok.setString(1, new BigInteger(cur).add(d).toString)
        st.updTok.setLong(2, i); st.updTok.setLong(3, s); st.updTok.setString(4, t)
        st.updTok.setString(5, cur)
        done = st.updTok.executeUpdate() == 1
      } else {
        val sp = c.setSavepoint()
        try {
          st.insTok.setLong(1, i); st.insTok.setLong(2, s); st.insTok.setString(3, t)
          st.insTok.setString(4, d.toString)
          st.insTok.executeUpdate()
          done = true
        } catch {
          case _: SQLException => c.rollback(sp) // lost the insert race; retry as update
        }
      }
      rs.close()
    }
  }

  /** Batched "insert unless key exists" statement in the dialect's
    * native formulation (Derby: WHERE NOT EXISTS with the key values
    * bound twice; Postgres: ON CONFLICT DO NOTHING, bound once). */
  private final class IgnoreInsert(c: Connection, d: Dialect, table: String,
                                   cols: Seq[String], keys: Seq[String]) {
    private val (sql, rebindKeys) = d.insertIgnore(table, cols, keys)
    private val keyIdx = keys.map(cols.indexOf)
    val ps: PreparedStatement = c.prepareStatement(sql)

    private def set(i: Int, v: Any): Unit = v match {
      case l: Long => ps.setLong(i, l)
      case n: Int => ps.setInt(i, n)
      case s: String => ps.setString(i, s)
      case b: Boolean => ps.setBoolean(i, b)
      case other => ps.setObject(i, other)
    }

    /** Bind one row (values in `cols` order) and add it to the batch. */
    def add(values: Seq[Any]): Unit = {
      values.zipWithIndex.foreach { case (v, i) => set(i + 1, v) }
      if (rebindKeys) keyIdx.zipWithIndex.foreach { case (ki, i) =>
        set(values.size + i + 1, values(ki))
      }
      ps.addBatch()
    }
    def executeBatch(): Array[Int] = ps.executeBatch()
    def close(): Unit = ps.close()
  }

  /** Prepared statements reused across all blocks of a partition. */
  private final class BlockStatements(c: Connection, dialect: Dialect) {
    private val dummy = dialect.dummyFrom

    val insSummary = new IgnoreInsert(c, dialect, "summaries",
      Seq("id", "block", "ts", "height", "summary"), Seq("id"))
    val insAti = new IgnoreInsert(c, dialect, "ati",
      Seq("account", "summary"), Seq("account", "summary"))
    val insCti = new IgnoreInsert(c, dialect, "cti",
      Seq("idx", "subidx", "summary"), Seq("idx", "subidx", "summary"))
    val insDelta = new IgnoreInsert(c, dialect, "cis2_deltas",
      Seq("summary", "seq", "idx", "subidx", "token_id", "delta"),
      Seq("summary", "seq"))

    val selTok: PreparedStatement = c.prepareStatement(
      "SELECT total_supply FROM cis2_tokens WHERE idx = ? AND subidx = ? AND token_id = ?")
    val updTok: PreparedStatement = c.prepareStatement(
      """UPDATE cis2_tokens SET total_supply = ?
        |WHERE idx = ? AND subidx = ? AND token_id = ? AND total_supply = ?""".stripMargin)
    val insTok: PreparedStatement = c.prepareStatement(
      "INSERT INTO cis2_tokens (idx, subidx, token_id, total_supply) VALUES (?, ?, ?, ?)")

    val delBindings: PreparedStatement = c.prepareStatement(
      "DELETE FROM bindings WHERE address = ? AND src_id < ?")
    val insBinding: PreparedStatement = c.prepareStatement(
      s"""INSERT INTO bindings (address, src_id, credential_index, key_index, public_key, is_simple_account)
         |SELECT ?, ?, ?, ?, ?, ? $dummy
         |WHERE NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id > ?)
         |  AND NOT EXISTS (SELECT 1 FROM bindings WHERE address = ? AND src_id = ?
         |                  AND credential_index = ? AND key_index = ?)""".stripMargin)

    def close(): Unit = {
      Seq(insSummary, insAti, insCti, insDelta).foreach(_.close())
      Seq(selTok, updTok, insTok, delBindings, insBinding).foreach(_.close())
    }
  }
}
