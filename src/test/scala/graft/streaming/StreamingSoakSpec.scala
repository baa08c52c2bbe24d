package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSpec
import graft.ingest.BlockIngest
import graft.model.Schemas
import graft.query.QueryApi
import graft.sources.BucketedMirror

/** The COMPOSED end-to-end soak the per-piece specs don't cover: one
  * streaming query drives feed files → ingest transforms → the
  * transactional DB sink AND the bucketed serving mirrors in the same
  * `foreachBatch` (the deployment shape: "indexer writes, proxy reads"
  * with the mirror as the read side), across many micro-batches with a
  * MID-STREAM stop/restart. After recovery the SERVED page — bucket-
  * pruned mirror probe, id-set lookup — must equal the pure batch
  * derivation over the full feed, and a re-delivered batch must be a
  * mirror no-op ([[BucketedMirror.appendOnce]]).
  */
class StreamingSoakSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import scala.jdk.CollectionConverters._

  private val root = Files.createTempDirectory("graft-soak").toString
  private val feedDir = s"$root/feed"
  private val ckpt = s"$root/ckpt"
  private val url = s"jdbc:derby:$root/db;create=true"
  private val AtiMirror = "soak_ati_m"
  private val SumMirror = "soak_sum_m"

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $AtiMirror")
    spark.sql(s"DROP TABLE IF EXISTS $SumMirror")
    super.afterAll()
  }

  private def mkFeed(heights: Range): DataFrame = {
    val rows = heights.flatMap { h =>
      Seq(
        Row(h.toLong, 0, s"h$h", 1000L * h, s"""{"k":$h}""", false, (h % 3).toLong,
          Seq((h % 3).toLong, ((h + 1) % 3).toLong),
          Seq(Row((h % 2).toLong, 0L)),
          Seq(Row((h % 2).toLong, 0L, "tok", if (h % 2 == 0) "mint" else "burn",
            (10 + h).toString)),
          null),
        Row(h.toLong, 1, s"h$h", 1000L * h, s"""{"s":$h}""", true, null,
          Seq(99L), Seq.empty[Row], Seq.empty[Row],
          Seq(Row(0, 0, s"pk-$h", true)))
      )
    }
    spark.createDataFrame(rows.asJava,
      Schemas.blockFeed(org.apache.spark.sql.types.LongType))
  }

  /** The composed foreachBatch body: conditional-insert DB writes (row
    * idempotent) + replay-safe mirror appends (batchId idempotent). */
  private def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    TransactionalSink.writeBatch(batch, url, Dialect.Derby)
    BucketedMirror.appendOnce(BlockIngest.ati(batch), AtiMirror, batchId,
      "account", buckets = 8, sortCols = Seq("account", "summary"))
    BucketedMirror.appendOnce(BlockIngest.summaries(batch), SumMirror, batchId,
      "id", buckets = 8, sortCols = Seq("id"))
  }

  private def startPipeline(): StreamingQuery =
    spark.readStream
      .schema(Schemas.blockFeed(org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(applyBatch _)
      .trigger(Trigger.AvailableNow())
      .start()

  test("composed pipeline survives a mid-stream restart; served page equals batch") {
    Migrations.migrate(url, Dialect.Derby)
    import spark.implicits._
    // seed both mirrors empty (schema + bucket spec)
    BucketedMirror.write(Seq.empty[(Long, Long)].toDF("account", "summary"),
      AtiMirror, s"$root/ati_m", "account", buckets = 8,
      sortCols = Seq("account", "summary"))
    BucketedMirror.write(
      Seq.empty[(Long, String, Long, Long, String)]
        .toDF("id", "block", "timestamp", "height", "summary"),
      SumMirror, s"$root/sum_m", "id", buckets = 8, sortCols = Seq("id"))

    // 6 feed files -> 6 micro-batches at maxFilesPerTrigger=1
    (0 until 6).foreach { i =>
      mkFeed(i * 2 until (i + 1) * 2).coalesce(1)
        .write.mode(SaveMode.Append).parquet(feedDir)
    }

    // run, then STOP mid-stream: wait for at least one committed batch
    // and kill the query wherever it is (graceful or mid-batch — both
    // are legal restart points the idempotence layers must absorb)
    val q1 = startPipeline()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.lastProgress == null && q1.isActive &&
      System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    q1.awaitTermination(120000)

    // restart from the same checkpoint; drain everything that remains
    val q2 = startPipeline()
    q2.awaitTermination(120000)
    assert(!q2.isActive)

    // an explicit re-delivery of an already-applied batch is a no-op
    // (the restart above exercises whatever replay actually happened;
    // this pins the contract deterministically)
    val full = mkFeed(0 until 12)
    assert(!BucketedMirror.appendOnce(BlockIngest.ati(full), AtiMirror, 0L,
      "account", buckets = 8, sortCols = Seq("account", "summary")))

    spark.catalog.refreshTable(AtiMirror)
    spark.catalog.refreshTable(SumMirror)

    // mirrors hold exactly the batch derivation (set equality: the only
    // legal divergence is a replayed file generation, which duplicates
    // rows but never invents or loses them)
    val atiMirror = BucketedMirror.table(spark, AtiMirror)
    val sumMirror = BucketedMirror.table(spark, SumMirror)
    val expAti = BlockIngest.ati(full).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atiMirror.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == expAti)
    val expSum = BlockIngest.summaries(full).collect()
      .map(r => (r.getLong(0), r.getString(4))).toSet
    assert(sumMirror.select("id", "summary").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == expSum)

    // the SERVED page over the streamed mirrors == the batch answer
    // over the ingest transforms (account 1 is touched by most blocks)
    val served = QueryApi.accountPageServed(atiMirror, sumMirror,
      lit(1L), from = 0L, limit = 100, ascending = true)
      .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
    // fresh frames per side: both deriving from `full` would be an
    // ambiguous self-join on the shared lineage
    val batchAnswer = QueryApi.accountTransactions(
      BlockIngest.ati(mkFeed(0 until 12)),
      BlockIngest.summaries(mkFeed(0 until 12)),
      lit(1L), from = 0L, limit = Some(100), ascending = true)
      .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
    assert(served.nonEmpty && served == batchAnswer)

    // and the DB side of the same foreachBatch stayed exact
    val c = Migrations.connect(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT COUNT(*) FROM summaries")
      rs.next()
      assert(rs.getLong(1) == 24L) // 12 heights x 2 items
    } finally c.close()

    // streamed-in generations must still bucket-prune the served probe
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val p = QueryApi.accountPageIds(BucketedMirror.table(spark, AtiMirror),
        lit(1L), from = 0L, limit = 100, ascending = true)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"served probe must read one bucket after streamed appends:\n$p")
    } finally spark.conf.set(k, saved)
  }

  test("online compaction mid-flight: markers carried, replay no-op, page and pruning survive") {
    // the 24/7-serving gap: compaction must NOT require stopping the
    // ingest stream. Here the stream is stopped mid-flight (checkpoint
    // still holds undrained feed files), both mirrors are compacted,
    // and the restart drains the remainder ACROSS the compacted
    // generation. The carried markers make any replayed batch a no-op;
    // a raw write()-compaction here would wipe them and re-apply.
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val atiM = "soak_c_ati_m"
    val sumM = "soak_c_sum_m"
    val feed = s"$root/feed_c"
    val ck = s"$root/ckpt_c"
    val dbUrl = s"jdbc:derby:$root/db_c;create=true"
    val sort = Seq("account", "summary")
    try {
      Migrations.migrate(dbUrl, Dialect.Derby)
      BucketedMirror.write(Seq.empty[(Long, Long)].toDF("account", "summary"),
        atiM, s"$root/c_ati_m", "account", buckets = 8, sortCols = sort)
      BucketedMirror.write(
        Seq.empty[(Long, String, Long, Long, String)]
          .toDF("id", "block", "timestamp", "height", "summary"),
        sumM, s"$root/c_sum_m", "id", buckets = 8, sortCols = Seq("id"))
      (0 until 6).foreach { i =>
        mkFeed(i * 2 until (i + 1) * 2).coalesce(1)
          .write.mode(SaveMode.Append).parquet(feed)
      }
      def applyB(batch: DataFrame, batchId: Long): Unit = {
        TransactionalSink.writeBatch(batch, dbUrl, Dialect.Derby)
        BucketedMirror.appendOnce(BlockIngest.ati(batch), atiM, batchId,
          "account", buckets = 8, sortCols = sort)
        BucketedMirror.appendOnce(BlockIngest.summaries(batch), sumM, batchId,
          "id", buckets = 8, sortCols = Seq("id"))
      }
      def start(): StreamingQuery = spark.readStream
        .schema(Schemas.blockFeed(org.apache.spark.sql.types.LongType))
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch(applyB _)
        .trigger(Trigger.AvailableNow())
        .start()

      val q1 = start()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.lastProgress == null && q1.isActive &&
        System.nanoTime() < deadline) Thread.sleep(50)
      q1.stop()
      q1.awaitTermination(120000)

      // MID-FLIGHT: undrained feed files remain behind the checkpoint;
      // compact both mirrors now, while the stream is between runs
      val atiLoc = BucketedMirror.compact(spark, atiM)
      val sumLoc = BucketedMirror.compact(spark, sumM)
      assert(atiLoc.endsWith("_gen1") && sumLoc.endsWith("_gen1"))
      val fs = new Path(atiLoc)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // one rewrite generation: at most one data file per bucket
      assert(fs.listStatus(new Path(atiLoc))
        .count(_.getPath.getName.endsWith(".parquet")) <= 8)
      // (a) the carried markers: batch 0 committed before the stop
      // (lastProgress was non-null), and replaying it across the
      // compaction must be a no-op — the exact failure write()-based
      // compaction would cause
      val carried = fs.listStatus(new Path(atiLoc, "_applied_batches"))
        .map(_.getPath.getName.toLong).toSet
      assert(carried.contains(0L), s"marker for batch 0 not carried: $carried")
      assert(!BucketedMirror.appendOnce(BlockIngest.ati(mkFeed(0 until 2)),
        atiM, 0L, "account", buckets = 8, sortCols = sort),
        "batch 0 was re-applied across the compaction")

      // restart from the same checkpoint; drain the rest into gen1
      val q2 = start()
      q2.awaitTermination(120000)
      assert(!q2.isActive)

      // (b) MULTISET equality with the batch derivation — a re-applied
      // batch would show up as duplicated rows that set equality hides
      val full = mkFeed(0 until 12)
      spark.catalog.refreshTable(atiM)
      spark.catalog.refreshTable(sumM)
      val gotAti = BucketedMirror.table(spark, atiM).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expAti = BlockIngest.ati(full).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(gotAti == expAti)
      val gotSum = BucketedMirror.table(spark, sumM)
        .select("id", "summary").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      val expSum = BlockIngest.summaries(full).collect()
        .map(r => (r.getLong(0), r.getString(4))).toSeq.sorted
      assert(gotSum == expSum)

      // compact AGAIN on the live-appended state (gen1 -> gen2): the
      // generational rename must iterate, not nest
      val atiLoc2 = BucketedMirror.compact(spark, atiM)
      assert(atiLoc2.endsWith("_gen2") && !atiLoc2.contains("_gen1"))
      val gen2Files = fs.listStatus(new Path(atiLoc2))
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      assert(gen2Files.length <= 8,
        s"compaction must land one file per bucket; got:\n${gen2Files.sorted.mkString("\n")}")

      // served page over the twice-compacted mirror == the batch answer
      val served = QueryApi.accountPageServed(
        BucketedMirror.table(spark, atiM), BucketedMirror.table(spark, sumM),
        lit(1L), from = 0L, limit = 100, ascending = true)
        .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
      val batchAnswer = QueryApi.accountTransactions(
        BlockIngest.ati(mkFeed(0 until 12)),
        BlockIngest.summaries(mkFeed(0 until 12)),
        lit(1L), from = 0L, limit = Some(100), ascending = true)
        .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
      assert(served.nonEmpty && served == batchAnswer)

      // (c) bucket pruning survives the relocated generations
      val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val saved = spark.conf.get(k)
      spark.conf.set(k, "false")
      try {
        val p = QueryApi.accountPageIds(BucketedMirror.table(spark, atiM),
          lit(1L), from = 0L, limit = 100, ascending = true)
          .queryExecution.executedPlan.toString
        assert(p.contains("SelectedBucketsCount: 1 out of 8"),
          s"served probe must still read one bucket after compaction:\n$p")
      } finally spark.conf.set(k, saved)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $atiM")
      spark.sql(s"DROP TABLE IF EXISTS $sumM")
    }
  }

  test("served page tolerates a replayed generation (the marker crash window)") {
    // appendOnce's residual window: data files commit, the crash lands
    // before the marker, the batch replays — one generation's rows are
    // duplicated in the mirror. The appendOnce scaladoc claims serving
    // reads tolerate this (ids are unique, the page probe dedups on
    // id); simulate the window with two raw append() calls of the same
    // delta and pin the claim.
    import spark.implicits._
    val atiM = "soak_dup_ati_m"
    val sumM = "soak_dup_sum_m"
    try {
      BucketedMirror.write(Seq((7L, 1L), (7L, 3L), (8L, 2L))
        .toDF("account", "summary"),
        atiM, s"$root/dup_ati_m", "account", buckets = 8,
        sortCols = Seq("account", "summary"))
      BucketedMirror.write(
        Seq((1L, "b1", 10L, 0L, "s1"), (2L, "b1", 10L, 0L, "s2"),
          (3L, "b2", 20L, 1L, "s3"))
          .toDF("id", "block", "timestamp", "height", "summary"),
        sumM, s"$root/dup_sum_m", "id", buckets = 8, sortCols = Seq("id"))
      val delta = Seq((7L, 5L)).toDF("account", "summary")
      val sumDelta = Seq((5L, "b3", 30L, 2L, "s5"))
        .toDF("id", "block", "timestamp", "height", "summary")
      // the replayed generation: same delta appended twice
      BucketedMirror.append(delta, atiM, "account", 8,
        Seq("account", "summary"))
      BucketedMirror.append(delta, atiM, "account", 8,
        Seq("account", "summary"))
      BucketedMirror.append(sumDelta, sumM, "id", 8, Seq("id"))
      BucketedMirror.append(sumDelta, sumM, "id", 8, Seq("id"))

      val page = QueryApi.accountPageServed(
        BucketedMirror.table(spark, atiM), BucketedMirror.table(spark, sumM),
        lit(7L), from = 0L, limit = 100, ascending = true)
        .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
      assert(page == Seq((1L, "s1"), (3L, "s3"), (5L, "s5")),
        s"duplicated generation leaked into the served page: $page")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $atiM")
      spark.sql(s"DROP TABLE IF EXISTS $sumM")
    }
  }
}
