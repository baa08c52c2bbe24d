package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The ANN-index analog of StreamingSoakSpec's mirror story: a LIVE
  * embedding feed (file source) appends into a prebuilt cell index via
  * [[Similarity.appendCellIndex]] in `foreachBatch`, across a mid-stream
  * stop/restart. Pins: (a) every streamed vector lands in the cell the
  * STORED codebook assigns — the index never desyncs from its own
  * assignment rule even when batches replay; (b) an explicitly
  * re-delivered batchId no-ops; (c) the vector probe serves appended
  * vectors through the same partition-pruned scan. */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Float, y: Float) = Array(x, y, 0f, 0f)

  test("streamed appends survive a restart; cells match the stored codebook") {
    val root = Files.createTempDirectory("graft-ann-stream").toString
    val feedDir = s"$root/feed"
    val ckpt = s"$root/ckpt"
    val index = s"$root/index"

    // base corpus: ids 0-4 cluster on (1,0), 5-9 on (0,1); stride 5 →
    // stored centroids are vids 0 (direction A) and 5 (direction B)
    val base = ((0L until 5L).map(i => i -> v(1f, i * 0.01f)) ++
      (5L until 10L).map(i => i -> v((i - 5) * 0.01f, 1f)))
      .toDF("vec_id", "embedding")
    Similarity.writeCellIndex(base, "vec_id", "embedding", index,
      centroidStride = 5)

    // 4 feed files → 4 micro-batches; each vector is colinear with one
    // centroid, so its expected cell is known by construction
    val expected = (0 until 4).flatMap { f =>
      Seq((100L + 2 * f, 0L), (101L + 2 * f, 5L))
    }.toSet
    (0 until 4).foreach { f =>
      Seq(100L + 2 * f -> v(2f + f, 0f), 101L + 2 * f -> v(0f, 2f + f))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.mode(SaveMode.Append).parquet(feedDir)
    }

    def start() = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.appendCellIndex(batch, "vec_id", "embedding", index,
          batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

    // stop after the first committed batch — wherever the stream is,
    // graceful or mid-batch, the marker layer must absorb the replay
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.lastProgress == null && q1.isActive &&
      System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    q1.awaitTermination(120000)
    val q2 = start()
    q2.awaitTermination(120000)
    assert(!q2.isActive)

    // every streamed vector in exactly the cell the stored codebook
    // assigns (set equality: a replayed file generation may duplicate a
    // row, never move or lose one)
    val got = spark.read.parquet(s"$index/cells")
      .where($"vid" >= 100L)
      .select($"vid", $"cid".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"streamed cells diverged: $got")

    // explicit re-delivery of an applied batch: marker makes it a no-op
    val before = spark.read.parquet(s"$index/cells").count()
    assert(!Similarity.appendCellIndex(
      Seq(999L -> v(1f, 1f)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", index, batchId = 0L))
    assert(spark.read.parquet(s"$index/cells").count() == before)

    // the serving probe sees the streamed vectors through pruned scans
    val probe = Similarity.annIvfIndexedVec(spark, index,
      Seq(1f, 0f, 0f, 0f), k = 5, nprobe = 1)
    val ids = probe.collect().map(_.getLong(0)).toSet
    assert(Set(100L, 102L, 104L, 106L).subsetOf(ids),
      s"probe missed streamed A-cluster vectors: $ids")
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cid"),
      s"pruning must survive streamed appends:\n$p")
  }

  test("tagNearIndex + appendCellIndex compose into incremental semantic dedup") {
    val index = Files.createTempDirectory("graft-ann-tag").toString
    val base = ((0L until 5L).map(i => i -> v(1f, i * 0.01f)) ++
      (5L until 10L).map(i => i -> v((i - 5) * 0.01f, 1f)))
      .toDF("vec_id", "embedding")
    Similarity.writeCellIndex(base, "vec_id", "embedding", index,
      centroidStride = 5)

    def tagsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.select("vec_id", "near_index").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    // batch 0: 200 is a scaled A-cluster member (near an INDEXED vector);
    // 201 is the diagonal — ~0.707 to both clusters, novel
    val b0 = Seq(200L -> v(2f, 0f), 201L -> v(0.7f, 0.7f))
      .toDF("vec_id", "embedding")
    val t0 = Similarity.tagNearIndex(b0, "vec_id", "embedding", index,
      threshold = 0.99)
    assert(tagsOf(t0) == Map(200L -> true, 201L -> false))
    // the stored-cells probe scan must be partition-pruned to the
    // batch's own cells — the plan carries the literal cid predicate
    val p = t0.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cid"),
      s"tag probe must prune to the batch's cells:\n$p")
    graft.CacheScope.release()

    // the foreachBatch body: append only the novel rows
    assert(Similarity.appendCellIndex(
      t0.where(!$"near_index").select("vec_id", "embedding"),
      "vec_id", "embedding", index, batchId = 10L))

    // batch 1: 300 repeats batch 0's novel diagonal — a near-dup of
    // something appended EARLIER IN THE STREAM, not of the base corpus;
    // 301 points away from everything
    val b1 = Seq(300L -> v(1.4f, 1.4f), 301L -> v(-1f, 0.2f))
      .toDF("vec_id", "embedding")
    val t1 = Similarity.tagNearIndex(b1, "vec_id", "embedding", index,
      threshold = 0.99)
    assert(tagsOf(t1) == Map(300L -> true, 301L -> false),
      "the batch must dedup against vectors accumulated from prior batches")
    graft.CacheScope.release()
  }

  test("re-delivered rows under a NEW batchId don't accumulate duplicate vids") {
    // The replay the batch marker CANNOT see: a file source re-delivers
    // the same rows with a fresh batchId (checkpoint loss, manual
    // reprocess). tagNearIndex's self-guard (b.vid =!= s.vid) means the
    // replayed copy is never tagged against its own indexed row, so
    // before the vid-level anti join in appendCellIndex the compose
    // appended one duplicate per replay — and no probe path dedups.
    val index = Files.createTempDirectory("graft-ann-replay").toString
    val base = ((0L until 5L).map(i => i -> v(1f, i * 0.01f)) ++
      (5L until 10L).map(i => i -> v((i - 5) * 0.01f, 1f)))
      .toDF("vec_id", "embedding")
    Similarity.writeCellIndex(base, "vec_id", "embedding", index,
      centroidStride = 5)

    val batch = Seq(400L -> v(0.7f, 0.7f), 401L -> v(-1f, 0.1f))
      .toDF("vec_id", "embedding")
    def applyOnce(batchId: Long): Unit = {
      val tagged = Similarity.tagNearIndex(batch, "vec_id", "embedding",
        index, threshold = 0.99)
      Similarity.appendCellIndex(
        tagged.where(!$"near_index").select("vec_id", "embedding"),
        "vec_id", "embedding", index, batchId)
      graft.CacheScope.release()
    }
    applyOnce(batchId = 0L)
    applyOnce(batchId = 1L) // same rows, new batchId — marker can't help
    applyOnce(batchId = 2L)

    val counts = spark.read.parquet(s"$index/cells")
      .where($"vid" >= 400L).groupBy("vid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(400L -> 1L, 401L -> 1L),
      s"replays must not accumulate duplicate index rows: $counts")
  }
}
