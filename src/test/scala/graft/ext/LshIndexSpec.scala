package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MinHash-LSH HISTORY INDEX family (writeLshIndex /
  * tagNearLshIndex / appendLshIndex) — the text-side sibling of
  * StreamingAnnIndexSpec's embedding family: build from history, tag a
  * fresh batch against the accumulated index (tag-don't-drop), append
  * the batch with replay safety at both granularities, and compose
  * tag-then-append over a live stream so each batch dedups against
  * everything before it. Exact copies are used for the tag-true cases
  * so expectations are deterministic by construction (16/16 signature
  * rows match); graded near-dup behavior is the dd_nidx oracle row's
  * job. */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val histText2 = "the quick brown fox jumps over the lazy dog again"
  private def history = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, histText2),
    (3L, "one two three four five six seven eight nine")).toDF("doc_id", "text")

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("lshidx").toString

  test("tag against the stored index: history copy tagged, novel and empty false") {
    val dir = freshDir()
    Dedup.writeLshIndex(history, $"text", $"doc_id", dir)
    val batch = Seq(
      (10L, histText2),                        // exact copy -> 16/16
      (11L, "completely novel words arriving today full of surprise"),
      (12L, "")).toDF("doc_id", "text")        // shingle-less -> false, kept
    val out = Dedup.tagNearLshIndex(batch, $"text", $"doc_id", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq == Seq((10L, true), (11L, false), (12L, false)))
    graft.CacheScope.release()
  }

  test("append: marker replay no-ops, new-batchId re-delivery adds no rows") {
    val dir = freshDir()
    Dedup.writeLshIndex(history, $"text", $"doc_id", dir)
    val batch = Seq(
      (11L, "completely novel words arriving today full of surprise"))
      .toDF("doc_id", "text")
    assert(Dedup.appendLshIndex(batch, $"text", $"doc_id", dir, batchId = 7L))
    val n1 = spark.read.parquet(s"$dir/buckets").count()
    // whole-batch replay: the marker catches it
    assert(!Dedup.appendLshIndex(batch, $"text", $"doc_id", dir, batchId = 7L))
    assert(spark.read.parquet(s"$dir/buckets").count() == n1)
    // re-delivery under a NEW batchId: the doc-level anti join catches it
    assert(Dedup.appendLshIndex(batch, $"text", $"doc_id", dir, batchId = 8L))
    assert(spark.read.parquet(s"$dir/buckets").count() == n1)
    // the appended doc is now HISTORY: a later copy of it tags true
    val later = Seq(
      (20L, "completely novel words arriving today full of surprise"),
      (21L, "some other honestly different text entirely unrelated"))
      .toDF("doc_id", "text")
    val out = Dedup.tagNearLshIndex(later, $"text", $"doc_id", dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq == Seq((20L, true), (21L, false)))
    graft.CacheScope.release()
  }

  test("live stream: tag-then-append per micro-batch dedups against all prior batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dir = freshDir()
    Dedup.writeLshIndex(history, $"text", $"doc_id", dir)
    val input = MemoryStream[(Long, String)]
    val tags = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val tagged = Dedup.tagNearLshIndex(batch, col("text"), col("doc_id"),
          dir)
        tags.synchronized {
          tags ++= tagged.collect().map(r => (r.getLong(0), r.getBoolean(2)))
        }
        // append only the genuinely novel rows — the composed contract
        Dedup.appendLshIndex(tagged.where(!col("near_history"))
          .select("doc_id", "text"), col("text"), col("doc_id"), dir, id)
        graft.CacheScope.release()
        ()
      }.start()
    try {
      input.addData((30L, "stream born sentence with plenty of fresh words"))
      q.processAllAvailable()
      // batch 1: a copy of batch 0's NOVEL doc (only in the index via the
      // append) and a copy of the original history
      input.addData(
        (31L, "stream born sentence with plenty of fresh words"),
        (32L, histText2),
        (33L, "yet another brand new unseen line of text"))
      q.processAllAvailable()
    } finally q.stop()
    assert(tags.sortBy(_._1).toSeq == Seq(
      (30L, false), (31L, true), (32L, true), (33L, false)))
  }
}
