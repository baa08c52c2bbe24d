package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The binary-code history contract ([[Similarity.writeB1Codes]] /
  * [[Similarity.tagNearB1Codes]] / [[Similarity.appendB1Codes]]):
  * hand-computed Hamming tags, the marker + id-level replay dedup, and
  * the incremental foreachBatch composition (batch N's tags see batch
  * N−1's appended codes).
  */
class B1CodesSpec extends SparkSpec {
  import spark.implicits._

  private def v(s: Int*) = s.map(_.toFloat)

  test("tagNearB1Codes: within-radius history tags, distant stays false") {
    val root = Files.createTempDirectory("graft-b1c").toString
    // history codes (little-endian sign bits): h1 = 1111 → lo 15,
    // h2 = 0000 → lo 0
    Similarity.writeB1Codes(
      Seq((1L, v(1, 1, 1, 1)), (2L, v(-1, -1, -1, -1)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", root)
    // batch 10 = 1110 (lo 7): ham 1 to h1 → tagged at radius 1;
    // batch 11 = 0011 (lo 12): ham 2 to both → not tagged
    val out = Similarity.tagNearB1Codes(
        Seq((10L, v(1, 1, 1, -1)), (11L, v(-1, -1, 1, 1)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", root, maxHam = 1)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    graft.CacheScope.release()
    assert(out.toSeq == Seq((10L, true), (11L, false)))
  }

  test("appendB1Codes: marker replay no-ops, id re-delivery dedups") {
    val root = Files.createTempDirectory("graft-b1a").toString
    Similarity.writeB1Codes(
      Seq((1L, v(1, 1, 1, 1)), (2L, v(-1, -1, -1, -1)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", root)
    def codes() = spark.read.parquet(s"$root/codes")
    assert(Similarity.appendB1Codes(
      Seq((3L, v(1, -1, 1, -1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, batchId = 7L))
    assert(codes().count() === 3)
    // same batchId: whole-batch replay → marker no-op
    assert(!Similarity.appendB1Codes(
      Seq((3L, v(1, -1, 1, -1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, batchId = 7L))
    assert(codes().count() === 3)
    // new batchId re-delivering id 3 plus a novel id: anti join keeps
    // the stored code unique
    assert(Similarity.appendB1Codes(
      Seq((3L, v(1, -1, 1, -1)), (4L, v(-1, 1, -1, 1)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, batchId = 8L))
    assert(codes().count() === 4)
    assert(codes().where($"vec_id" === 3L).count() === 1)
  }

  test("hammingTopKIndexed: hand-computed per-query top-k over the store") {
    val root = Files.createTempDirectory("graft-b1q").toString
    // store (little-endian sign bits): 1 → 1111, 2 → 0000, 3 → 1100,
    // 4 → 1000
    Similarity.writeB1Codes(
      Seq((1L, v(1, 1, 1, 1)), (2L, v(-1, -1, -1, -1)),
        (3L, v(1, 1, -1, -1)), (4L, v(1, -1, -1, -1)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", root)
    // q10 = 1110: ham 1/3/1/2 to 1/2/3/4 → top-2 = (1,1),(3,1)
    //   (ham tie at 1 breaks by vec_id: 1 before 3)
    // q11 = 0000: ham 4/0/2/1 to 1/2/3/4 → top-2 = (2,0),(4,1)
    val out = Similarity.hammingTopKIndexed(spark, root,
        Seq((10L, v(1, 1, 1, -1)), (11L, v(-1, -1, -1, -1)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2)
      .orderBy("q_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((10L, 1L, 1L, 1L), (10L, 2L, 3L, 1L),
      (11L, 1L, 2L, 0L), (11L, 2L, 4L, 1L)))
  }

  test("streaming: each micro-batch tags against codes appended by the last") {
    val root = Files.createTempDirectory("graft-b1s").toString
    val feedDir = s"$root/feed"
    val index = s"$root/index"
    Similarity.writeB1Codes(
      Seq((1L, v(-1, -1, 1, 1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", index)
    // file 1: vec 100 = 1111 (ham 2 to the stored 0011 → untagged at
    // radius 1, then appended); file 2: vec 101 = 1110 (ham 1 to the
    // JUST-APPENDED 100 → tagged only because the append is live)
    Seq(100L -> v(1, 1, 1, 1)).toDF("vec_id", "embedding")
      .coalesce(1).write.mode(SaveMode.Append).parquet(feedDir)
    Seq(101L -> v(1, 1, 1, -1)).toDF("vec_id", "embedding")
      .coalesce(1).write.mode(SaveMode.Append).parquet(feedDir)
    val tags = scala.collection.concurrent.TrieMap.empty[Long, Boolean]
    val q = spark.readStream
      .schema(Seq((1L, v(1, 1, 1, 1))).toDF("vec_id", "embedding").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.tagNearB1Codes(batch, "vec_id", "embedding", index,
            maxHam = 1)
          .collect().foreach(r => tags(r.getLong(0)) = r.getBoolean(2))
        graft.CacheScope.release()
        Similarity.appendB1Codes(batch, "vec_id", "embedding", index,
          batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(tags.toMap === Map(100L -> false, 101L -> true))
    assert(spark.read.parquet(s"$index/codes").count() === 3)
  }
}
