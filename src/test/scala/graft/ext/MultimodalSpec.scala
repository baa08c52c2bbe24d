package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow

/** The multimodal plumbing contract: the batched mapPartitions path
  * (where a real codec plugs in) must agree exactly with the pure
  * column-expression path, on the same binary payloads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    (1L, "fake-jpeg-bytes-aaaa", "image/jpeg"),
    (2L, "fake-wav-bytes-bbbbbb", "audio/wav"),
    (3L, "x", "video/mp4"))

  test("featuresBatched == featuresCols on identical payloads") {
    val ds = payloads.map { case (id, s, m) =>
      MediaRow(id, s.getBytes("UTF-8"), m) }.toDS()
    val batched = Multimodal.featuresBatched(ds, batchSize = 2)
      .orderBy("media_id").collect()

    val df = payloads.toDF("media_id", "payload", "mime")
    val viaCols = Multimodal.featuresCols(df,
        col("payload").cast("binary"), col("media_id"))
      .orderBy("media_id").collect()

    assert(batched.length == viaCols.length)
    batched.zip(viaCols).foreach { case (b, c) =>
      assert(b.media_id == c.getAs[Long]("media_id"))
      assert(b.byte_len == c.getAs[Int]("byte_len").toLong ||
        b.byte_len == c.getAs[Long]("byte_len"))
      assert(b.content_hash == c.getAs[String]("content_hash"))
      assert(b.width == c.getAs[Int]("width"))
      assert(b.height == c.getAs[Int]("height"))
      assert(b.n_frames == c.getAs[Int]("n_frames"))
    }
  }

  test("frame sampling: bounded count, even stride, deterministic hashes") {
    val f = Seq((1L, "h1", 9), (2L, "h2", 30), (3L, "h3", 0), (4L, "h4", 2))
      .toDF("media_id", "content_hash", "n_frames")
    val out = Multimodal.frameSample(f, maxFrames = 4)
      .orderBy("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byId = out.groupBy(_._1)
    // n=9 → stride 3 → frames 0,3,6; n=30 → stride 8 → 0,8,16,24;
    // n=0 → none; n=2 → stride 1 → 0,1
    assert(byId(1L).map(_._2).toSeq == Seq(0, 3, 6))
    assert(byId(2L).map(_._2).toSeq == Seq(0, 8, 16, 24))
    assert(!byId.contains(3L))
    assert(byId(4L).map(_._2).toSeq == Seq(0, 1))
    assert(byId.values.forall(_.length <= 4))
    // frame hash pins the exact format md5(content_hash + ":" + idx)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("h1:3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.find(r => r._1 == 1L && r._2 == 3).get._3 == expected)
  }

  test("resize plan fits the box, preserves aspect ratio, never upscales") {
    val f = Seq(
      (1L, 1280, 720),  // wide → 512 x 288
      (2L, 300, 200),   // already fits → unchanged
      (3L, 200, 600),   // tall → 170 x 512
      (4L, 0, 100)      // degenerate → dropped
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(f, maxW = 512, maxH = 512)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(out == Map(1L -> (512, 288), 2L -> (300, 200), 3L -> (170, 512)))
    out.values.foreach { case (w, h) => assert(w <= 512 && h <= 512) }
  }

  test("partitioning does not change batched results") {
    val ds = payloads.map { case (id, s, m) =>
      MediaRow(id, s.getBytes("UTF-8"), m) }.toDS()
    val a = Multimodal.featuresBatched(ds.repartition(1)).orderBy("media_id")
      .collect().toSeq
    val b = Multimodal.featuresBatched(ds.repartition(3)).orderBy("media_id")
      .collect().toSeq
    assert(a == b)
  }
}
