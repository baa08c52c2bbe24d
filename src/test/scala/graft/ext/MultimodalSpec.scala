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
