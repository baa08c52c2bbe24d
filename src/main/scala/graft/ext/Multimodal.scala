package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-local batches.
  *
  * The decode step itself is STUBBED (no media libraries in this
  * environment) with a deterministic md5-derived fake — every piece of
  * Spark-side plumbing around it is real: the schema (binary payload +
  * metadata struct), the batched per-partition execution shape (what a
  * `mapInPandas`/Arrow UDF would give), and the pure-column fallback
  * used when the "decoder" is expressible as expressions.
  */
object Multimodal {

  /** A media row: opaque payload + the metadata a real pipeline carries. */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (stub): what a real decoder would emit. */
  case class MediaFeatures(media_id: Long, byte_len: Long, content_hash: String,
                           width: Int, height: Int, n_frames: Int)

  /** Column-expression feature extraction over a binary column —
    * deterministic stub decode: dimensions derived from the content
    * hash, frame count from length. Fully pushdown/codegen friendly;
    * the real decoder replaces only the width/height/n_frames exprs. */
  def featuresCols(df: DataFrame, media: Column, id: Column): DataFrame =
    df.select(
      id.as("media_id"),
      length(media).as("byte_len"),
      md5(media).as("content_hash"),
      (Text.hash60(media) % 1280).cast("int").as("width"),
      (Text.hash60(md5(media)) % 720).cast("int").as("height"),
      (length(media) % 30).cast("int").as("n_frames"))

  /** Partition-batched feature extraction — the execution shape a native
    * decoder needs (amortized per-batch init, bounded memory): iterate
    * each partition in fixed-size batches, "decode" each batch, emit
    * features. This is the Scala analog of `mapInPandas`: swap
    * [[decodeBatch]] for JNI/FFI calls into a real codec. */
  def featuresBatched(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** Stub batch decoder — deterministic fake (md5-derived dims), marked
    * clearly as the seam where a real image/audio codec plugs in. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      val h60 = java.lang.Long.parseLong(hex.take(15), 16)
      MediaFeatures(r.media_id, r.payload.length.toLong, hex,
        (h60 % 1280).toInt, (nestedHash(hex) % 720).toInt,
        r.payload.length % 30)
    }

  private def nestedHash(hex: String): Long = {
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h2.take(15), 16)
  }
}
