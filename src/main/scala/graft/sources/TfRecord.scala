package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.util.zip.{CRC32C, GZIPInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord container I/O — the framing trainers consume, so this is
  * the EXPORT seam of the pipeline (packed sequences / curated
  * documents out) as well as an input seam for corpora that already
  * arrive in it. The framing is public TensorFlow format:
  *
  *   u64-LE payload length
  *   u32-LE masked CRC32C of those 8 length bytes
  *   payload bytes
  *   u32-LE masked CRC32C of the payload
  *
  * where `mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8`
  * in u32 arithmetic. CRC32C is the JDK's `java.util.zip.CRC32C`.
  * Payloads are opaque bytes here (tf.Example protobufs in practice —
  * serialization of those is the caller's schema decision).
  *
  * Read side: same distribution and quarantine contract as
  * [[WarcCorpus]] — one file per task via binaryFile, whole-file gzip
  * sniffed, one streaming pass, a CRC/truncation failure stops THAT
  * file and emits a `_corrupt` row (bit rot in a 100 TB corpus is a
  * statistical certainty; the checksums exist to be checked).
  *
  * Write side: [[write]] exports a DataFrame's binary column as one
  * TFRecord part-file per partition through the Hadoop FileSystem API
  * (works on any configured scheme), so the export parallelism IS the
  * DataFrame's partitioning — repartition upstream to choose file
  * count/size (the trainer-side shard knob).
  */
object TfRecord {

  private def mask(crc: Long): Long =
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL

  private def crc32c(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32C
    c.update(b, off, len)
    c.getValue
  }

  /** Masked CRC32C of a byte range — exposed for the spec to pin the
    * masking formula against an independently-known CRC vector. */
  private[sources] def maskedCrc(b: Array[Byte]): Long =
    mask(crc32c(b, 0, b.length))

  private def le64(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  private def readLe(b: Array[Byte], n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** One framed record: length, length-CRC, payload, payload-CRC. */
  def encodeRecord(payload: Array[Byte]): Array[Byte] = {
    val len = le64(payload.length.toLong)
    val out = new Array[Byte](8 + 4 + payload.length + 4)
    System.arraycopy(len, 0, out, 0, 8)
    writeLe32(out, 8, mask(crc32c(len, 0, 8)))
    System.arraycopy(payload, 0, out, 12, payload.length)
    writeLe32(out, 12 + payload.length, mask(crc32c(payload, 0, payload.length)))
    out
  }

  private def writeLe32(out: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val b = new Array[Byte](n)
    var read = 0
    while (read < n) {
      val k = in.read(b, read, n - read)
      if (k < 0) return if (read == 0 && n > 0) None else Some(null)
      read += k
    }
    Some(b)
  }

  /** Parse all records of one file; `Right` = payloads, `Left` =
    * (payloads up to the damage, reason). */
  def decodeRecords(bytes: Array[Byte]): Either[(Seq[Array[Byte]], String), Seq[Array[Byte]]] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new BufferedInputStream(new GZIPInputStream(raw))
      else new BufferedInputStream(raw)
    val out = Seq.newBuilder[Array[Byte]]
    var idx = 0L
    while (true) {
      readFully(in, 8) match {
        case None => return Right(out.result()) // clean EOF at a boundary
        case Some(null) =>
          return Left((out.result(), s"record $idx: truncated length header"))
        case Some(lenB) =>
          readFully(in, 4).filter(_ != null) match {
            case None => return Left((out.result(), s"record $idx: truncated length crc"))
            case Some(lenCrcB) =>
              if (readLe(lenCrcB, 4) != mask(crc32c(lenB, 0, 8)))
                return Left((out.result(), s"record $idx: length crc mismatch"))
              val len = readLe(lenB, 8)
              if (len < 0 || len > Int.MaxValue - 16)
                return Left((out.result(), s"record $idx: absurd length $len"))
              readFully(in, len.toInt).filter(_ != null) match {
                case None => return Left((out.result(), s"record $idx: truncated payload"))
                case Some(data) =>
                  readFully(in, 4).filter(_ != null) match {
                    case None =>
                      return Left((out.result(), s"record $idx: truncated payload crc"))
                    case Some(crcB) =>
                      if (readLe(crcB, 4) != mask(crc32c(data, 0, data.length)))
                        return Left((out.result(), s"record $idx: payload crc mismatch"))
                      out += data
                      idx += 1
                  }
              }
          }
      }
    }
    Right(out.result()) // unreachable
  }

  private[sources] final case class TfRow(path: String, idx: Long,
                                          corrupt: String, payload: Array[Byte])

  final case class TfResult(records: DataFrame, corrupt: DataFrame)

  /** Read a directory of TFRecord files (`*.tfrecord*`, whole-file gzip
    * sniffed): `records` = (path, idx, payload) with per-file record
    * indices, `corrupt` = per-file quarantine rows. Records parsed
    * before the damage point are KEPT — the checksums localize rot to
    * a record, not a file. */
  def read(spark: SparkSession, path: String,
           pathGlob: String = "*.tfrecord*"): TfResult = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        decodeRecords(bytes) match {
          case Right(recs) =>
            recs.iterator.zipWithIndex.map { case (r, i) => TfRow(p, i.toLong, null, r) }
          case Left((recs, reason)) =>
            recs.iterator.zipWithIndex.map { case (r, i) => TfRow(p, i.toLong, null, r) } ++
              Iterator.single(TfRow(p, recs.length.toLong, reason, Array.emptyByteArray))
        }
      }
      .toDF()
    TfResult(
      records = rows.where(col("corrupt").isNull).select("path", "idx", "payload"),
      corrupt = rows.where(col("corrupt").isNotNull)
        .select(col("path"), col("idx"), col("corrupt").as("reason")))
  }

  /** Export `payloadCol` (binary) as TFRecord part-files under `dir`,
    * one `part-NNNNN.tfrecord` per non-empty partition, via the Hadoop
    * FileSystem of the path's scheme. Returns the record count.
    * Deterministic layout for a deterministic input partitioning —
    * the rename-free direct write is fine for an export directory the
    * caller owns (idempotent re-export = overwrite). */
  def write(df: DataFrame, payloadCol: String, dir: String): Long = {
    val spark = df.sparkSession
    // Configuration is not serializable; ship its explicit entries and
    // rebuild per executor (defaults reload from the classpath there)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val confEntries: Array[(String, String)] = {
      val it = hadoopConf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    def rebuild(): org.apache.hadoop.conf.Configuration = {
      val c = new org.apache.hadoop.conf.Configuration()
      confEntries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    val written = spark.sparkContext.longAccumulator("tfrecords_written")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(hadoopConf).mkdirs(dirPath)
    df.select(col(payloadCol)).rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(rebuild())
        val f = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.tfrecord")
        val out = fs.create(f, true)
        var n = 0L
        try it.foreach { row =>
          out.write(encodeRecord(row.getAs[Array[Byte]](0)))
          n += 1
        } finally out.close()
        written.add(n)
        Iterator.single(n)
      }
    }.count() // force the job
    written.value
  }

  /** Streaming export: one batch-addressed shard directory per
    * micro-batch (`dir/batch-NNNNNN/part-*.tfrecord`), for use inside
    * `foreachBatch`. Replay-idempotent the same way the serving
    * mirrors are: a replayed batchId rewrites the SAME directory with
    * the SAME deterministic content, so a restart straddling a
    * half-written batch converges instead of duplicating — the
    * trainer-side reader globs the `batch-*` directories and never
    * sees a record twice. */
  def writeBatch(df: DataFrame, payloadCol: String, dir: String,
                 batchId: Long): Long =
    write(df, payloadCol, f"$dir/batch-$batchId%06d")
}
