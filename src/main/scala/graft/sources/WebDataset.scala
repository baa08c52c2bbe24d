package graft.sources

import java.io.InputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset shard I/O — the other trainer-facing export seam beside
  * [[TfRecord]]. A WebDataset shard is a plain POSIX (ustar) tar
  * archive whose entries group into SAMPLES by basename: the files
  * `000123.txt`, `000123.json`, `000123.jpg` are one three-part sample,
  * stored consecutively so a loader streams the archive without an
  * index. The format is fully public (WebDataset convention over the
  * POSIX.1-1988 tar layout); multimodal trainers consume it directly.
  *
  * Framing written here, byte-deterministic so re-exports are
  * byte-identical (same idempotence class as [[TfRecord.writeBatch]]):
  *
  *   512-byte ustar header per entry — name `<key>.<ext>` (NUL-padded),
  *   mode/uid/gid `0000644`/`0000000`, size in 11-digit octal, mtime 0
  *   (fixed: export time must not change shard bytes), checksum = sum
  *   of the header with the checksum field as spaces (6 octal digits,
  *   NUL, space), typeflag '0', magic "ustar\0" version "00";
  *   payload NUL-padded to a 512 multiple; archive ends with two zero
  *   blocks.
  *
  * Sample keys may not contain '.' (the first '.' in an entry name
  * splits key from extension — WebDataset's own rule, which is what
  * makes multi-dot extensions like `seg.json` work); key.ext must fit
  * the 100-byte ustar name field.
  *
  * Read side: same distribution and quarantine contract as [[TfRecord]]
  * / [[WarcCorpus]] — one file per task via binaryFile, whole-file gzip/zstd
  * sniffed ([[Unpack]]), one streaming pass; a header-checksum/truncation failure
  * stops THAT file and emits a `_corrupt` row, keeping every entry
  * parsed before the damage.
  *
  * Scale shape: the writer is [[TfRecord.write]]'s per-partition
  * direct-write (export parallelism = DataFrame partitioning, choose
  * shard count with a repartition upstream); manifest and fingerprints
  * reuse the TfRecord dataset-card machinery, so one audit convention
  * covers both export formats.
  */
object WebDataset {

  private val Block = 512

  /** One tar entry: 512-byte header + payload padded to 512. */
  def encodeEntry(name: String, payload: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameB.length <= 100, s"tar entry name over 100 bytes: $name")
    val padded = (payload.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    System.arraycopy(nameB, 0, out, 0, nameB.length)
    putOctal(out, 100, 7, 0x1a4) // mode 0644
    putOctal(out, 108, 7, 0)     // uid
    putOctal(out, 116, 7, 0)     // gid
    putOctal(out, 124, 11, payload.length.toLong) // size
    putOctal(out, 136, 11, 0)    // mtime: fixed for determinism
    out(156) = '0'               // typeflag: regular file
    System.arraycopy("ustar".getBytes, 0, out, 257, 5) // magic, NUL at 262
    out(263) = '0'; out(264) = '0' // version
    // checksum: header summed with the checksum field as spaces
    var i = 148
    while (i < 156) { out(i) = ' '; i += 1 }
    var sum = 0L
    i = 0
    while (i < Block) { sum += out(i) & 0xff; i += 1 }
    putOctal(out, 148, 6, sum)
    out(154) = 0; out(155) = ' '
    System.arraycopy(payload, 0, out, Block, payload.length)
    out
  }

  /** Two zero blocks: the POSIX end-of-archive marker. */
  def endOfArchive: Array[Byte] = new Array[Byte](2 * Block)

  /** The stored header checksum of an encoded entry — exposed so the
    * layout can be priced against an independent closed form (the
    * checksum is a pure function of name and payload size: name ord
    * sum + zero-padded octal-size ord sum + the fixed-field constant;
    * the wds oracle row states exactly that). */
  def headerChecksum(entry: Array[Byte]): Long = parseOctal(entry, 148, 8)

  private def putOctal(out: Array[Byte], off: Int, digits: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val pad = digits - s.length
    var i = 0
    while (i < pad) { out(off + i) = '0'; i += 1 }
    System.arraycopy(s.getBytes, 0, out, off + pad, s.length)
    out(off + digits) = 0
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
    v
  }

  /** Parse all entries of one shard; `Right` = (name, payload) in
    * archive order, `Left` = (entries up to the damage, reason). */
  def decodeEntries(bytes: Array[Byte]): Either[(Seq[(String, Array[Byte])], String), Seq[(String, Array[Byte])]] = {
    val in: InputStream = Unpack.stream(bytes)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var idx = 0L
    while (true) {
      val hdr = new Array[Byte](Block)
      var read = 0
      var eof = false
      while (read < Block && !eof) {
        val k = in.read(hdr, read, Block - read)
        if (k < 0) eof = true else read += k
      }
      if (eof && read == 0) return Right(out.result()) // EOF without zero blocks: tolerated
      if (eof) return Left((out.result(), s"entry $idx: truncated header"))
      if (hdr.forall(_ == 0)) return Right(out.result()) // zero block = end marker
      // checksum over the header with the checksum field as spaces
      var sum = 0L
      var i = 0
      while (i < Block) {
        sum += (if (i >= 148 && i < 156) ' '.toLong else (hdr(i) & 0xffL))
        i += 1
      }
      if (parseOctal(hdr, 148, 8) != sum)
        return Left((out.result(), s"entry $idx: header checksum mismatch"))
      val nameLen = { var n = 0; while (n < 100 && hdr(n) != 0) n += 1; n }
      val name = new String(hdr, 0, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      val size = parseOctal(hdr, 124, 12)
      if (size < 0 || size > Int.MaxValue - Block)
        return Left((out.result(), s"entry $idx: absurd size $size"))
      val padded = ((size + Block - 1) / Block * Block).toInt
      val body = new Array[Byte](padded)
      read = 0
      while (read < padded) {
        val k = in.read(body, read, padded - read)
        if (k < 0) return Left((out.result(), s"entry $idx: truncated payload"))
        read += k
      }
      if (hdr(156) == '0' || hdr(156) == 0) // regular files only
        out += ((name, java.util.Arrays.copyOf(body, size.toInt)))
      idx += 1
    }
    Right(out.result()) // unreachable
  }

  private[sources] final case class WdRow(path: String, idx: Long, key: String,
                                          ext: String, corrupt: String,
                                          payload: Array[Byte])

  final case class WdResult(entries: DataFrame, samples: DataFrame,
                            corrupt: DataFrame)

  /** Read a directory of WebDataset shards (`*.tar*`, whole-file
    * gzip/zstd sniffed). `entries` = (path, idx, key, ext, payload) in archive
    * order; `samples` regroups parts per (path, key) into an
    * ext→payload map (consecutive in a well-formed shard, but grouped
    * by key so a damaged producer interleaving parts still reassembles);
    * `corrupt` = per-file quarantine rows, entries before the damage
    * KEPT. */
  def read(spark: SparkSession, path: String,
           pathGlob: String = "*.tar*"): WdResult = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        def toRows(es: Seq[(String, Array[Byte])]) =
          es.iterator.zipWithIndex.map { case ((n, d), i) =>
            val dot = n.indexOf('.')
            val (key, ext) = if (dot < 0) (n, "") else (n.substring(0, dot), n.substring(dot + 1))
            WdRow(p, i.toLong, key, ext, null, d)
          }
        decodeEntries(bytes) match {
          case Right(es) => toRows(es)
          case Left((es, reason)) =>
            toRows(es) ++ Iterator.single(
              WdRow(p, es.length.toLong, null, null, reason, Array.emptyByteArray))
        }
      }
      .toDF()
    val entries = rows.where(col("corrupt").isNull)
      .select("path", "idx", "key", "ext", "payload")
    WdResult(
      entries = entries,
      samples = entries.groupBy("path", "key")
        .agg(min("idx").as("idx"),
          map_from_entries(array_sort(collect_list(struct(col("ext"),
            col("payload"))))).as("parts"))
        .select("path", "key", "idx", "parts"),
      corrupt = rows.where(col("corrupt").isNotNull)
        .select(col("path"), col("idx"), col("corrupt").as("reason")))
  }

  /** Export samples as WebDataset shards under `dir`, one
    * `part-NNNNN.tar` per non-empty partition. `keyCol` is the sample
    * key (string, no '.'), `partsCol` an `array<struct<ext,data>>`
    * written in array order under `<key>.<ext>`. Returns per-shard
    * stats; the fingerprint folds [[TfRecord.payloadHash64]] over
    * `name ++ payload` per entry, XOR across entries — order-independent
    * and recomputable by any reader. */
  def write(df: DataFrame, keyCol: String, partsCol: String,
            dir: String): Seq[TfRecord.Shard] = {
    val spark = df.sparkSession
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
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(hadoopConf).mkdirs(dirPath)
    df.select(col(keyCol).cast("string"), col(partsCol))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(rebuild())
          val name = f"part-$pid%05d.tar"
          val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
          var n = 0L; var bytes = 0L; var h = 0L
          try {
            it.foreach { row =>
              val key = row.getString(0)
              val parts = row.getSeq[org.apache.spark.sql.Row](1)
              parts.foreach { pr =>
                val ext = pr.getString(0)
                val data = pr.getAs[Array[Byte]](1)
                val entryName = s"$key.$ext"
                out.write(encodeEntry(entryName, data))
                val nb = entryName.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                h ^= TfRecord.payloadHash64(nb ++ data)
                bytes += data.length
              }
              n += 1 // records = samples, the unit a loader yields
            }
            out.write(endOfArchive)
          } finally out.close()
          Iterator.single(TfRecord.Shard(name, n, bytes, h))
        }
      }.collect().toSeq.sortBy(_.file)
  }

  /** [[write]] plus the `_MANIFEST.json` dataset card — same audit
    * convention as [[TfRecord.writeWithManifest]]: totals, XOR
    * fingerprint, per-shard rows, written after every shard closes. */
  def writeWithManifest(df: DataFrame, keyCol: String, partsCol: String,
                        dir: String): Seq[TfRecord.Shard] = {
    val shards = write(df, keyCol, partsCol, dir)
    TfRecord.writeManifest(df, shards, dir)
    shards
  }

  /** BYTE-BALANCED export — [[TfRecord.writeBalanced]]'s rule for the
    * tar side (VERDICT r17 #6): [[write]]'s shard layout is whatever
    * the DataFrame's partitioning happens to be, so at 100 TB an
    * oversized .tar shard is the data loader's straggler, exactly the
    * TFRecord case. Same two-level recipe, verbatim:
    *
    *  1. [[graft.ext.Packing.packSequences]] over (id, sample payload
    *     bytes) in id order — `first_bin` IS the shard id, shards are
    *     contiguous ~targetBytes id ranges, a sample never splits
    *     (each shard overhangs by at most one sample);
    *  2. one id-keyed join + `repartitionAndSortWithinPartitions` on
    *     (shard, id) — the secondary sort placing every sample in its
    *     shard's task in id order, spillable;
    *  3. [[write]]'s per-partition tar writer (partition id = shard
    *     id), plus the [[TfRecord.writeManifest]] dataset card.
    *
    * `partsCol`'s struct fields must carry the documented (ext, data)
    * names (the sizing pass reads `p.data` by name; the tar writer is
    * positional). Sizes are payload bytes — the manifest's unit — so
    * per-entry ustar framing (512-byte header + padding) rides as
    * near-constant overhead. Deterministic: shard boundaries are a
    * pure function of (ids, sizes, targetBytes); re-export is
    * byte-identical, [[TfRecord.writeBatch]]'s idempotence class. */
  def writeBalanced(df: DataFrame, keyCol: String, partsCol: String,
                    id: org.apache.spark.sql.Column, dir: String,
                    targetBytes: Long): Seq[TfRecord.Shard] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val spark = df.sparkSession
    val sized = df.select(id.cast("long").as("__id"),
      col(keyCol).cast("string").as("__k"), col(partsCol).as("__parts"))
    val assignment = graft.ext.Packing.packSequences(
        sized, col("__id"),
        expr("aggregate(__parts, 0L, (a, p) -> a + length(p.data))"),
        targetBytes)
      .select(col("doc_id").as("__id"), col("first_bin").as("__shard"))
    val numShards = assignment.agg(max("__shard")).collect()(0) match {
      case r if r.isNullAt(0) => 0
      case r => r.getLong(0).toInt + 1
    }
    if (numShards == 0) {
      val empty = Seq.empty[TfRecord.Shard]
      TfRecord.writeManifest(df, empty, dir)
      return empty
    }
    val partsType = sized.schema("__parts").dataType
    val placed = sized.join(assignment, "__id")
      .select(col("__shard"), col("__id"), col("__k"), col("__parts"))
      .rdd.map(r => ((r.getLong(0), r.getLong(1)),
        org.apache.spark.sql.Row(r.getString(2), r.get(3))))
      .repartitionAndSortWithinPartitions(
        new org.apache.spark.Partitioner {
          override def numPartitions: Int = numShards
          override def getPartition(key: Any): Int =
            key.asInstanceOf[(Long, Long)]._1.toInt
        })
      .map(_._2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("parts", partsType)))
    val shards = write(spark.createDataFrame(placed, schema),
      "key", "parts", dir)
    TfRecord.writeManifest(df, shards, dir)
    shards
  }

  /** Streaming export for `foreachBatch`: one batch-addressed shard
    * directory per micro-batch, replay-idempotent like
    * [[TfRecord.writeBatch]]. */
  def writeBatch(df: DataFrame, keyCol: String, partsCol: String,
                 dir: String, batchId: Long): Seq[TfRecord.Shard] =
    write(df, keyCol, partsCol, f"$dir/batch-$batchId%06d")
}
