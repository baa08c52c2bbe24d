package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream

/** Whole-file compression sniffing shared by the byte-stream readers
  * ([[WarcCorpus]], [[TfRecord]], [[WebDataset]]): magic-byte dispatch
  * to gzip (RFC 1952, `1f 8b`) or zstd (RFC 8878, `28 b5 2f fd` —
  * the frame magic, little-endian on disk), else the raw stream.
  * Zstd decode rides the `zstd-jni` Spark itself ships for shuffle and
  * parquet codecs — no new dependency. `setContinuous(true)` makes
  * concatenated frames (the member-per-record layout some producers
  * emit, mirroring record-gzip) read as one stream, matching
  * `GZIPInputStream`'s multi-member behavior. */
private[sources] object Unpack {
  def stream(bytes: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b)
      new BufferedInputStream(new GZIPInputStream(raw))
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x28 &&
        (bytes(1) & 0xff) == 0xb5 && (bytes(2) & 0xff) == 0x2f &&
        (bytes(3) & 0xff) == 0xfd) {
      val z = new com.github.luben.zstd.ZstdInputStream(raw)
      z.setContinuous(true)
      new BufferedInputStream(z)
    } else new BufferedInputStream(raw)
  }
}
