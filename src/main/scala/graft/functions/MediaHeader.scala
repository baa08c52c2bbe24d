package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real still-image header parsing over an opaque binary column — the
  * codec that replaces the deterministic stub behind
  * [[graft.ext.Multimodal]]'s decode seam for the three public
  * container formats whose dimensions live at fixed or marker-addressed
  * offsets:
  *
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *    chunk (always first, per the PNG spec): 4-byte length, "IHDR",
  *    width and height as big-endian u32 at offsets 16 and 20.
  *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor:
  *    width and height as LITTLE-endian u16 at offsets 6 and 8.
  *  - JPEG: `FF D8` (SOI), then a marker walk — each segment is
  *    `FF <marker> <big-endian u16 length incl. itself>` — until a
  *    start-of-frame marker (C0–CF except C4 DHT / C8 JPG / CC DAC):
  *    its payload is precision(1), height(u16), width(u16).
  *
  * Unrecognized or truncated bytes evaluate to NULL (the caller decides
  * fallback policy — [[graft.ext.Multimodal.featuresColsDetected]]
  * coalesces to the stub dims so a mixed corpus still gets a value per
  * row). Header-only parsing reads a bounded prefix regardless of
  * payload size, so the expression is safe in a 100 TB scan: no frame
  * decode, no allocation beyond the 3-field result row.
  */
object MediaHeaderUtil {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** (format, width, height) of a recognized PNG/GIF/JPEG header. */
  def parseDims(b: Array[Byte]): Option[(String, Int, Int)] =
    png(b).orElse(gif(b)).orElse(jpeg(b))

  private def png(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16)
      val h = be32(b, 20)
      // the PNG spec caps dimensions at 2^31-1; 0 or over-cap → invalid
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(("png", w.toInt, h.toInt))
      else None
    } else None

  private def gif(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w > 0 && h > 0) Some(("gif", w, h)) else None
    } else None

  private def jpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker
      while (i < b.length && u8(b, i) == 0xff) i += 1 // fill bytes
      if (i >= b.length) return None
      val marker = u8(b, i)
      i += 1
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no SOF
      // standalone markers (TEM, RSTn) carry no length segment
      if (marker != 0x01 && !(marker >= 0xd0 && marker <= 0xd8)) {
        if (i + 1 >= b.length) return None
        val len = be16(b, i)
        if (len < 2 || i + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          val h = be16(b, i + 3) // after length(2) + precision(1)
          val w = be16(b, i + 5)
          return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
        }
        i += len
      }
    }
    None
  }

  /** Uncompressed-PCM WAV container fields (RIFF, a public format):
    * `RIFF <size> WAVE`, then word-aligned chunks of
    * `<4-byte id> <LE u32 size> <data>`. The `fmt ` chunk carries
    * audioFormat(u16, 1 = PCM), channels(u16), sampleRate(u32),
    * byteRate(u32), blockAlign(u16), bitsPerSample(u16); the `data`
    * chunk is the raw interleaved samples. */
  case class WavPcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                    blockAlign: Int, dataOffset: Int, dataLen: Int)

  /** Raw RIFF/WAVE chunk-walk result, codec-agnostic: the `fmt ` fields
    * as written, the `data` extent, and the `fact` chunk's declared
    * sample-frame count when present (the canonical format REQUIRES
    * `fact` for compressed codecs, where frames are not derivable from
    * byte length alone). */
  private case class WavRaw(audioFormat: Int, channels: Int, sampleRate: Int,
                            blockAlign: Int, bits: Int, dataOffset: Int,
                            dataLen: Int, factFrames: Option[Long])

  private def wavChunks(b: Array[Byte]): Option[WavRaw] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Long, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    var fact: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty || fact.isEmpty)) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 8 || i + 8 + size > b.length)
        return None // truncated or absurd chunk
      val sz = size.toInt
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (sz < 16) return None
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12),
          le16(b, i + 20), le16(b, i + 22)))
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
                 b(i + 3) == 'a') {
        data = Some((i + 8, sz))
      } else if (b(i) == 'f' && b(i + 1) == 'a' && b(i + 2) == 'c' &&
                 b(i + 3) == 't' && sz >= 4) {
        fact = Some(le32(b, i + 8))
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for {
      (af, ch, rate, ba, bits) <- fmt
      (off, len) <- data
      if ch > 0 && rate > 0 && rate <= Int.MaxValue && ba > 0
    } yield WavRaw(af, ch, rate.toInt, ba, bits, off, len, fact)
  }

  /** Parse a PCM WAV header — the audio analog of [[parseDims]].
    * Only linear PCM at 8 or 16 bits is accepted (the two shapes the
    * canonical format defines without an extension chunk); compressed
    * audioFormat codes, truncated chunks, or a blockAlign inconsistent
    * with channels×bits are rejected, not guessed at (the G.711 and
    * IMA-ADPCM codecs have their own decode path, [[wavStatsAny]]). */
  def parseWav(b: Array[Byte]): Option[WavPcm] =
    wavChunks(b).collect {
      case w if w.audioFormat == 1 &&
        (w.bits == 8 || w.bits == 16 || w.bits == 24) &&
        w.blockAlign == w.channels * (w.bits / 8) &&
        w.dataLen % w.blockAlign == 0 =>
        WavPcm(w.channels, w.sampleRate, w.bits, w.blockAlign,
          w.dataOffset, w.dataLen)
    }

  /** Decoded PCM statistics of a WAV payload — the audio analog of the
    * pixel-luma pass: exact integer sample arithmetic, no floats.
    * `durationMs` is `frames * 1000 div sampleRate`; `meanAbsAmp` is
    * the integer mean of |sample| over every sample of every channel
    * (8-bit samples are unsigned around a 128 bias per the format;
    * 16- and 24-bit are signed little-endian). */
  case class WavStats(channels: Int, sampleRate: Int, bitsPerSample: Int,
                      nFrames: Long, durationMs: Long, meanAbsAmp: Long)

  def wavStats(b: Array[Byte]): Option[WavStats] = parseWav(b).map { w =>
    val bytesPerSample = w.bitsPerSample / 8
    val nSamples = w.dataLen.toLong / bytesPerSample
    val nFrames = w.dataLen.toLong / w.blockAlign
    var sum = 0L
    var i = w.dataOffset
    val end = w.dataOffset + w.dataLen
    if (w.bitsPerSample == 8) {
      while (i < end) { sum += math.abs((b(i) & 0xff) - 128); i += 1 }
    } else if (w.bitsPerSample == 16) {
      while (i + 1 < end) {
        sum += math.abs((b(i) & 0xff) | (b(i + 1).toInt << 8))
        i += 2
      }
    } else { // 24-bit: little-endian, sign from the top byte
      while (i + 2 < end) {
        sum += math.abs(
          (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | (b(i + 2).toInt << 16))
        i += 3
      }
    }
    WavStats(w.channels, w.sampleRate, w.bitsPerSample, nFrames,
      nFrames * 1000L / w.sampleRate,
      if (nSamples == 0) 0L else sum / nSamples)
  }

  // ---- Compressed-WAV sample codecs: G.711 μ-law and IMA/DVI ADPCM.
  // Both are published, table-driven, integer-exact — the two codecs
  // real telephony/speech corpora actually ship inside WAV (formatTag
  // 7 and 17); everything here is from the public ITU-T G.711 and IMA
  // ADPCM specifications, no float ever. ----

  /** One G.711 μ-law byte → 16-bit linear sample (closed form):
    * complement, split sign(1)/exponent(3)/mantissa(4), expand
    * `((m·8 + 0x84) << e) - 0x84`. Byte 0xFF decodes to 0, byte 0x00
    * to -32124 (the format's full-scale magnitude). */
  def ulawToPcm(b0: Int): Int = {
    val u = (~b0) & 0xff
    val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** One G.711 A-law byte → 16-bit linear sample (closed form, ITU-T
    * G.711 / the public-domain Sun `g711.c` arithmetic): XOR 0x55,
    * split sign(1)/segment(3)/mantissa(4); segment 0 decodes to
    * `m·16 + 8`, segment s ≥ 1 to `(m·16 + 0x108) << (s-1)`. Unlike
    * μ-law the sign bit SET means positive; full scale is ±32256 and
    * "silence" (±8) is bytes 0x55/0xD5. */
  def alawToPcm(b0: Int): Int = {
    val a = (b0 ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val m = a & 0x0f
    val mag = if (seg == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** IMA/DVI ADPCM quantizer step table (89 entries) and index
    * adaptation table — the published constants every IMA decoder
    * shares. */
  val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  val ImaIndex: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Advance the IMA decoder state by one nibble: returns the new
    * (predictor, stepIndex). The predictor update is the published
    * `diff = step>>3 (+ step>>2 | + step>>1 | + step by mantissa bits)`
    * with sign bit 8, clamped to s16; the index moves by [[ImaIndex]],
    * clamped to the table. */
  def imaDecodeNibble(n: Int, pred: Int, index: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p = if ((n & 8) != 0) pred - diff else pred + diff
    (math.max(-32768, math.min(32767, p)),
      math.max(0, math.min(88, index + ImaIndex(n & 7))))
  }

  /** [[wavStats]] generalized over the compressed codecs: returns the
    * codec name with the decoded-sample statistics —
    *
    *  - `("wav", …)`: linear PCM, [[wavStats]] verbatim;
    *  - `("ulaw", …)`: formatTag 7, one byte per sample expanded
    *    through [[ulawToPcm]]; reported `bitsPerSample` is 16, the
    *    decoded width (pipelines consume G.711 as 16-bit linear);
    *  - `("adpcm", …)`: formatTag 17, MONO IMA-ADPCM — per `blockAlign`
    *    block: a 4-byte header (initial predictor s16-LE = sample 0,
    *    step index u8, reserved), then low-nibble-first sample nibbles;
    *    the `fact` chunk trims the final partial block (without it,
    *    decode runs to the container's capacity). Stereo ADPCM (4-byte
    *    channel interleave) is quarantined, not guessed at.
    *
    * Anything else returns None — the standing quarantine contract. */
  /** Decoded interleaved SAMPLES of any supported WAV codec — the
    * sample-level sibling of [[wavStatsAny]] for consumers that need
    * the waveform itself (fingerprinting, resampling seams), sharing
    * the same codec routing and quarantine contract: ("wav", rate,
    * channels, samples) for linear PCM, ("ulaw", …) expanded through
    * [[ulawToPcm]], ("adpcm", …) through the mono IMA state machine
    * with the `fact` trim. Memory is payload-bounded (one Int per
    * sample). */
  def wavSamplesAny(b: Array[Byte])
      : Option[(String, Int, Int, Array[Int])] =
    wavChunks(b).flatMap { w =>
      if (w.audioFormat == 1 &&
          (w.bits == 8 || w.bits == 16 || w.bits == 24) &&
          w.blockAlign == w.channels * (w.bits / 8) &&
          w.dataLen % w.blockAlign == 0) {
        val bps = w.bits / 8
        val n = w.dataLen / bps
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val o = w.dataOffset + i * bps
          out(i) =
            if (w.bits == 8) (b(o) & 0xff) - 128
            else if (w.bits == 16) (b(o) & 0xff) | (b(o + 1).toInt << 8)
            else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              (b(o + 2).toInt << 16)
          i += 1
        }
        Some(("wav", w.sampleRate, w.channels, out))
      } else if (w.audioFormat == 7 && w.bits == 8 &&
                 w.blockAlign == w.channels && w.dataLen % w.channels == 0) {
        val out = new Array[Int](w.dataLen)
        var i = 0
        while (i < w.dataLen) {
          out(i) = ulawToPcm(b(w.dataOffset + i) & 0xff); i += 1
        }
        Some(("ulaw", w.sampleRate, w.channels, out))
      } else if (w.audioFormat == 6 && w.bits == 8 &&
                 w.blockAlign == w.channels && w.dataLen % w.channels == 0) {
        val out = new Array[Int](w.dataLen)
        var i = 0
        while (i < w.dataLen) {
          out(i) = alawToPcm(b(w.dataOffset + i) & 0xff); i += 1
        }
        Some(("alaw", w.sampleRate, w.channels, out))
      } else if (w.audioFormat == 17 && w.channels == 1 && w.bits == 4 &&
                 w.blockAlign >= 4) {
        val want = w.factFrames.getOrElse(Long.MaxValue)
        val end = w.dataOffset + w.dataLen
        val buf = new java.util.ArrayList[Integer]()
        var off = w.dataOffset
        var bad = false
        while (!bad && off + 4 <= end && buf.size < want) {
          var pred = (le16(b, off) << 16) >> 16
          var idx = u8(b, off + 2)
          if (idx > 88) bad = true
          else {
            buf.add(pred)
            var j = off + 4
            val bend = math.min(off + w.blockAlign, end)
            while (j < bend && buf.size < want) {
              val by = u8(b, j)
              var k = 0
              while (k < 2 && buf.size < want) {
                val st = imaDecodeNibble(if (k == 0) by & 0x0f
                  else (by >> 4) & 0x0f, pred, idx)
                pred = st._1; idx = st._2
                buf.add(pred)
                k += 1
              }
              j += 1
            }
            off += w.blockAlign
          }
        }
        if (bad || buf.isEmpty) None
        else {
          val out = new Array[Int](buf.size)
          var i = 0
          while (i < out.length) { out(i) = buf.get(i); i += 1 }
          Some(("adpcm", w.sampleRate, 1, out))
        }
      } else None
    }

  def wavStatsAny(b: Array[Byte]): Option[(String, WavStats)] =
    wavStats(b).map(("wav", _)).orElse(wavChunks(b).flatMap { w =>
      if (w.audioFormat == 7 && w.bits == 8 && w.blockAlign == w.channels &&
          w.dataLen % w.channels == 0) {
        var sum = 0L
        var i = w.dataOffset
        val end = w.dataOffset + w.dataLen
        while (i < end) { sum += math.abs(ulawToPcm(b(i) & 0xff)); i += 1 }
        val frames = w.dataLen.toLong / w.channels
        Some(("ulaw", WavStats(w.channels, w.sampleRate, 16, frames,
          frames * 1000L / w.sampleRate,
          if (w.dataLen == 0) 0L else sum / w.dataLen)))
      } else if (w.audioFormat == 6 && w.bits == 8 &&
                 w.blockAlign == w.channels && w.dataLen % w.channels == 0) {
        var sum = 0L
        var i = w.dataOffset
        val end = w.dataOffset + w.dataLen
        while (i < end) { sum += math.abs(alawToPcm(b(i) & 0xff)); i += 1 }
        val frames = w.dataLen.toLong / w.channels
        Some(("alaw", WavStats(w.channels, w.sampleRate, 16, frames,
          frames * 1000L / w.sampleRate,
          if (w.dataLen == 0) 0L else sum / w.dataLen)))
      } else if (w.audioFormat == 17 && w.channels == 1 && w.bits == 4 &&
                 w.blockAlign >= 4) {
        val want = w.factFrames.getOrElse(Long.MaxValue)
        val end = w.dataOffset + w.dataLen
        var off = w.dataOffset
        var produced = 0L
        var sum = 0L
        var bad = false
        while (!bad && off + 4 <= end && produced < want) {
          var pred = (le16(b, off) << 16) >> 16 // sign-extend s16
          var idx = u8(b, off + 2)
          if (idx > 88) bad = true
          else {
            sum += math.abs(pred); produced += 1
            var j = off + 4
            val bend = math.min(off + w.blockAlign, end)
            while (j < bend && produced < want) {
              val by = u8(b, j)
              var k = 0
              while (k < 2 && produced < want) {
                val st = imaDecodeNibble(if (k == 0) by & 0x0f
                  else (by >> 4) & 0x0f, pred, idx)
                pred = st._1; idx = st._2
                sum += math.abs(pred); produced += 1
                k += 1
              }
              j += 1
            }
            off += w.blockAlign
          }
        }
        if (bad || produced == 0) None
        else Some(("adpcm", WavStats(1, w.sampleRate, 16, produced,
          produced * 1000L / w.sampleRate, sum / produced)))
      } else None
    })

  /** FLAC STREAMINFO fields — the compressed-audio analog of
    * [[parseWav]], read from the public container structure: the
    * `fLaC` magic, then metadata blocks of
    * `[1 byte: last-flag | type][u24 length][body]`, where the spec
    * REQUIRES the first block to be STREAMINFO (type 0, 34 bytes):
    * u16 min/max block size, u24 min/max frame size, then a packed
    * 64-bit field of 20-bit sample rate, 3-bit channels-1, 5-bit
    * bits-per-sample-1, 36-bit total samples, and the 128-bit MD5 of
    * the unencoded audio. This is the routing/stats pass
    * ([[parseMp4]]'s role for video); SAMPLE decode lives in
    * [[FlacCodec.decode]], a pure-JVM frame decoder built on this
    * same STREAMINFO parse. */
  case class FlacInfo(sampleRate: Int, channels: Int, bits: Int,
                      nSamples: Long, durationMs: Long, md5Hex: String)

  def parseFlac(b: Array[Byte]): Option[FlacInfo] = {
    if (b.length < 42 ||
        b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    // first block must be STREAMINFO (type 0) per the format
    val hdr = u8(b, 4)
    val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if ((hdr & 0x7f) != 0 || len < 34 || 8 + len > b.length) return None
    val s = 8 // STREAMINFO body offset
    val sr = (u8(b, s + 10) << 12) | (u8(b, s + 11) << 4) | (u8(b, s + 12) >> 4)
    val ch = ((u8(b, s + 12) >> 1) & 0x7) + 1
    val bps = (((u8(b, s + 12) & 0x1) << 4) | (u8(b, s + 13) >> 4)) + 1
    val ns = ((u8(b, s + 13) & 0xf).toLong << 32) |
      (u8(b, s + 14).toLong << 24) | (u8(b, s + 15).toLong << 16) |
      (u8(b, s + 16).toLong << 8) | u8(b, s + 17).toLong
    if (sr <= 0) return None // 0 is invalid outside non-audio streams
    val md5 = (18 until 34).map(k => f"${u8(b, s + k)}%02x").mkString
    Some(FlacInfo(sr, ch, bps, ns, ns * 1000L / sr, md5))
  }

  /** ISO-BMFF (MP4/MOV) container fields — the video analog of
    * [[parseWav]], parsed from the public box structure: a file is a
    * sequence of boxes `[u32 size]["4cc" type][payload]` (size 1 = u64
    * largesize follows; size 0 = to end of file), with container boxes
    * (`moov`, `trak`, `mdia`, `minf`, `stbl`) nesting further boxes.
    * Extracted: the `ftyp` major brand, `mvhd` timescale + duration
    * (version 0 = u32 fields, version 1 = u64), the track count, the
    * first non-degenerate `tkhd` display dimensions (16.16 fixed point,
    * integer part taken), and that track's total `stts` sample count —
    * the container's own frame count. FRAME PIXEL DECODE is out of
    * scope (no codec shipped); this is the metadata a real pipeline
    * reads before routing payloads to a decoder fleet. */
  case class Mp4Info(brand: String, timescale: Long, durationMs: Long,
                     nTracks: Int, width: Int, height: Int, nSamples: Long)

  private val Mp4Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  def parseMp4(b: Array[Byte]): Option[Mp4Info] = {
    if (b.length < 16) return None
    // the first box must be ftyp (the signature of the format)
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    val firstSize = be32(b, 0)
    if (firstSize < 16 || firstSize > b.length) return None
    val brand = new String(b, 8, 4, "US-ASCII")
    var timescale = 0L; var duration = -1L
    var nTracks = 0; var width = 0; var height = 0; var nSamples = 0L

    /** Iterate sibling boxes in [from, to); `onBox(type, body, end)`.
      * Returns false on a structural error (truncated/absurd box). */
    def boxes(from: Int, to: Int)(onBox: (String, Int, Int) => Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i)
        var header = 8
        val size: Long =
          if (size32 == 1L) {
            if (i + 16 > to) return false
            header = 16
            (be32(b, i + 8) << 32) | be32(b, i + 12)
          } else if (size32 == 0L) (to - i).toLong
          else size32
        if (size < header || i + size > to) return false
        val tpe = new String(b, i + 4, 4, "US-ASCII")
        val end = (i + size).toInt
        if (!onBox(tpe, i + header, end)) return false
        i = end
      }
      true
    }

    /** Scan one trak subtree: first tkhd display dims (16.16 fixed
      * point — the LAST 8 bytes of the box in both versions) and the
      * total stts sample count. */
    def trackScan(from: Int, to: Int, depth: Int,
                  acc: Array[Long]): Boolean =
      boxes(from, to) { (tpe, body, end) =>
        tpe match {
          case t if Mp4Containers(t) && depth < 8 =>
            trackScan(body, end, depth + 1, acc)
          case "tkhd" if end - body >= 8 =>
            if (acc(0) == 0) {
              acc(0) = be32(b, end - 8) >> 16
              acc(1) = be32(b, end - 4) >> 16
            }
            true
          case "stts" if end - body >= 8 =>
            val n = be32(b, body + 4)
            if (body + 8 + n * 8 > end) false
            else {
              var k = 0
              while (k < n) { acc(2) += be32(b, body + 8 + k * 8); k += 1 }
              true
            }
          case _ => true
        }
      }

    def walk(from: Int, to: Int, depth: Int): Boolean =
      boxes(from, to) { (tpe, body, end) =>
        tpe match {
          case "trak" =>
            nTracks += 1
            val acc = Array(0L, 0L, 0L) // w, h, samples
            if (!trackScan(body, end, 0, acc)) false
            else {
              // keep the FIRST track with non-degenerate display dims
              // (the video track; audio tkhds carry 0×0)
              if (width == 0 && acc(0) > 0 && acc(1) > 0) {
                width = acc(0).toInt; height = acc(1).toInt
                nSamples = acc(2)
              }
              true
            }
          case t if Mp4Containers(t) && depth < 8 =>
            walk(body, end, depth + 1)
          case "mvhd" =>
            val v = if (end - body >= 1) u8(b, body) else -1
            if (v == 1 && end - body >= 32) {
              timescale = be32(b, body + 20)
              duration = (be32(b, body + 24) << 32) | be32(b, body + 28)
            } else if (v == 0 && end - body >= 20) {
              timescale = be32(b, body + 12)
              duration = be32(b, body + 16)
            }
            true
          case _ => true
        }
      }

    if (!walk(firstSize.toInt, b.length, 0)) return None
    if (timescale <= 0 || duration < 0) return None
    Some(Mp4Info(brand, timescale, duration * 1000L / timescale,
      nTracks, width, height, nSamples))
  }

  /** RIFF/AVI container fields (a public Microsoft format, the video
    * analog of [[parseWav]]'s chunk walk): `RIFF <size> AVI `, then
    * word-aligned chunks `[4cc id][LE u32 size][data]`, where `LIST`
    * chunks carry a 4cc list type and nest further chunks. Extracted:
    * the `avih` main header (µs per frame, declared total frames,
    * stream count, width, height), the first `vids` stream's `strh`
    * rate/scale, and every frame chunk inside the `movi` list
    * (`##dc`/`##db` — compressed/uncompressed DIB data; for the MJPEG
    * fourcc each `##dc` payload is one complete baseline JPEG that
    * `javax.imageio` decodes). Frame PIXEL decode lives in
    * [[graft.ext.Multimodal.videoFramesBatched]], built on this parse —
    * the seam [[parseMp4]] leaves open is closed for this container. */
  /** The AVI container's audio stream — `auds` strh + WAVEFORMATEX strf
    * fields plus the byte ranges of that stream's `##wb` data chunks in
    * movi order. PCM (formatTag 1) reassembles losslessly by
    * concatenating the chunk payloads. (The video side surfaces the
    * matched `vids` stream's rate/scale; the strh dwLength is not
    * carried — `frames.length`/`nFramesDeclared` are the frame
    * counts.) */
  case class AviAudio(formatTag: Int, channels: Int, sampleRate: Int,
                      bits: Int, blockAlign: Int,
                      chunks: Vector[(Int, Int)])

  case class AviInfo(width: Int, height: Int, usPerFrame: Long,
                     nFramesDeclared: Long, rate: Long, scale: Long,
                     nStreams: Int, frames: Vector[(Int, Int)],
                     audio: Option[AviAudio])

  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
    val riffSize = le32(b, 4)
    if (riffSize < 4 || 8 + riffSize > b.length) return None
    var usPerFrame = 0L; var totalFrames = -1L; var nStreams = 0
    var width = 0; var height = 0
    var rate = 0L; var scale = 0L
    var vids = false // the NEXT strh seen decides; latched once found
    // stream bookkeeping: strh order assigns stream numbers, which the
    // movi chunk ids ("NNwb"/"NNdc") reference as two decimal digits;
    // BOTH chunk families filter on their matched stream, so a second
    // video stream (or any stranger emitting dc chunks) can't leak
    // foreign frames into the first stream's frame list
    var streamNo = -1
    var curType = ""
    var vidStream = -1
    var audStream = -1
    var audFmt: Option[(Int, Int, Int, Int, Int)] = None
    val frames = Vector.newBuilder[(Int, Int)]
    val audChunks = Vector.newBuilder[(Int, Int)]

    /** Iterate sibling chunks in [from, to); false on structural error. */
    def chunks(from: Int, to: Int, depth: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        val size = le32(b, i + 4)
        if (size < 0 || size > Int.MaxValue - 8 || i + 8 + size > to)
          return false
        val sz = size.toInt
        val id = new String(b, i, 4, "US-ASCII")
        if (id == "LIST") {
          if (sz < 4) return false
          if (!chunks(i + 12, i + 8 + sz, depth + 1)) return false
        } else id match {
          case "avih" if sz >= 40 =>
            usPerFrame = le32(b, i + 8)
            totalFrames = le32(b, i + 24)
            nStreams = le32(b, i + 32).toInt
            width = le32(b, i + 40).toInt
            height = le32(b, i + 44).toInt
          case "strh" if sz >= 40 =>
            streamNo += 1
            curType = new String(b, i + 8, 4, "US-ASCII")
            if (curType == "vids" && !vids) {
              vids = true
              vidStream = streamNo
              scale = le32(b, i + 28)
              rate = le32(b, i + 32)
            }
          case "strf" if curType == "auds" && audStream < 0 && sz >= 16 =>
            // WAVEFORMATEX: wFormatTag, nChannels, nSamplesPerSec,
            // nAvgBytesPerSec, nBlockAlign, wBitsPerSample
            audStream = streamNo
            audFmt = Some((le16(b, i + 8), le16(b, i + 10),
              le32(b, i + 12).toInt, le16(b, i + 22), le16(b, i + 20)))
          case fid if fid.length == 4 && fid(0).isDigit && fid(1).isDigit =>
            val sn = (fid(0) - '0') * 10 + (fid(1) - '0')
            if ((fid.endsWith("dc") || fid.endsWith("db")) && sn == vidStream)
              frames += ((i + 8, sz))
            else if (fid.endsWith("wb") && sn == audStream)
              audChunks += ((i + 8, sz))
          case _ => ()
        }
        i += 8 + sz + (sz & 1) // word alignment, as in the WAV walk
      }
      true
    }

    if (!chunks(12, math.min(b.length, 8 + riffSize.toInt), 0)) return None
    if (totalFrames < 0 || width <= 0 || height <= 0) return None
    val audio = audFmt.map { case (tag, ch, sr, bits, ba) =>
      AviAudio(tag, ch, sr, bits, ba, audChunks.result())
    }
    Some(AviInfo(width, height, usPerFrame, totalFrames, rate, scale,
      nStreams, frames.result(), audio))
  }

  /** Expression-facing wrapper: result row, or null when unrecognized. */
  def parse(b: Array[Byte]): InternalRow = parseDims(b) match {
    case Some((f, w, h)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(f),
        Integer.valueOf(w), Integer.valueOf(h)))
    case None => null
  }
}

/** `media_dims(binary)` → struct(format, width, height) or null —
  * native codegen (one static call, same pattern as [[Cis2Decode]]) so
  * header sniffing stays inside whole-stage codegen on the scan. */
case class MediaDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_dims requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = MediaHeaderUtil.schema
  override def nullable: Boolean = true
  override def prettyName: String = "media_dims"

  override def nullSafeEval(input: Any): Any =
    MediaHeaderUtil.parse(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaHeaderUtil.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaDims =
    copy(child = newChild)
}
