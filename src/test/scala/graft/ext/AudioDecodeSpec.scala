package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import graft.functions.MediaHeaderUtil

/** Byte-level fixtures for the WAV/RIFF audio decode — the audio
  * analog of MediaHeaderSpec's image-header fixtures. Every WAV here is
  * hand-assembled (chunk ids, little-endian sizes, PCM samples), the
  * parse is cross-checked against the JDK's own independent WAV reader
  * (`javax.sound.sampled.AudioSystem`), and the sample statistics are
  * asserted as exact integers computed by hand. */
class AudioDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** Assemble a WAV: RIFF header, optional pre-`fmt ` chunks, `fmt `,
    * `data`. Field overrides exist to build INVALID files on purpose. */
  private def wavBytes(channels: Int, rate: Int, bits: Int, pcm: Array[Byte],
                       audioFormat: Int = 1, pre: Seq[Array[Byte]] = Nil,
                       blockAlignOverride: Int = -1): Array[Byte] = {
    val ba = if (blockAlignOverride >= 0) blockAlignOverride
             else channels * (bits / 8)
    val fmt = chunk("fmt ", le16(audioFormat) ++ le16(channels) ++ le32(rate) ++
      le32(rate * math.max(ba, 1)) ++ le16(ba) ++ le16(bits))
    val body = "WAVE".getBytes("US-ASCII") ++
      pre.flatten.toArray ++ fmt ++ chunk("data", pcm)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def pcm16(samples: Int*): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  // 16-bit mono 1000 Hz, 6 frames with both int16 extremes:
  // sum|s| = 0+1000+1000+32767+32768+500 = 68035 → mean 68035/6 = 11339
  private val mono16 =
    wavBytes(1, 1000, 16, pcm16(0, 1000, -1000, 32767, -32768, 500))
  // 8-bit stereo 4 Hz, 3 frames, samples biased around 128:
  // |0|+|1|+|-1|+|127|+|-128|+|0| = 257 → mean 257/6 = 42
  private val stereo8 = wavBytes(2, 4, 8,
    Array(128, 129, 127, 255, 0, 128).map(_.toByte))

  test("16-bit mono: header fields, frame count, duration, exact mean |amp|") {
    val s = MediaHeaderUtil.wavStats(mono16).get
    assert(s.channels == 1 && s.sampleRate == 1000 && s.bitsPerSample == 16)
    assert(s.nFrames == 6L)
    assert(s.durationMs == 6L) // 6 * 1000 div 1000
    assert(s.meanAbsAmp == 11339L)
  }

  test("8-bit stereo: unsigned 128-bias samples, blockAlign of 2") {
    val s = MediaHeaderUtil.wavStats(stereo8).get
    assert(s.channels == 2 && s.sampleRate == 4 && s.bitsPerSample == 8)
    assert(s.nFrames == 3L)
    assert(s.durationMs == 750L) // 3 * 1000 div 4
    assert(s.meanAbsAmp == 42L)
  }

  test("parse agrees with the JDK's independent WAV reader") {
    for ((bytes, ch, rate, bits, frames) <- Seq(
      (mono16, 1, 1000f, 16, 6L), (stereo8, 2, 4f, 8, 3L))) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(f.getChannels == ch && f.getSampleRate == rate &&
        f.getSampleSizeInBits == bits)
      assert(ais.getFrameLength == frames)
      ais.close()
    }
  }

  test("odd-sized chunk before fmt is skipped via its pad byte") {
    val withList = wavBytes(1, 1000, 16, pcm16(100, -100),
      pre = Seq(chunk("LIST", Array[Byte](1, 2, 3)))) // size 3 → 1 pad byte
    val s = MediaHeaderUtil.wavStats(withList).get
    assert(s.nFrames == 2L && s.meanAbsAmp == 100L)
  }

  test("24-bit PCM: signed little-endian triplets, exact integer mean") {
    // samples 2^20, -2^20, 70000: LE bytes hand-packed below;
    // sum|s| = 1048576 + 1048576 + 70000 = 2167152 → mean 722384
    def le24(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    val s = MediaHeaderUtil.wavStats(wavBytes(1, 48000, 24,
      le24(1048576) ++ le24(-1048576) ++ le24(70000))).get
    assert(s.bitsPerSample == 24 && s.nFrames == 3L)
    assert(s.meanAbsAmp == 722384L)
  }

  test("rejects what it cannot decode exactly, instead of guessing") {
    // IEEE-float audioFormat (3), 20-bit PCM, blockAlign inconsistent
    // with channels*bits, a data size that is not a whole frame count,
    // a truncated data chunk, RIFF-but-not-WAVE, and non-RIFF bytes
    assert(MediaHeaderUtil.parseWav(
      wavBytes(1, 1000, 16, pcm16(1), audioFormat = 3)).isEmpty)
    assert(MediaHeaderUtil.parseWav(
      wavBytes(1, 1000, 20, Array.fill(6)(0.toByte))).isEmpty)
    assert(MediaHeaderUtil.parseWav(
      wavBytes(2, 1000, 16, pcm16(1, 2), blockAlignOverride = 3)).isEmpty)
    assert(MediaHeaderUtil.parseWav(
      wavBytes(2, 1000, 16, pcm16(1, 2, 3))).isEmpty) // 6 bytes % 4 != 0...
    val truncated = mono16.dropRight(4)
    assert(MediaHeaderUtil.parseWav(truncated).isEmpty)
    val notWave = mono16.clone(); notWave(8) = 'X'
    assert(MediaHeaderUtil.parseWav(notWave).isEmpty)
    assert(MediaHeaderUtil.parseWav("not audio at all".getBytes).isEmpty)
  }

  test("property: arbitrary bytes never throw, any accepted parse is consistent") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      MediaHeaderUtil.parseWav(b).foreach { w =>
        assert(w.channels > 0 && w.sampleRate > 0 &&
          w.blockAlign == w.channels * (w.bitsPerSample / 8) &&
          w.dataOffset + w.dataLen <= b.length)
      }
    }
  }

  test("audioBatched: WAV rows decode, everything else is quarantined") {
    val ds = Seq(
      MediaRow(1L, mono16, "audio/wav"),
      MediaRow(2L, "not-audio".getBytes, "video/mp4"),
      MediaRow(3L, stereo8, "audio/wav")).toDS().repartition(2)
    val rows = Multimodal.audioBatched(ds, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(1L, 3L))
    assert(rows(0).sample_rate == 1000 && rows(0).mean_abs_amp == 11339L &&
      rows(0).duration_ms == 6L)
    assert(rows(1).channels == 2 && rows(1).bits == 8 &&
      rows(1).mean_abs_amp == 42L)
  }

  test("featuresBatched takes the real WAV branch: no raster dims, PCM frame count") {
    val ds = Seq(MediaRow(1L, mono16, "audio/wav")).toDS()
    val f = Multimodal.featuresBatched(ds).collect().head
    assert(f.width == 0 && f.height == 0 && f.n_frames == 6)
  }

  test("the SAME PCM yields the SAME stats row through WAV and FLAC containers") {
    import graft.functions.FlacCodec
    // the mono16 fixture's exact samples, re-encoded as FLAC — the
    // compressed tier must land on the identical integer statistics
    val pcm = FlacCodec.FlacPcm(1000, 1, 16,
      Array(Array(0, 1000, -1000, 32767, -32768, 500)))
    val flacBytes = FlacCodec.encode(pcm, blockSize = 16)
    val ds = Seq(
      MediaRow(1L, mono16, "audio/wav"),
      MediaRow(2L, flacBytes, "audio/flac"),
      MediaRow(3L, flacBytes.take(20), "audio/flac")). // truncated → dropped
      toDS().repartition(2)
    val rows = Multimodal.audioBatched(ds, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(1L, 2L))
    val Seq(wav, flac) = rows.toSeq
    assert(wav.format == "wav" && flac.format == "flac")
    // every numeric field identical: channels, rate, bits, frames,
    // duration, and the exact integer mean |amplitude| (68035/6 = 11339)
    assert((flac.channels, flac.sample_rate, flac.bits, flac.n_frames,
        flac.duration_ms, flac.mean_abs_amp) ===
      ((wav.channels, wav.sample_rate, wav.bits, wav.n_frames,
        wav.duration_ms, wav.mean_abs_amp)))
    assert(flac.mean_abs_amp === 11339L)
  }
}
