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
      // the compressed-codec walk holds the same total-function contract
      MediaHeaderUtil.wavStatsAny(b).foreach { case (codec, s) =>
        assert(Seq("wav", "ulaw", "alaw", "adpcm").contains(codec))
        assert(s.nFrames >= 0 && s.meanAbsAmp >= 0)
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

  /** Assemble a compressed-codec WAV with a `fact` chunk. */
  private def compWav(tag: Int, channels: Int, rate: Int, bits: Int,
                      blockAlign: Int, fact: Int,
                      data: Array[Byte]): Array[Byte] = {
    val fmt = chunk("fmt ", le16(tag) ++ le16(channels) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits))
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++
      chunk("fact", le32(fact)) ++ chunk("data", data)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("ulawToPcm agrees with the JDK's independent G.711 converter, all 256 bytes") {
    import javax.sound.sampled._
    // one stream of every possible u-law byte, converted to 16-bit
    // linear by javax.sound (an independent G.711 implementation that
    // ships with the JDK) and compared value-by-value
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val raw = Array.tabulate(256)(_.toByte)
    val converted = AudioSystem.getAudioInputStream(pcmFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), ulawFmt,
        256L))
    val out = converted.readAllBytes()
    converted.close()
    assert(out.length == 512)
    (0 until 256).foreach { b =>
      val jdk = ((out(2 * b) & 0xff) | (out(2 * b + 1).toInt << 8))
      assert(MediaHeaderUtil.ulawToPcm(b) == jdk,
        s"byte $b: graft ${MediaHeaderUtil.ulawToPcm(b)} vs JDK $jdk")
    }
    // the published boundary values, stated directly
    assert(MediaHeaderUtil.ulawToPcm(0xff) == 0)      // positive silence
    assert(MediaHeaderUtil.ulawToPcm(0x7f) == 0)      // negative silence
    assert(MediaHeaderUtil.ulawToPcm(0x00) == -32124) // full negative scale
    assert(MediaHeaderUtil.ulawToPcm(0x80) == 32124)  // full positive scale
  }

  test("ulaw WAV: per-byte expansion, frames = bytes, decoded width 16") {
    // bytes 0x00, 0xff, 0x80, 0x2a: |samples| 32124, 0, 32124,
    // 0x2a -> u = 0xd5: sign 1, e 5, m 5 -> ((40+132)<<5)-132 = 5372
    // sum = 69620 -> mean 69620/4 = 17405
    val b = compWav(7, 1, 8000, 8, blockAlign = 1, fact = 4,
      Array(0x00, 0xff, 0x80, 0x2a).map(_.toByte))
    val (codec, s) = MediaHeaderUtil.wavStatsAny(b).get
    assert(codec == "ulaw")
    assert(s.channels == 1 && s.sampleRate == 8000 && s.bitsPerSample == 16)
    assert(s.nFrames == 4L && s.durationMs == 0L)
    assert(s.meanAbsAmp == 17405L)
    // PCM files still take the PCM path through wavStatsAny
    assert(MediaHeaderUtil.wavStatsAny(mono16).get._1 == "wav")
  }

  test("alawToPcm agrees with the JDK's independent G.711 converter, all 256 bytes") {
    import javax.sound.sampled._
    val alawFmt = new AudioFormat(AudioFormat.Encoding.ALAW,
      8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val raw = Array.tabulate(256)(_.toByte)
    val converted = AudioSystem.getAudioInputStream(pcmFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), alawFmt,
        256L))
    val out = converted.readAllBytes()
    converted.close()
    assert(out.length == 512)
    (0 until 256).foreach { b =>
      val jdk = ((out(2 * b) & 0xff) | (out(2 * b + 1).toInt << 8))
      assert(MediaHeaderUtil.alawToPcm(b) == jdk,
        s"byte $b: graft ${MediaHeaderUtil.alawToPcm(b)} vs JDK $jdk")
    }
    // the published boundary values, stated directly (sign bit SET is
    // positive in A-law — the opposite of μ-law)
    assert(MediaHeaderUtil.alawToPcm(0xd5) == 8)       // positive silence
    assert(MediaHeaderUtil.alawToPcm(0x55) == -8)      // negative silence
    assert(MediaHeaderUtil.alawToPcm(0xaa) == 32256)   // full positive scale
    assert(MediaHeaderUtil.alawToPcm(0x2a) == -32256)  // full negative scale
  }

  test("alaw WAV: per-byte expansion, frames = bytes, decoded width 16") {
    // bytes 0x2a, 0xaa, 0xd5, 0x00: |samples| 32256, 32256, 8,
    // 0x00 -> a = 0x55: seg 5, m 5 -> (80+264)<<4 = 5504 (negative)
    // sum = 70024 -> mean 70024/4 = 17506
    val b = compWav(6, 1, 8000, 8, blockAlign = 1, fact = 4,
      Array(0x2a, 0xaa, 0xd5, 0x00).map(_.toByte))
    val (codec, s) = MediaHeaderUtil.wavStatsAny(b).get
    assert(codec == "alaw")
    assert(s.channels == 1 && s.sampleRate == 8000 && s.bitsPerSample == 16)
    assert(s.nFrames == 4L && s.meanAbsAmp == 17506L)
    // the sample-level sibling routes identically
    val (c2, rate, ch, samples) = MediaHeaderUtil.wavSamplesAny(b).get
    assert(c2 == "alaw" && rate == 8000 && ch == 1)
    assert(samples.toSeq == Seq(-32256, 32256, 8, -5504))
  }

  test("IMA-ADPCM: hand-walked nibble state machine, fact trim, block header") {
    // block: predictor 0, step index 0, nibbles [2, 9, 15, 0] packed
    // low-first as bytes 0x92, 0x0f. Hand walk (step table [7,8,...,16@8]):
    //  n=2: diff = 7>>1 = 3          -> pred 3,  idx 0 (clamped -1)
    //  n=9: diff = 7>>2 = 1, sign    -> pred 2,  idx 0
    //  n=15: diff = 7>>3+7>>2+7>>1+7 = 11, sign -> pred -9, idx 8
    //  n=0: step=16, diff = 16>>3 = 2 -> pred -7, idx 7
    // samples [0, 3, 2, -9, -7]: sum|s| = 21 -> mean 21/5 = 4
    val data = Array[Byte](0, 0, 0, 0, 0x92.toByte, 0x0f)
    val b = compWav(17, 1, 8000, 4, blockAlign = 6, fact = 5, data)
    val (codec, s) = MediaHeaderUtil.wavStatsAny(b).get
    assert(codec == "adpcm")
    assert(s.channels == 1 && s.bitsPerSample == 16 && s.nFrames == 5L)
    assert(s.meanAbsAmp == 4L)
    // fact trims the final nibbles: fact=3 stops after [0, 3, 2]
    val trimmed = compWav(17, 1, 8000, 4, blockAlign = 6, fact = 3, data)
    val (_, t) = MediaHeaderUtil.wavStatsAny(trimmed).get
    assert(t.nFrames == 3L && t.meanAbsAmp == (0 + 3 + 2) / 3)
    // a nonzero initial predictor with all-zero nibbles decodes to the
    // constant (diff = step>>3 = 0 at index 0) — the mm_audio variant
    val const = compWav(17, 1, 8000, 4, blockAlign = 7,
      fact = 7, Array[Byte]((-77 & 0xff).toByte, 0xff.toByte, 0, 0, 0, 0, 0))
    val (_, c) = MediaHeaderUtil.wavStatsAny(const).get
    assert(c.nFrames == 7L && c.meanAbsAmp == 77L)
    // quarantine: stereo ADPCM, a step index past the table, and a
    // headerless (truncated) block are rejected, not guessed at
    assert(MediaHeaderUtil.wavStatsAny(
      compWav(17, 2, 8000, 4, 6, 5, data)).isEmpty)
    assert(MediaHeaderUtil.wavStatsAny(
      compWav(17, 1, 8000, 4, 6, 5,
        Array[Byte](0, 0, 90, 0, 0x92.toByte, 0x0f))).isEmpty)
    assert(MediaHeaderUtil.wavStatsAny(
      compWav(17, 1, 8000, 4, 6, 5, Array[Byte](0, 0))).isEmpty)
  }

  test("IMA-ADPCM: clamping at both rails and multi-block decode") {
    // two blocks of blockAlign 5: each starts a fresh (predictor,
    // index) from its own header — block 2's state must NOT leak from
    // block 1. Block 1: predictor 32760, nibbles [7, 7]: step 7 ->
    // diff 7>>3+7>>2+7>>1+7 = 11 -> 32767 (clamp), idx 8; step 16 ->
    // diff 2+4+8+16 = 30 -> 32767 (clamp at rail), idx 16.
    // Block 2: predictor -32760, nibbles [15, 15]: diff 11 sign ->
    // -32768 (clamp), idx 8; step 16, diff 30, sign -> -32768, idx 16.
    val b1 = Array[Byte]((32760 & 0xff).toByte, (32760 >> 8).toByte, 0, 0,
      0x77.toByte)
    val b2 = Array[Byte]((-32760 & 0xff).toByte, ((-32760 >> 8) & 0xff).toByte,
      0, 0, 0xff.toByte)
    val b = compWav(17, 1, 8000, 4, blockAlign = 5, fact = 6, b1 ++ b2)
    val (_, s) = MediaHeaderUtil.wavStatsAny(b).get
    assert(s.nFrames == 6L)
    // sum|s| = 32760 + 32767 + 32767 + 32760 + 32768 + 32768 = 196590
    assert(s.meanAbsAmp == 196590L / 6)
  }

  test("audioBatched spans all four codecs with exact per-codec stats") {
    val ulaw = compWav(7, 1, 8000, 8, 1, 4,
      Array(0x00, 0xff, 0x80, 0x2a).map(_.toByte))
    val adpcm = compWav(17, 1, 8000, 4, 6, 5,
      Array[Byte](0, 0, 0, 0, 0x92.toByte, 0x0f))
    val ds = Seq(
      MediaRow(1L, mono16, "audio/wav"),
      MediaRow(2L, ulaw, "audio/wav"),
      MediaRow(3L, adpcm, "audio/wav")).toDS().repartition(2)
    val rows = Multimodal.audioBatched(ds, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(rows.map(r => (r.media_id, r.format, r.mean_abs_amp)).toSeq ==
      Seq((1L, "wav", 11339L), (2L, "ulaw", 17405L), (3L, "adpcm", 4L)))
  }

  test("wavSamplesAny agrees with wavStatsAny across every codec fixture") {
    // the stats and samples decoders are separate loops — this pins
    // them against drift: recomputing the stats from the samples must
    // land on the identical row for PCM, mu-law, and ADPCM
    val ulaw = compWav(7, 1, 8000, 8, 1, 4,
      Array(0x00, 0xff, 0x80, 0x2a).map(_.toByte))
    val adpcm = compWav(17, 1, 8000, 4, 6, 5,
      Array[Byte](0, 0, 0, 0, 0x92.toByte, 0x0f))
    for (bytes <- Seq(mono16, stereo8, ulaw, adpcm)) {
      val (c1, s) = MediaHeaderUtil.wavStatsAny(bytes).get
      val (c2, rate, ch, samples) = MediaHeaderUtil.wavSamplesAny(bytes).get
      assert(c1 == c2 && rate == s.sampleRate && ch == s.channels)
      assert(samples.length / ch == s.nFrames)
      val mean = samples.map(v => math.abs(v.toLong)).sum / samples.length
      assert(mean == s.meanAbsAmp, s"codec $c1: $mean vs ${s.meanAbsAmp}")
    }
    assert(MediaHeaderUtil.wavSamplesAny("junk".getBytes).isEmpty)
  }

  test("audio fingerprint: monotone envelopes by hand, container-invariant, quarantine") {
    import graft.ext.Multimodal
    import graft.functions.FlacCodec
    // 33 samples = exactly one frame per window: a strictly falling
    // envelope sets all 32 bits, a rising one none
    val falling = Array.tabulate(33)(f => 330 - 10 * f)
    val rising = Array.tabulate(33)(f => 10 * f)
    def wavOf(pcm: Array[Int]) = wavBytes(1, 8000, 16,
      pcm.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)))
    val rows = Seq(
      Multimodal.MediaRow(1L, wavOf(falling), "audio/wav"),
      Multimodal.MediaRow(2L, wavOf(rising), "audio/wav"),
      Multimodal.MediaRow(3L,
        FlacCodec.encode(FlacCodec.FlacPcm(8000, 1, 16, Array(falling)), 16),
        "audio/flac"),
      Multimodal.MediaRow(4L, wavOf(Array.tabulate(10)(identity)), "a"),
      Multimodal.MediaRow(5L, "noise".getBytes, "text/plain"))
    val out = Multimodal.audioFingerprintBatched(rows.toDS())
      .collect().sortBy(_.media_id)
    // 4 (under 33 frames) and 5 (not audio) quarantine
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).afp == 0xffffffffL && out(1).afp == 0L)
    // the fingerprint is a property of the SAMPLES, not the container
    assert(out(2).afp == out(0).afp && out(2).codec == "flac")
    // fingerprint pairing rides nearDupImages unchanged: identical
    // envelopes at distance 0, opposite ones far apart
    val pairs = Multimodal.nearDupImages(
        out.toSeq.toDF("media_id", "codec", "sample_rate", "n_frames", "afp")
          .select("media_id", "afp"),
        org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.col("afp"), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 3L, 0)))
    graft.CacheScope.release()
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

  test("audioCodes + stored history: incremental audio dedup end to end") {
    def afps(ids: Long*) = Multimodal.audioFingerprintBatched(
      ids.map(id => MediaRow(id,
        Multimodal.synthLongAudioPayload(id, 100L), "audio/wav")).toDS()).toDF()
    // layout: the 32-bit envelope mask rides the low half verbatim
    val a = afps(7L)
    val fp = a.collect().head.getAs[Long]("afp")
    val c = Multimodal.audioCodes(a).collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) == ((7L, 0L, fp)))
    assert(c.getLong(3) == java.lang.Long.bitCount(fp))
    // history = clip 7; an exact re-ingest tags, a far envelope doesn't
    val path = java.nio.file.Files.createTempDirectory("audhist")
      .toString + "/store"
    assert(Similarity.appendCodes(Multimodal.audioCodes(a), path, 0L))
    val far = (100L to 400L).find { id =>
      val f = afps(id).collect().head.getAs[Long]("afp")
      java.lang.Long.bitCount(f ^ fp) > 3
    }.get
    // the re-ingest probe carries clip 7's PAYLOAD under a fresh id
    val probed = Multimodal.audioCodes(afps(far))
      .unionByName(Multimodal.audioCodes(afps(7L))
        .withColumn("vec_id",
          org.apache.spark.sql.functions.lit(9007L)))
    val tags = Similarity.tagNearCodes(probed, path, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(tags(9007L) === true)
    assert(tags(far) === false)
    graft.CacheScope.release()
  }
}
