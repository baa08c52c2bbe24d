package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import graft.functions.{JpegGray, MediaHeaderUtil}

/** The MJPEG-in-AVI sample-decode path, fixture-verified at every layer:
  * the hand-rolled constant-gray baseline JPEG must decode BIT-EXACTLY
  * through the independent `javax.imageio` decoder (the whole exactness
  * argument of the mm_video oracle row), the RIFF/AVI chunk walk must
  * recover the header fields and the exact frame byte ranges, and
  * videoFramesBatched must produce the closed-form luminance stats the
  * DuckDB oracle prices. Hostile-byte fuzzing pins the no-throw
  * contract of the parser. */
class JpegAviSpec extends SparkSpec {
  import spark.implicits._

  test("constant-gray JPEG decodes bit-exactly via ImageIO for all 256 values") {
    (0 to 255).foreach { v =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(JpegGray.encodeConst(16, 8, v)))
      assert(img != null, s"v=$v did not decode")
      assert(img.getWidth == 16 && img.getHeight == 8)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 16)
        assert(r.getSample(x, y, 0) == v, s"v=$v pixel ($x,$y)")
    }
  }

  test("synthAvi round-trips through parseAvi: header fields + frame ranges") {
    val frames = (0 until 5).map(f => JpegGray.encodeConst(16, 16, 40 * f))
    val avi = Multimodal.synthAvi(frames, 16, 16, fps = 10)
    val info = MediaHeaderUtil.parseAvi(avi).get
    assert(info.width == 16 && info.height == 16)
    assert(info.usPerFrame == 100000L) // 1e6 / 10 fps
    assert(info.nFramesDeclared == 5L && info.frames.length == 5)
    assert(info.rate == 10L && info.scale == 1L && info.nStreams == 1)
    // the recovered byte ranges ARE the encoded frames (odd-length
    // frames exercise the word-alignment padding of the chunk walk)
    info.frames.zip(frames).foreach { case ((off, len), orig) =>
      assert(len == orig.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), orig))
    }
  }

  test("rejects non-AVI, truncated containers, and overrunning chunks") {
    assert(MediaHeaderUtil.parseAvi("plainly not a video".getBytes).isEmpty)
    val avi = Multimodal.synthAvi(
      Seq(JpegGray.encodeConst(8, 8, 7)), 8, 8, fps = 5)
    assert(MediaHeaderUtil.parseAvi(avi.dropRight(4)).isEmpty)
    // WAV is RIFF too — the 'AVI ' form type must gate
    assert(MediaHeaderUtil.parseAvi(
      Multimodal.synthAudioPayload(2L, 10L)).isEmpty)
  }

  test("property: arbitrary bytes never throw, accepted parses are consistent") {
    val rnd = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      MediaHeaderUtil.parseAvi(b).foreach { v =>
        assert(v.width > 0 && v.height > 0 && v.nFramesDeclared >= 0)
      }
    }
  }

  test("videoFramesBatched: strided sampling, exact luma, quarantine") {
    // 10 frames, maxFrames 4 → stride ceil(10/4)=3 → indices 0,3,6,9
    val vals = (0 until 10).map(f => (17 * f + 3) % 256)
    val clip = Multimodal.synthAvi(
      vals.map(JpegGray.encodeConst(16, 16, _)), 16, 16, fps = 10)
    val ds = Seq(
      MediaRow(1L, clip, "video/avi"),
      MediaRow(2L, "not a clip".getBytes, "text/plain")).toDS()
    val rows = Multimodal.videoFramesBatched(ds, maxFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.media_id).distinct.toSeq == Seq(1L))
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    rows.foreach { r =>
      assert(r.width == 16 && r.height == 16 && r.n_pixels == 256L)
      assert(r.mean_luma == vals(r.frame_idx))
    }
  }

  test("sceneCutsBatched: cuts at the MAD threshold, keyframes, dims change") {
    // frame lumas 10,20,200,210,90 → consecutive MADs 10,180,10,120;
    // threshold 64 cuts at frames 2 and 4 → scenes [0,1] [2,3] [4,4]
    val vals = Seq(10, 20, 200, 210, 90)
    val clip = Multimodal.synthAvi(
      vals.map(JpegGray.encodeConst(16, 16, _)), 16, 16, fps = 10)
    val ds = Seq(
      MediaRow(1L, clip, "video/avi"),
      MediaRow(2L, "not a clip".getBytes, "text/plain")).toDS()
    val scenes = Multimodal.sceneCutsBatched(ds, threshold = 64)
      .collect().sortBy(_.scene_idx)
    assert(scenes.map(s => (s.media_id, s.scene_idx, s.start_frame,
      s.end_frame, s.key_luma)).toSeq ==
      Seq((1L, 0, 0, 1, 10), (1L, 1, 2, 3, 200), (1L, 2, 4, 4, 90)))
    // threshold is a parameter: at 200 nothing clears the bar
    val one = Multimodal.sceneCutsBatched(Seq(MediaRow(1L, clip, "video/avi"))
      .toDS(), threshold = 200).collect()
    assert(one.toSeq.map(s => (s.scene_idx, s.start_frame, s.end_frame)) ==
      Seq((0, 0, 4)))
    // a frame-dimension change is always a cut, even with equal lumas
    val mixed = Multimodal.synthAvi(
      Seq(JpegGray.encodeConst(16, 16, 50), JpegGray.encodeConst(8, 8, 50)),
      16, 16, fps = 10)
    val md = Multimodal.sceneCutsBatched(
      Seq(MediaRow(3L, mixed, "video/avi")).toDS(), threshold = 64).collect()
    assert(md.map(s => (s.scene_idx, s.start_frame, s.end_frame)).toSeq ==
      Seq((0, 0, 0), (1, 1, 1)))
  }

  test("frame chunks filter by the matched vids stream (second stream can't leak)") {
    // hand-built AVI with TWO video streams: the strh/strf pair for
    // stream 0 and stream 1, then movi interleaving 00dc and 01dc
    // chunks — frames must come ONLY from the first (matched) stream
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(tpe) ++ body)
    val avih = le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(2) ++
      le32(0) ++ le32(2) ++ le32(0) ++ le32(16) ++ le32(16) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    def vstrh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(16) ++ le16(16)
    def vstrf = le32(40) ++ le32(16) ++ le32(16) ++ le16(1) ++ le16(24) ++
      fcc("MJPG") ++ le32(16 * 16 * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = list("strl", chunk("strh", vstrh) ++ chunk("strf", vstrf))
    val f0a = JpegGray.encodeConst(16, 16, 10)
    val f0b = JpegGray.encodeConst(16, 16, 20)
    val foreign = JpegGray.encodeConst(16, 16, 99)
    val movi = list("movi",
      chunk("00dc", f0a) ++ chunk("01dc", foreign) ++ chunk("00dc", f0b))
    val body = fcc("AVI ") ++ list("hdrl", chunk("avih", avih) ++ strl ++ strl) ++ movi
    val avi = fcc("RIFF") ++ le32(body.length) ++ body
    val info = MediaHeaderUtil.parseAvi(avi).get
    assert(info.nStreams == 2)
    assert(info.frames.length == 2, s"stream-1 frame leaked: ${info.frames}")
    val lumas = Multimodal.videoFramesBatched(
        Seq(Multimodal.MediaRow(9L, avi, "video/avi")).toDS(), maxFrames = 4)
      .collect().sortBy(_.frame_idx).map(_.mean_luma).toSeq
    assert(lumas == Seq(10, 20)) // never 99
  }

  test("A/V demux: audio stream fields, chunk reassembly, exact PCM stats") {
    // 101 samples (202 bytes) chunked at 80 bytes -> 01wb chunks of
    // 80/80/42: reassembly must cross chunk boundaries, and the video
    // frames must be untouched by the audio walk
    val pcm = Array.tabulate(101)(i => (i * 37 % 4000) - 2000)
    val pcmBytes = pcm.flatMap(v =>
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val frames = (0 until 3).map(f => JpegGray.encodeConst(16, 16, 50 * f))
    val avi = Multimodal.synthAvi(frames, 16, 16, fps = 10,
      audio = Some((8000, pcmBytes, 80)))
    val info = MediaHeaderUtil.parseAvi(avi).get
    assert(info.nStreams == 2 && info.frames.length == 3)
    val a = info.audio.get
    assert(a.formatTag == 1 && a.channels == 1 && a.sampleRate == 8000 &&
      a.bits == 16 && a.blockAlign == 2)
    assert(a.chunks.map(_._2) == Vector(80, 80, 42))
    val ds = Seq(Multimodal.MediaRow(5L, avi, "video/avi")).toDS()
    val out = Multimodal.avAudioBatched(ds).collect()
    assert(out.length == 1)
    val expAbs = pcm.map(v => math.abs(v.toLong)).sum / pcm.length
    assert(out(0) == Multimodal.MediaAudio(5L, "avi", 1, 8000, 16, 101L,
      101L * 1000 / 8000, expAbs))
    // a video-only AVI yields no audio row; the video path still works
    val videoOnly = Multimodal.synthAvi(frames, 16, 16, fps = 10)
    assert(MediaHeaderUtil.parseAvi(videoOnly).get.audio.isEmpty)
    val none = Multimodal.avAudioBatched(
      Seq(Multimodal.MediaRow(6L, videoOnly, "video/avi")).toDS()).collect()
    assert(none.isEmpty)
  }

  test("A/V demux routes a mu-law audio stream through the verified G.711 decode") {
    // bytes 0x00, 0xff, 0x80, 0x2a: |samples| 32124, 0, 32124, 5372
    // (AudioDecodeSpec's hand vector) -> mean 69620/4 = 17405; split
    // into 3-byte chunks so reassembly crosses chunk boundaries
    val ulawBytes = Array(0x00, 0xff, 0x80, 0x2a).map(_.toByte)
    val frames = (0 until 2).map(f => JpegGray.encodeConst(16, 16, 40 * f))
    val avi = Multimodal.synthAvi(frames, 16, 16, fps = 10,
      audio = Some((8000, ulawBytes, 3)), audioTag = 7)
    val a = MediaHeaderUtil.parseAvi(avi).get.audio.get
    assert(a.formatTag == 7 && a.bits == 8 && a.blockAlign == 1)
    val out = Multimodal.avAudioBatched(
      Seq(Multimodal.MediaRow(9L, avi, "video/avi")).toDS()).collect()
    assert(out.toSeq == Seq(Multimodal.MediaAudio(9L, "avi-ulaw", 1, 8000,
      16, 4L, 0L, 17405L)))
    // an unsupported audio codec (tag 2, MS-ADPCM framing we don't
    // decode) quarantines: no audio row, the video path unharmed
    val other = Multimodal.synthAvi(frames, 16, 16, fps = 10,
      audio = Some((8000, ulawBytes, 3)), audioTag = 2)
    assert(Multimodal.avAudioBatched(
      Seq(Multimodal.MediaRow(10L, other, "video/avi")).toDS())
      .collect().isEmpty)
  }

  test("synthAvPayload matches the mav closed form (mm_audio's PCM via demux)") {
    for ((id, nch) <- Seq((0L, 0L), (7L, 123L), (400L, 999L))) {
      val n = (nch % 50 + 1).toInt
      val ds = Seq(Multimodal.MediaRow(id,
        Multimodal.synthAvPayload(id, nch), "video/avi")).toDS()
      val out = Multimodal.avAudioBatched(ds).collect()(0)
      val exp = (0 until n).map(i => math.abs((id * 31 + i * 7) % 200 - 100))
      assert(out.n_frames == n.toLong && out.sample_rate == 8000)
      assert(out.mean_abs_amp == exp.sum / n)
      // and the video stream still frame-decodes from the same payload
      val vf = Multimodal.videoFramesBatched(ds, maxFrames = 4).collect()
      assert(vf.map(_.frame_idx).sorted.toSeq == Seq(0, 1))
      vf.foreach(r =>
        assert(r.mean_luma == ((id * 37 + r.frame_idx * 11) % 256).toInt))
    }
  }

  test("mutation fuzz: bit-flipped A/V payloads decode or quarantine, never throw") {
    // 300 single-bit mutations of one valid muxed clip, pushed through
    // BOTH batch decoders in one job each — the corrupted-crawl
    // contract: any row may drop (quarantine) or still decode (the flip
    // hit entropy data the walk tolerates), but nothing may throw and
    // whatever decodes must be structurally sane
    val clip = Multimodal.synthAvPayload(3L, 123L)
    val rnd = new scala.util.Random(23)
    val mutated = (0 until 300).map { i =>
      val m = clip.clone()
      val k = rnd.nextInt(m.length)
      m(k) = (m(k) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.MediaRow(i.toLong, m, "video/avi")
    }
    val ds = mutated.toDS()
    val vf = Multimodal.videoFramesBatched(ds, maxFrames = 4).collect()
    vf.foreach { r =>
      assert(r.width > 0 && r.height > 0 &&
        r.n_pixels == r.width.toLong * r.height &&
        r.mean_luma >= 0 && r.mean_luma <= 255)
    }
    val av = Multimodal.avAudioBatched(ds).collect()
    av.foreach { r =>
      assert(r.channels > 0 && r.sample_rate > 0 && r.n_frames >= 0 &&
        r.mean_abs_amp >= 0)
    }
    // the fuzz must actually exercise surviving decodes, not just drops
    assert(vf.nonEmpty && av.nonEmpty)
  }

  test("block-patterned JPEG decodes bit-exactly via ImageIO per 8x8 block") {
    // 9x8 blocks of 8x8 px = the exact dHash cell grid at 72x64
    val blocks = (0 until 72).map(m => (m * 53 + 17) % 256)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(JpegGray.encodeBlocks(72, 64, blocks)))
    assert(img != null && img.getWidth == 72 && img.getHeight == 64)
    val r = img.getRaster
    for (y <- 0 until 64; x <- 0 until 72)
      assert(r.getSample(x, y, 0) == blocks((y / 8) * 9 + x / 8),
        s"pixel ($x,$y)")
    // encodeConst must be unchanged by the delegation (all-equal blocks)
    assert(JpegGray.encodeConst(16, 8, 77).toSeq ==
      JpegGray.encodeBlocks(16, 8, Seq.fill(2)(77)).toSeq)
  }

  test("lazy sceneWalk equals the eager segmentation on a many-frame clip") {
    // VERDICT r15 task 1: the restructure (two rasters held, never the
    // clip's full raster list) must be output-identical. 64 frames of
    // LCG-pseudo-random constant lumas → MAD(f) = |v_f - v_{f-1}|, so
    // the eager reference segmentation is computable from the values.
    val vals = Iterator.iterate(17L)(v => (v * 1103515245L + 12345L) % 256)
      .map(v => ((v % 256) + 256) % 256).map(_.toInt).take(64).toSeq
    val clip = Multimodal.synthAvi(
      vals.map(JpegGray.encodeConst(16, 16, _)), 16, 16, fps = 10)
    val got = Multimodal.sceneCutsBatched(
      Seq(MediaRow(9L, clip, "video/avi")).toDS(), threshold = 64)
      .collect().sortBy(_.scene_idx)
      .map(s => (s.scene_idx, s.start_frame, s.end_frame, s.key_luma)).toSeq
    val cuts = 0 +: (1 until 64).filter(f =>
      math.abs(vals(f) - vals(f - 1)) >= 64)
    val want = cuts.zipWithIndex.map { case (start, s) =>
      val end = if (s + 1 < cuts.length) cuts(s + 1) - 1 else 63
      (s, start, end, vals(start))
    }
    assert(want.length > 5, s"degenerate fixture: $want") // real segmentation
    assert(got == want)
  }

  test("sceneKeyframeHashes: dHash of each scene's opening frame") {
    // two scenes: frames 0-1 share block pattern A (luma mean differs by
    // 0), frame 2 jumps to pattern B (every block +200 wraps... use a
    // plain big jump). Keyframe hashes must equal dhashOf of the
    // opening frames, computed here via the block closed form.
    def pat(base: Int): Seq[Int] =
      (0 until 8).flatMap(gy => (0 until 9).map(gx =>
        (base + gx * 29 + gy * 53) % 256))
    val a = JpegGray.encodeBlocks(72, 64, pat(3))
    val b = JpegGray.encodeBlocks(72, 64, pat(130))
    val clip = Multimodal.synthAvi(Seq(a, a, b), 72, 64, fps = 10)
    val got = Multimodal.sceneKeyframeHashes(
      Seq(MediaRow(5L, clip, "video/avi")).toDS(), threshold = 64)
      .collect().sortBy(_.scene_idx)
    def hashOf(base: Int): Long = {
      var h = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if ((base + gx * 29 + gy * 53) % 256 > (base + (gx + 1) * 29 + gy * 53) % 256)
          h |= 1L << (gy * 8 + gx)
      h
    }
    assert(got.map(k => (k.scene_idx, k.start_frame, k.end_frame, k.dhash))
      .toSeq == Seq((0, 0, 1, hashOf(3)), (1, 2, 2, hashOf(130))))
    assert(got(0).dhash != got(1).dhash) // the fixture discriminates
    // a sub-grid keyframe (8x8 < 9x8 cells) quarantines, scene itself kept out
    val small = Multimodal.synthAvi(
      Seq(JpegGray.encodeConst(8, 8, 50)), 8, 8, fps = 10)
    assert(Multimodal.sceneKeyframeHashes(
      Seq(MediaRow(6L, small, "video/avi")).toDS()).collect().isEmpty)
  }

  test("synthVidDupPayload: scenes are f div 3, keyframe hashes match the closed form") {
    // the no-cut-within-scene argument needs the 72 block phases to
    // have multiplicity <= 2 mod 256 (29·7 + 53 = 256, so (i,j) and
    // (i+7, j+1) collide — a chain of at most two since i+14 > 8):
    // then a 5-wide wrap window catches <= 10 blocks and the mean
    // diff tops out at 5 + 246·10/72 = 39 < 64. Pin it.
    val phases = for (j <- 0 until 8; i <- 0 until 9) yield (29 * i + 53 * j) % 256
    assert(phases.groupBy(identity).values.map(_.size).max == 2)
    assert(phases.distinct.size == 58)
    def kbOf(id: Long, s: Int): Int =
      ((id / 4 * 53 + id % 4 + 97L * s) % 256).toInt
    def hashOf(kb: Int): Long = {
      var h = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if ((kb + 29 * gx + 53 * gy) % 256 >= 227) h |= 1L << (gy * 8 + gx)
      h
    }
    for ((id, nch) <- Seq((0L, 0L), (5L, 2L), (11L, 3L), (202L, 999L))) {
      val n = (nch % 5 + 2).toInt
      val got = Multimodal.sceneKeyframeHashes(
        Seq(MediaRow(id, Multimodal.synthVidDupPayload(id, nch),
          "video/avi")).toDS(), threshold = 64)
        .collect().sortBy(_.scene_idx)
      val nScenes = if (n >= 4) 2 else 1
      assert(got.length == nScenes, s"id=$id n=$n: ${got.toSeq}")
      got.foreach { k =>
        assert(k.start_frame == 3 * k.scene_idx)
        assert(k.end_frame == math.min(3 * k.scene_idx + 2, n - 1))
        assert(k.dhash == hashOf(kbOf(id, k.scene_idx)),
          s"id=$id scene=${k.scene_idx}")
      }
    }
    // group structure: ids 40..43 (one id-div-4 group, same n) pair
    // within a few bits; an unrelated group sits far away
    val h40 = hashOf(kbOf(40L, 0)); val h43 = hashOf(kbOf(43L, 0))
    assert(java.lang.Long.bitCount(h40 ^ h43) <= 3)
  }

  test("synthVideoPayload matches the mm_video closed form end to end") {
    for ((id, nch) <- Seq((0L, 0L), (7L, 123L), (400L, 999L))) {
      val n = (nch % 9 + 2).toInt
      val ds = Seq(MediaRow(id, Multimodal.synthVideoPayload(id, nch),
        "video/avi")).toDS()
      val rows = Multimodal.videoFramesBatched(ds, maxFrames = 4)
        .collect().sortBy(_.frame_idx)
      val stride = (n + 3) / 4
      assert(rows.map(_.frame_idx).toSeq == (0 until n by stride).toSeq)
      rows.foreach(r =>
        assert(r.mean_luma == ((id * 37 + r.frame_idx * 11) % 256).toInt))
    }
  }
}
