package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FlacCodec
import graft.functions.FlacCodec.FlacPcm

/** Sample-level FLAC decode pinned three independent ways, the
  * AudioDecodeSpec rigor for the compressed tier (the container ships
  * no FLAC tooling, so no external encoder exists to diff against):
  *
  *  1. the two checksums against their PUBLISHED check values ("123456789"
  *     → 0xF4 for CRC-8/0x07, 0xFEE8 for CRC-16/0x8005) — the framing
  *     can't be right if these are wrong;
  *  2. HAND-ASSEMBLED streams (bits written by a local writer in this
  *     spec, field values computed from the published format layout in
  *     comments) that the decoder must read back exactly — constant,
  *     verbatim, fixed-order-2 rice, and all three stereo decorrelation
  *     modes, none of which the subset encoder emits for 2-channel
  *     cases, so these paths are proven independently of encode();
  *  3. encoder round-trips across signal shapes, widths, channel
  *     counts, and non-dividing block sizes, with the STREAMINFO MD5
  *     verified by decode() on every pass.
  *
  * Plus the quarantine contract: corrupt CRC-8/CRC-16/MD5 or reserved
  * codes → None, never a partial result. */
class FlacCodecSpec extends AnyFunSuite {

  test("CRC-8 and CRC-16 match their published check values") {
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(v, 0, v.length) === 0xf4)
    assert(FlacCodec.crc16(v, 0, v.length) === 0xfee8)
  }

  // ---- local bit writer: independent of FlacCodec's internals

  private class W {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = (w - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  /** fLaC magic + STREAMINFO for the given stream shape (zero MD5 =
    * decoder skips the hash check; these fixtures pin frame layout). */
  private def streaminfo(sr: Int, ch: Int, bits: Int, nSamples: Long): Array[Byte] = {
    val w = new W
    w.bits('f', 8); w.bits('L', 8); w.bits('a', 8); w.bits('C', 8)
    w.bits(0x80, 8) // last block | type 0
    w.bits(34, 24)
    w.bits(16, 16); w.bits(65535, 16) // min/max block size
    w.bits(0, 24); w.bits(0, 24) // frame sizes unknown
    w.bits(sr, 20); w.bits(ch - 1, 3); w.bits(bits - 1, 5)
    w.bits(nSamples, 36)
    (0 until 16).foreach(_ => w.bits(0, 8)) // MD5 absent
    w.bytes
  }

  /** Frame header for: fixed blocking, frame 0, explicit 16-bit block
    * size, sample rate from STREAMINFO, given channel code and an
    * 8-bit sample-size code (001). Returns header WITH its CRC-8. */
  private def frameHeader(blockSize: Int, chCode: Int): Array[Byte] = {
    val w = new W
    w.bits(0x3ffe, 14) // sync
    w.bit(0); w.bit(0) // reserved, fixed blocking
    w.bits(7, 4)       // block size: 16-bit at end
    w.bits(0, 4)       // sample rate: STREAMINFO
    w.bits(chCode, 4)
    w.bits(1, 3)       // sample size code 001 = 8 bit
    w.bit(0)           // reserved
    w.bits(0, 8)       // UTF-8 frame number 0
    w.bits(blockSize - 1, 16)
    w.align()
    val h = w.bytes
    h :+ FlacCodec.crc8(h, 0, h.length).toByte
  }

  private def finishFrame(head: Array[Byte], body: W): Array[Byte] = {
    body.align()
    val f = head ++ body.bytes
    val crc = FlacCodec.crc16(f, 0, f.length)
    f ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  test("hand-assembled constant + verbatim subframes decode exactly") {
    // mono 8-bit, 4 samples, one frame, CONSTANT value -3:
    // subframe header 0|000000|0, then 8-bit signed 0xFD
    val c = new W
    c.bit(0); c.bits(0, 6); c.bit(0)
    c.bits(0xfd, 8) // -3 two's complement
    val constant = streaminfo(8000, 1, 8, 4) ++
      finishFrame(frameHeader(4, chCode = 0), c)
    val d1 = FlacCodec.decode(constant).get
    assert(d1.samples(0).toSeq === Seq(-3, -3, -3, -3))
    assert(d1.sampleRate === 8000 && d1.channels === 1 && d1.bits === 8)

    // VERBATIM 5, -1, 127, -128: subframe header 0|000001|0 then raw
    val v = new W
    v.bit(0); v.bits(1, 6); v.bit(0)
    Seq(5, 0xff, 0x7f, 0x80).foreach(x => v.bits(x, 8))
    val verbatim = streaminfo(8000, 1, 8, 4) ++
      finishFrame(frameHeader(4, chCode = 0), v)
    assert(FlacCodec.decode(verbatim).get.samples(0).toSeq ===
      Seq(5, -1, 127, -128))
  }

  test("hand-assembled fixed-order-2 rice residual decodes by the published arithmetic") {
    // mono 8-bit, 6 samples: x = 1, 3, 6, 10, 15, 21 (2nd differences
    // all 1). Fixed order 2: warmup 1, 3; residuals r[i] =
    // x[i] - 2x[i-1] + x[i-2] = 1, 1, 1, 1. Rice param 0, zigzag(1)=2 →
    // unary 001 each. Subframe header 0|001010|0 (fixed, order 2).
    val w = new W
    w.bit(0); w.bits(10, 6); w.bit(0)
    w.bits(1, 8); w.bits(3, 8) // warmup
    w.bits(0, 2) // 4-bit rice method
    w.bits(0, 4) // partition order 0
    w.bits(0, 4) // rice parameter 0
    (1 to 4).foreach(_ => w.bits(1, 3)) // zigzag(1)=2 → 001 unary, no low bits
    val fx = streaminfo(8000, 1, 8, 6) ++
      finishFrame(frameHeader(6, chCode = 0), w)
    assert(FlacCodec.decode(fx).get.samples(0).toSeq === Seq(1, 3, 6, 10, 15, 21))
  }

  test("hand-assembled left/side, right/side, mid/side all un-decorrelate") {
    def constSub(w: W, value: Int, bits: Int): Unit = {
      w.bit(0); w.bits(0, 6); w.bit(0)
      w.bits(value.toLong & ((1L << bits) - 1), bits)
    }
    // chCode 8 = left/side: L=5 (8 bit), side=3 (9 bit) → R = 5-3 = 2
    val ls = new W
    constSub(ls, 5, 8); constSub(ls, 3, 9)
    val dls = FlacCodec.decode(streaminfo(8000, 2, 8, 2) ++
      finishFrame(frameHeader(2, chCode = 8), ls)).get
    assert(dls.samples(0).toSeq === Seq(5, 5) && dls.samples(1).toSeq === Seq(2, 2))

    // chCode 9 = side/right: side=3 (9 bit), R=2 (8 bit) → L = 2+3 = 5
    val rs = new W
    constSub(rs, 3, 9); constSub(rs, 2, 8)
    val drs = FlacCodec.decode(streaminfo(8000, 2, 8, 2) ++
      finishFrame(frameHeader(2, chCode = 9), rs)).get
    assert(drs.samples(0).toSeq === Seq(5, 5) && drs.samples(1).toSeq === Seq(2, 2))

    // chCode 10 = mid/side with L=4, R=3: mid=(4+3)>>1=3, side=1 →
    // reconstruct: m=3<<1|1=7; L=(7+1)>>1=4, R=(7-1)>>1=3
    val ms = new W
    constSub(ms, 3, 8); constSub(ms, 1, 9)
    val dms = FlacCodec.decode(streaminfo(8000, 2, 8, 2) ++
      finishFrame(frameHeader(2, chCode = 10), ms)).get
    assert(dms.samples(0).toSeq === Seq(4, 4) && dms.samples(1).toSeq === Seq(3, 3))
  }

  test("hand-assembled wasted-bits subframe shifts back up") {
    // constant with 2 wasted bits: flag 1, unary(wasted-1=1) = 01,
    // then a 6-bit constant 5 → decoded sample = 5 << 2 = 20
    val w = new W
    w.bit(0); w.bits(0, 6)
    w.bit(1) // wasted-bits flag
    w.bit(0); w.bit(1) // unary 1 → wasted = 2
    w.bits(5, 6) // 8-2 = 6 effective bits
    val d = FlacCodec.decode(streaminfo(8000, 1, 8, 3) ++
      finishFrame(frameHeader(3, chCode = 0), w)).get
    assert(d.samples(0).toSeq === Seq(20, 20, 20))
  }

  // ---- deterministic signal generators (no Random: reproducible)

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def roundTrip(pcm: FlacPcm, blockSize: Int): Unit = {
    val decoded = FlacCodec.decode(FlacCodec.encode(pcm, blockSize))
      .getOrElse(fail("decode returned None"))
    assert(decoded.sampleRate === pcm.sampleRate)
    assert(decoded.channels === pcm.channels)
    assert(decoded.bits === pcm.bits)
    (0 until pcm.channels).foreach { c =>
      assert(decoded.samples(c).toSeq === pcm.samples(c).toSeq, s"channel $c")
    }
  }

  test("round-trip: smooth, noisy, flat, and full-scale signals, MD5-verified") {
    // smooth quadratic-ish ramp — fixed predictors should compress it
    val smooth = Array.tabulate(1000)(i => (i * i / 37 - i) % 30000)
    roundTrip(FlacPcm(44100, 1, 16, Array(smooth)), 256)
    // small-amplitude noise
    val noise = lcg(7L).map(v => (v % 97).toInt).take(1000).toArray
    roundTrip(FlacPcm(16000, 1, 16, Array(noise)), 256)
    // flat → constant subframes
    roundTrip(FlacPcm(8000, 1, 16, Array(Array.fill(500)(-12345))), 128)
    // full-scale white noise → verbatim fallback, still exact
    val wild = lcg(11L).map(v => Math.floorMod(v, 65536L).toInt - 32768).take(700).toArray
    roundTrip(FlacPcm(48000, 1, 16, Array(wild)), 200)
  }

  test("round-trip: 8/24-bit widths, multi-channel, non-dividing block sizes") {
    val a = lcg(3L).map(v => (v % 200 - 100).toInt).take(777).toArray
    val b = lcg(5L).map(v => (v % 120).toInt).take(777).toArray
    roundTrip(FlacPcm(22050, 2, 8, Array(
      a.map(v => math.max(-128, math.min(127, v / 2))),
      b.map(v => v % 128))), 250) // 777 = 3×250 + 27: short last frame
    val c24 = lcg(9L).map(v => (v % 4000000 - 2000000).toInt).take(300).toArray
    roundTrip(FlacPcm(96000, 1, 24, Array(c24)), 64)
    val four = (0 until 4).map(ch =>
      lcg(13L + ch).map(v => (v % 3000 - 1500).toInt).take(333).toArray).toArray
    roundTrip(FlacPcm(44100, 4, 16, four), 100)
  }

  test("unknown-length stream (STREAMINFO total-samples = 0) decodes to EOF") {
    // the FLAC spec defines total-samples 0 as UNKNOWN length, not
    // empty (ADVICE r11): an externally encoded live-capture stream
    // carries frames the decoder must walk to EOF. Patch the encoded
    // STREAMINFO: zero the 36-bit total (low nibble of byte 21 + bytes
    // 22-25); the MD5 stays and must still verify the decoded PCM.
    val samples = Array.tabulate(700)(i => (i * 13 % 4000) - 2000)
    val enc = FlacCodec.encode(FlacPcm(8000, 1, 16, Array(samples)), 256)
    val patched = enc.clone()
    patched(21) = (patched(21) & 0xf0).toByte
    for (i <- 22 to 25) patched(i) = 0
    val out = FlacCodec.decode(patched)
    assert(out.nonEmpty, "unknown-length stream must decode, not quarantine")
    assert(out.get.samples(0).toSeq == samples.toSeq)
    // an actually-empty unknown-length stream (no frame bytes) still
    // decodes to zero samples
    val emptyEnc = FlacCodec.encode(FlacPcm(8000, 1, 16, Array(Array.empty[Int])), 256)
    val emptyPatched = emptyEnc.clone()
    emptyPatched(21) = (emptyPatched(21) & 0xf0).toByte
    val emptyOut = FlacCodec.decode(emptyPatched)
    assert(emptyOut.nonEmpty && emptyOut.get.samples(0).isEmpty)
  }

  test("property: arbitrary and mutated bytes never throw — None or a valid parse") {
    val rnd = new scala.util.Random(1234)
    // pure noise with a plausible prefix mix
    (0 until 1500).foreach { i =>
      val len = rnd.nextInt(200)
      val b = Array.fill(len)(rnd.nextInt().toByte)
      if (i % 3 == 0 && len >= 4) { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      FlacCodec.decode(b) // must not throw; value irrelevant
    }
    // every single-byte corruption of a REAL stream: decode() must
    // come back (almost always None via a checksum; never an exception)
    val pcm = FlacPcm(8000, 1, 16,
      Array(lcg(77L).map(v => (v % 900 - 450).toInt).take(120).toArray))
    val good = FlacCodec.encode(pcm, 64)
    (0 until good.length).foreach { pos =>
      val m = good.clone
      m(pos) = (m(pos) ^ (1 << (pos % 8))).toByte
      FlacCodec.decode(m).foreach { d =>
        // a surviving parse (flip in an ignored field) must still be shaped
        assert(d.channels == 1 && d.bits == 16)
      }
    }
    // random multi-byte shredding of the same stream
    (0 until 500).foreach { _ =>
      val m = good.clone
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      }
      FlacCodec.decode(m)
    }
  }

  test("corruption quarantines: CRC-8, CRC-16, MD5, truncation all return None") {
    val pcm = FlacPcm(44100, 1, 16,
      Array(lcg(21L).map(v => (v % 5000 - 2500).toInt).take(400).toArray))
    val good = FlacCodec.encode(pcm, 128)
    assert(FlacCodec.decode(good).isDefined)
    // STREAMINFO MD5 byte flipped → full decode then hash mismatch
    val badMd5 = good.clone
    badMd5(8 + 18) = (badMd5(8 + 18) ^ 0x01).toByte
    assert(FlacCodec.decode(badMd5).isEmpty)
    // flip one bit somewhere in the first frame's residual bytes:
    // either the frame CRC-16 or the MD5 must catch it
    val badBody = good.clone
    badBody(8 + 34 + 20) = (badBody(8 + 34 + 20) ^ 0x40).toByte
    assert(FlacCodec.decode(badBody).isEmpty)
    // header CRC-8: flip the channel-assignment nibble of frame 1
    val badHead = good.clone
    badHead(8 + 34 + 3) = (badHead(8 + 34 + 3) ^ 0x10).toByte
    assert(FlacCodec.decode(badHead).isEmpty)
    // truncation mid-frame
    assert(FlacCodec.decode(good.take(good.length - 7)).isEmpty)
    // not FLAC at all
    assert(FlacCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
  }
}
