package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow
import graft.functions.MediaHeaderUtil

/** Byte-level fixtures for the MP4/ISO-BMFF container parse — the
  * video analog of AudioDecodeSpec: every box is hand-assembled
  * (big-endian sizes, 4cc types, version/flags payloads) and the
  * extracted fields are asserted against hand-computed values. Frame
  * pixels are explicitly out of scope (no JVM video codec); the parse
  * is the routing pass a real pipeline runs before a decoder fleet. */
class VideoContainerSpec extends SparkSpec {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ tpe.getBytes("US-ASCII") ++ body

  private def ftyp(brand: String) =
    box("ftyp", brand.getBytes("US-ASCII") ++ be32(0) ++
      "mp42".getBytes("US-ASCII"))

  // mvhd v0: version/flags(4) creation(4) modification(4)
  //          timescale(4) duration(4) + trailing fields we zero-fill
  private def mvhd(timescale: Long, duration: Long) =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ Array.fill(80)(0.toByte))

  // tkhd v0 is 84 bytes of body; width/height are the LAST 8 (16.16)
  private def tkhd(w: Int, h: Int) =
    box("tkhd", Array.fill(76)(0.toByte) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def stts(runs: (Long, Long)*) =
    box("stts", be32(0) ++ be32(runs.length.toLong) ++
      runs.flatMap { case (n, d) => be32(n) ++ be32(d) }.toArray)

  private def trak(w: Int, h: Int, sttsRuns: (Long, Long)*) =
    box("trak", tkhd(w, h) ++
      box("mdia", box("minf", box("stbl", stts(sttsRuns: _*)))))

  // movie: 90000-tick timescale, 225000 ticks = 2500 ms; audio track
  // first (0×0 dims, 110 samples), then 640×360 video with stts runs
  // 24×1000 + 1×500 = 25 frames
  private val movie = ftyp("isom") ++ box("moov",
    mvhd(90000, 225000) ++
      trak(0, 0, (110L, 1024L)) ++
      trak(640, 360, (24L, 1000L), (1L, 500L)))

  test("box walk: brand, timescale, duration, tracks, video dims, frame count") {
    val v = MediaHeaderUtil.parseMp4(movie).get
    assert(v.brand == "isom")
    assert(v.timescale == 90000L && v.durationMs == 2500L)
    assert(v.nTracks == 2)
    // the audio track's degenerate 0×0 tkhd must NOT win
    assert(v.width == 640 && v.height == 360)
    assert(v.nSamples == 25L)
  }

  test("64-bit largesize boxes and mvhd v1 parse") {
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill(16)(0.toByte) ++ // creation+modification as u64s
      be32(1000) ++ be32(0) ++ be32(7500) ++ // timescale, duration u64
      Array.fill(80)(0.toByte))
    val inner = mvhdV1 ++ trak(320, 240, (10L, 1L))
    // moov with size=1 + 64-bit largesize header
    val moov64 = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be32(0) ++ be32(inner.length + 16L) ++ inner
    val v = MediaHeaderUtil.parseMp4(ftyp("iso6") ++ moov64).get
    assert(v.timescale == 1000L && v.durationMs == 7500L)
    assert(v.width == 320 && v.nSamples == 10L)
  }

  test("rejects non-BMFF, truncated boxes, and missing mvhd") {
    assert(MediaHeaderUtil.parseMp4("plainly not a video".getBytes).isEmpty)
    assert(MediaHeaderUtil.parseMp4(movie.dropRight(6)).isEmpty) // truncated
    assert(MediaHeaderUtil.parseMp4(
      ftyp("isom") ++ box("moov", trak(640, 360, (1L, 1L)))).isEmpty)
    // a declared box size overrunning the payload is structural error
    val overrun = ftyp("isom") ++ be32(9999) ++ "moov".getBytes("US-ASCII")
    assert(MediaHeaderUtil.parseMp4(overrun).isEmpty)
  }

  test("property: arbitrary bytes never throw, accepted parses are consistent") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      MediaHeaderUtil.parseMp4(b).foreach { v =>
        assert(v.timescale > 0 && v.durationMs >= 0 && v.nTracks >= 0)
      }
    }
  }

  test("videoBatched quarantines non-video; featuresBatched takes the MP4 branch") {
    val ds = Seq(
      MediaRow(1L, movie, "video/mp4"),
      MediaRow(2L, "not a movie".getBytes, "text/plain")).toDS()
    val rows = Multimodal.videoBatched(ds, batchSize = 2).collect()
    assert(rows.map(_.media_id).toSeq == Seq(1L))
    assert(rows(0).duration_ms == 2500L && rows(0).n_tracks == 2 &&
      rows(0).width == 640 && rows(0).n_samples == 25L)
    val f = Multimodal.featuresBatched(ds).collect().sortBy(_.media_id)
    assert(f(0).width == 640 && f(0).height == 360 && f(0).n_frames == 25)
  }
}
