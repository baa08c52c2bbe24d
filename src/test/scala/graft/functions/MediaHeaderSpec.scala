package graft.functions

import graft.SparkSpec
import graft.ext.Multimodal

/** [[MediaHeaderUtil]] / `media_dims` against hand-built REAL header
  * bytes for the three public container formats — byte-for-byte per
  * spec: PNG signature + IHDR (big-endian u32 dims), GIF logical screen
  * descriptor (little-endian u16 dims), JPEG marker walk to SOF0 past
  * an APP0 segment — plus the malformed/unknown fallbacks and the
  * integration through [[Multimodal.featuresColsDetected]] and the
  * batched decode seam.
  */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** PNG signature, IHDR length(13), "IHDR", 640×480, bit depth 8,
    * colour type 2, compression/filter/interlace 0. */
  private val png640x480 = bytes(
    0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
    0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
    0x00, 0x00, 0x02, 0x80, // width 640 (BE)
    0x00, 0x00, 0x01, 0xe0, // height 480 (BE)
    0x08, 0x02, 0x00, 0x00, 0x00)

  /** GIF89a + logical screen 320×200 (LE u16). */
  private val gif320x200 = bytes(
    'G', 'I', 'F', '8', '9', 'a',
    0x40, 0x01, // width 320 (LE)
    0xc8, 0x00, // height 200 (LE)
    0x91, 0x00, 0x00)

  /** SOI, APP0 (JFIF, 16 bytes), SOF0 with 8-bit precision, 480×640. */
  private val jpeg640x480 = bytes(
    0xff, 0xd8,
    0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
    0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
    0xff, 0xc0, 0x00, 0x0b, 0x08,
    0x01, 0xe0, // height 480 (BE)
    0x02, 0x80, // width 640 (BE)
    0x01, 0x01, 0x11, 0x00)

  test("parses PNG IHDR, GIF logical screen, and JPEG SOF0 dimensions") {
    assert(MediaHeaderUtil.parseDims(png640x480).contains(("png", 640, 480)))
    assert(MediaHeaderUtil.parseDims(gif320x200).contains(("gif", 320, 200)))
    assert(MediaHeaderUtil.parseDims(jpeg640x480).contains(("jpeg", 640, 480)))
  }

  test("rejects unknown, truncated, and SOF-less bytes") {
    assert(MediaHeaderUtil.parseDims("just some text".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaderUtil.parseDims(png640x480.take(20)).isEmpty)
    // JPEG that ends (EOI) before any start-of-frame marker
    assert(MediaHeaderUtil.parseDims(bytes(0xff, 0xd8, 0xff, 0xd9)).isEmpty)
    // GIF with zero width
    assert(MediaHeaderUtil.parseDims(bytes(
      'G', 'I', 'F', '8', '9', 'a', 0x00, 0x00, 0x01, 0x00)).isEmpty)
    assert(MediaHeaderUtil.parseDims(Array.emptyByteArray).isEmpty)
  }

  test("media_dims expression evaluates in a projection") {
    GraftFunctions.register(spark)
    val out = Seq(1L -> png640x480, 2L -> "nope".getBytes("UTF-8"))
      .toDF("id", "payload")
      .selectExpr("id", "media_dims(payload) as dims")
      .orderBy("id").collect()
    val d = out(0).getStruct(1)
    assert(d.getString(0) == "png" && d.getInt(1) == 640 && d.getInt(2) == 480)
    assert(out(1).isNullAt(1))
  }

  test("featuresColsDetected: real dims for recognized media, stub elsewhere") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, gif320x200), (2L, "plain words here".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.featuresColsDetected(df, col("payload"), col("doc_id"))
      .orderBy("media_id").collect()
    assert(out(0).getAs[String]("format") == "gif")
    assert(out(0).getAs[Int]("width") == 320 &&
      out(0).getAs[Int]("height") == 200 &&
      out(0).getAs[Int]("n_frames") == 1)
    // the fallback row keeps the deterministic stub shape
    assert(out(1).isNullAt(out(1).fieldIndex("format")))
    assert(out(1).getAs[Int]("width") < 1280 &&
      out(1).getAs[Int]("height") < 720)
  }

  test("batched decode seam uses the real header parse") {
    val ds = Seq(Multimodal.MediaRow(9L, jpeg640x480, "image/jpeg")).toDS()
    val out = Multimodal.featuresBatched(ds).collect().head
    assert(out.width == 640 && out.height == 480 && out.n_frames == 1)
  }

  test("property: arbitrary bytes never throw, and any parse is positive") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // include signature-prefixed garbage so the marker walks and length
    // fields get exercised, not just the early signature rejects
    val garbage = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    val prefixed = for {
      sig <- Gen.oneOf(
        bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
        bytes('G', 'I', 'F', '8', '9', 'a'),
        bytes(0xff, 0xd8))
      tail <- garbage
    } yield sig ++ tail
    val anyBytes = Gen.oneOf(garbage, prefixed)
    val p = Prop.forAll(anyBytes) { b =>
      MediaHeaderUtil.parseDims(b) match {
        case Some((f, w, h)) =>
          (f == "png" || f == "gif" || f == "jpeg") && w > 0 && h > 0
        case None => true
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }
}
