package graft.functions

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** tf.Example encoding proven against an INDEPENDENT minimal protobuf
  * reader written in this spec (varint + length-delimited walk over
  * the published schema), plus one fully hand-computed byte vector —
  * the round trip never passes through shared encode code. */
class TfExampleSpec extends SparkSpec {

  // ---- independent mini-reader (this file only) ----
  private final class Reader(b: Array[Byte], var i: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L; var s = 0
      while ({ val x = b(i) & 0xff; i += 1; v |= (x & 0x7fL) << s; s += 7
               (x & 0x80) != 0 }) ()
      v
    }
    def field(): (Int, Reader) = { // only wire type 2 appears here
      val tag = varint()
      assert((tag & 7) == 2, s"unexpected wire type ${tag & 7}")
      val len = varint().toInt
      val r = new Reader(b, i, i + len)
      i += len
      (tag >>> 3).toInt -> r
    }
    def hasMore: Boolean = i < end
    def bytes: Array[Byte] = java.util.Arrays.copyOfRange(b, i, end)
  }

  /** Decode Example bytes → (name → (kind, payload)) where kind is the
    * Feature oneof field number and payload the raw *List body. */
  private def decodeExample(bytes: Array[Byte]): Map[String, (Int, Array[Byte])] = {
    val ex = new Reader(bytes, 0, bytes.length)
    var out = Map.empty[String, (Int, Array[Byte])]
    while (ex.hasMore) {
      val (f1, features) = ex.field()
      assert(f1 == 1, s"Example field $f1")
      while (features.hasMore) {
        val (fe, entry) = features.field()
        assert(fe == 1, s"Features field $fe")
        var name: String = null
        var kind = -1
        var payload: Array[Byte] = null
        while (entry.hasMore) entry.field() match {
          case (1, r) => name = new String(r.bytes, "UTF-8"); r.i = r.end
          case (2, feat) =>
            val (k, list) = feat.field()
            kind = k
            val (lf, body) = list.field()
            assert(lf == 1, s"List field $lf")
            payload = body.bytes
          case (other, _) => fail(s"entry field $other")
        }
        out += name -> (kind, payload)
      }
    }
    out
  }

  private def readPackedVarints(p: Array[Byte]): Seq[Long] = {
    val r = new Reader(p, 0, p.length)
    val out = Seq.newBuilder[Long]
    while (r.hasMore) out += r.varint()
    out.result()
  }

  test("hand-computed vector: Example{'a' -> Int64List[1]}") {
    val got = TfExampleUtil.featI64(
      org.apache.spark.unsafe.types.UTF8String.fromString("a"),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L)))
    // Int64List: 0A 01 01 / Feature(int64_list=3): 1A 03 …
    // entry: key 0A 01 'a', value 12 05 … / Features: 0A 0A … / Example: 0A 0C …
    val expected = Array(0x0A, 0x0C, 0x0A, 0x0A, 0x0A, 0x01, 0x61, 0x12,
      0x05, 0x1A, 0x03, 0x0A, 0x01, 0x01).map(_.toByte)
    assert(got.toSeq == expected.toSeq)
  }

  test("i64/f32/bytes features decode independently; concat merges") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val row = Seq((Seq(5L, -1L, 300L), Seq(1.5f, -0.25f), "payload text"))
      .toDF("toks", "emb", "txt")
      .select(concat(
        expr("tf_feat_i64('input_ids', toks)"),
        expr("tf_feat_f32('emb', emb)"),
        expr("tf_feat_bytes('text', CAST(txt AS BINARY))")).as("ex"))
      .collect()(0).getAs[Array[Byte]](0)
    val m = decodeExample(row)
    assert(m.keySet == Set("input_ids", "emb", "text"))
    val (k1, p1) = m("input_ids")
    assert(k1 == 3) // int64_list
    assert(readPackedVarints(p1) == Seq(5L, -1L, 300L))
    // -1 as int64 varint is the full 10-byte two's complement
    assert(p1.length == 1 + 10 + 2)
    val (k2, p2) = m("emb")
    assert(k2 == 2 && p2.length == 8)
    val f = java.nio.ByteBuffer.wrap(p2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    assert(f.get(0) == 1.5f && f.get(1) == -0.25f)
    val (k3, p3) = m("text")
    assert(k3 == 1 && new String(p3, "UTF-8") == "payload text")
  }

  test("end to end: documents -> tf.Example -> TFRecord shards -> decode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tfex").toString + "/out"
    val docs = (0 until 20)
      .map(i => (i.toLong, s"doc $i body", Seq.tabulate(4)(j => (i * 10 + j).toLong)))
      .toDF("doc_id", "text", "input_ids")
    val payloads = docs.select(concat(
      expr("tf_feat_i64('doc_id', array(doc_id))"),
      expr("tf_feat_i64('input_ids', input_ids)"),
      expr("tf_feat_bytes('text', CAST(text AS BINARY))")).as("ex"))
    assert(graft.sources.TfRecord.write(payloads, "ex", dir) == 20L)
    val back = graft.sources.TfRecord.read(spark, dir)
    assert(back.corrupt.count() == 0)
    val decoded = back.records.select("payload").collect()
      .map(r => decodeExample(r.getAs[Array[Byte]](0)))
      .map { m =>
        val id = readPackedVarints(m("doc_id")._2).head
        val ids = readPackedVarints(m("input_ids")._2)
        val txt = new String(m("text")._2, "UTF-8")
        (id, txt, ids)
      }.sortBy(_._1)
    assert(decoded.length == 20)
    assert(decoded(7) == ((7L, "doc 7 body", Seq(70L, 71L, 72L, 73L))))
    // the export projection is narrow: codegen'd expressions, no shuffle
    val plan = payloads.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
