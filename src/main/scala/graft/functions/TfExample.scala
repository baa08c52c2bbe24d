package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** tf.Example protobuf encoding — the payload half of the
  * [[graft.sources.TfRecord]] export seam, built from the public wire
  * format (proto3 varint/length-delimited encoding and the published
  * `Example`/`Features`/`Feature` schema):
  *
  *   Example  { Features features = 1 }
  *   Features { map<string, Feature> feature = 1 }
  *   Feature  { oneof { BytesList = 1; FloatList = 2; Int64List = 3 } }
  *   *List    { repeated value = 1 }   // numeric lists packed
  *
  * Design: each expression emits a COMPLETE single-feature `Example`
  * fragment, and callers compose features with plain `concat(...)` —
  * protobuf defines concatenation of serialized messages as message
  * merge, with repeated fields (the feature map entries) appending.
  * That keeps every expression a simple two-child codegen node instead
  * of one variadic map-typed monster, and the merge rule is wire-format
  * law, not a private trick. Feature order in the map is the concat
  * order; encoding is fully deterministic.
  *
  * A decoder is deliberately NOT implemented here — the spec carries an
  * independent minimal reader instead, so the round-trip proof does not
  * go through shared code.
  */
object TfExampleUtil {

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    // negative int64 takes the full 10-byte two's-complement varint
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  private def lenDelim(out: ByteArrayOutputStream, field: Int,
                       body: Array[Byte]): Unit = {
    varint(out, (field.toLong << 3) | 2)
    varint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  /** Wrap an encoded Feature message into Example{Features{entry}}. */
  private def wrap(name: UTF8String, feature: Array[Byte]): Array[Byte] = {
    val entry = new ByteArrayOutputStream(feature.length + 16)
    lenDelim(entry, 1, name.getBytes) // map key
    lenDelim(entry, 2, feature)       // map value
    val features = new ByteArrayOutputStream(feature.length + 24)
    lenDelim(features, 1, entry.toByteArray)
    val example = new ByteArrayOutputStream(feature.length + 32)
    lenDelim(example, 1, features.toByteArray)
    example.toByteArray
  }

  /** Example{name -> Int64List(values)} — packed varints. */
  def featI64(name: UTF8String, values: ArrayData): Array[Byte] = {
    val packed = new ByteArrayOutputStream(values.numElements() * 2)
    var i = 0
    while (i < values.numElements()) { varint(packed, values.getLong(i)); i += 1 }
    val list = new ByteArrayOutputStream(packed.size() + 8)
    lenDelim(list, 1, packed.toByteArray)
    val feature = new ByteArrayOutputStream(list.size() + 8)
    lenDelim(feature, 3, list.toByteArray) // oneof: int64_list = 3
    wrap(name, feature.toByteArray)
  }

  /** Example{name -> FloatList(values)} — packed 4-byte LE floats. */
  def featF32(name: UTF8String, values: ArrayData): Array[Byte] = {
    val n = values.numElements()
    val packed = new Array[Byte](4 * n)
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToIntBits(values.getFloat(i))
      packed(4 * i) = bits.toByte
      packed(4 * i + 1) = (bits >>> 8).toByte
      packed(4 * i + 2) = (bits >>> 16).toByte
      packed(4 * i + 3) = (bits >>> 24).toByte
      i += 1
    }
    val list = new ByteArrayOutputStream(packed.length + 8)
    lenDelim(list, 1, packed)
    val feature = new ByteArrayOutputStream(list.size() + 8)
    lenDelim(feature, 2, list.toByteArray) // oneof: float_list = 2
    wrap(name, feature.toByteArray)
  }

  /** Example{name -> BytesList(value)} — one element (text payloads). */
  def featBytes(name: UTF8String, value: Array[Byte]): Array[Byte] = {
    val list = new ByteArrayOutputStream(value.length + 8)
    lenDelim(list, 1, value)
    val feature = new ByteArrayOutputStream(list.size() + 8)
    lenDelim(feature, 1, list.toByteArray) // oneof: bytes_list = 1
    wrap(name, feature.toByteArray)
  }
}

private[functions] sealed abstract class TfFeatBase extends BinaryExpression {
  /** Accepted right-child type, for the error message. */
  def valueTypeName: String
  def valueOk(t: DataType): Boolean
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && valueOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, $valueTypeName), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = BinaryType
}

/** `tf_feat_i64(name, array<bigint>)` → single-feature Example bytes. */
case class TfFeatI64(left: Expression, right: Expression) extends TfFeatBase {
  override def valueTypeName: String = "array<bigint>"
  override def valueOk(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def prettyName: String = "tf_feat_i64"
  override def nullSafeEval(n: Any, v: Any): Any =
    TfExampleUtil.featI64(n.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, v) => s"graft.functions.TfExampleUtil.featI64($n, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TfFeatI64 =
    copy(left = l, right = r)
}

/** `tf_feat_f32(name, array<float>)` → single-feature Example bytes. */
case class TfFeatF32(left: Expression, right: Expression) extends TfFeatBase {
  override def valueTypeName: String = "array<float>"
  override def valueOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def prettyName: String = "tf_feat_f32"
  override def nullSafeEval(n: Any, v: Any): Any =
    TfExampleUtil.featF32(n.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, v) => s"graft.functions.TfExampleUtil.featF32($n, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TfFeatF32 =
    copy(left = l, right = r)
}

/** `tf_feat_bytes(name, binary)` → single-feature Example bytes. */
case class TfFeatBytes(left: Expression, right: Expression) extends TfFeatBase {
  override def valueTypeName: String = "binary"
  override def valueOk(t: DataType): Boolean = t == BinaryType
  override def prettyName: String = "tf_feat_bytes"
  override def nullSafeEval(n: Any, v: Any): Any =
    TfExampleUtil.featBytes(n.asInstanceOf[UTF8String], v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, v) => s"graft.functions.TfExampleUtil.featBytes($n, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TfFeatBytes =
    copy(left = l, right = r)
}
