package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CIS-2 contract-log event codec — the byte-format decode the reference
  * performs on every contract-update log (`cis2::Event::try_from` over
  * `contract_update_logs()`, wallet-proxy-indexer/src/main.rs:617-645).
  *
  * The wire format is the public CIS-2 token-standard event encoding:
  *
  *  - byte 0 = tag: 255 transfer, 254 mint, 253 burn, 252
  *    updateOperator, 251 tokenMetadata; anything below 251 is a custom
  *    ("unknown") event;
  *  - TokenId      = 1 length byte n, then n raw bytes;
  *  - TokenAmount  = unsigned LEB128, value < 2^256 (max 37 bytes) —
  *    decoded to a DECIMAL STRING because 2^256-1 exceeds Decimal(38)
  *    (the same reason `cis2_tokens.total_supply` is NUMERIC(80,0) in
  *    the reference and a string column here, see Schemas.cis2Tokens);
  *  - Address      = tag byte 0 + 32-byte account, or tag byte 1 +
  *    little-endian u64 index + u64 subindex (contract);
  *  - MetadataUrl  = little-endian u16 length + UTF-8 url, then an
  *    option byte (0 none / 1 + 32-byte hash).
  *
  * `cis2_decode(log_bytes)` evaluates to a struct (null on MALFORMED
  * bytes — truncated fields, trailing garbage after a known-tag event,
  * LEB128 overflow, a metadata url that is not valid UTF-8). A custom
  * tag decodes to `tag = "unknown"` with all payload fields null — a
  * SUCCESSFUL parse, matching `Ok(cis2::Event::Unknown)` which the
  * reference consumes as a no-op (main.rs:497); only a null (malformed)
  * decode triggers the reference's silent list drop (main.rs:622-626,
  * `.ok()`).
  *
  * Strictness policy (the vendored SDK source is not available for a
  * byte-level diff, so the edges are pinned here explicitly rather than
  * claimed as an exact mirror):
  *  - known tag + trailing bytes → malformed. The SDK parses events
  *    through `ContractEvent::parse`, which requires all event bytes to
  *    be consumed; an event with garbage after a well-formed payload is
  *    rejected, not truncated.
  *  - metadata url → must be valid UTF-8 (the SDK decodes it into a
  *    Rust `String`, which fails on invalid UTF-8).
  *  - custom tag (< 251) → valid regardless of payload: the payload is
  *    opaque to CIS-2, so no consumption or format rule applies.
  *
  * Address fields are flattened: mint credits `to`, burn debits `from`,
  * transfer fills both, updateOperator maps owner→from / operator→to.
  * Account addresses surface as uppercase hex (oracle-portable:
  * `upper(printf('%064x', …))` builds the same string in DuckDB for the
  * synthetic id-derived fixtures), contracts as (index, subindex).
  *
  * Both expressions are native codegen (`doGenCode` → one static call,
  * same pattern as [[MinHash64]]): the decode sits in the per-log hot
  * path of ingest at 100 TB, so it must stay inside whole-stage codegen
  * with zero interpreter overhead.
  */
case class Cis2Decode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cis2_decode requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = Cis2Util.decodedSchema
  override def nullable: Boolean = true
  override def prettyName: String = "cis2_decode"

  override def nullSafeEval(input: Any): Any =
    Cis2Util.decode(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Cis2Util.decode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Cis2Decode =
    copy(child = newChild)
}

/** `cis2_encode(kind, token_id, amount, owner)` — the emit side of the
  * codec for the single-owner events: kind 'mint' (tag 254) or 'burn'
  * (tag 253), token_id raw bytes, amount as a decimal string (LEB128-
  * encoded), owner a 32-byte account address. Used by the round-trip
  * correctness query and by tests; transfer/updateOperator/tokenMetadata
  * fixtures are hand-encoded in the spec. */
case class Cis2Encode(kind: Expression, tokenId: Expression,
                      amount: Expression, owner: Expression)
    extends QuaternaryExpression {

  override def first: Expression = kind
  override def second: Expression = tokenId
  override def third: Expression = amount
  override def fourth: Expression = owner

  override def checkInputDataTypes(): TypeCheckResult =
    (kind.dataType, tokenId.dataType, amount.dataType, owner.dataType) match {
      case (StringType, BinaryType, StringType, BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cis2_encode requires (string, binary, string, binary), got $other")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cis2_encode"

  override def nullSafeEval(k: Any, t: Any, a: Any, o: Any): Any =
    Cis2Util.encodeMintBurn(k.asInstanceOf[UTF8String].toString,
      t.asInstanceOf[Array[Byte]], a.asInstanceOf[UTF8String].toString,
      o.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, t, a, o) =>
      s"graft.functions.Cis2Util.encodeMintBurn($k.toString(), $t, $a.toString(), $o)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Cis2Encode =
    copy(kind = f, tokenId = s, amount = t, owner = q)
}

/** Static helpers referenced from generated code. */
object Cis2Util {

  val decodedSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("token_id", StringType, nullable = true), // uppercase hex
    StructField("amount", StringType, nullable = true), // decimal string
    StructField("from_account", StringType, nullable = true), // uppercase hex
    StructField("from_index", LongType, nullable = true),
    StructField("from_subindex", LongType, nullable = true),
    StructField("to_account", StringType, nullable = true),
    StructField("to_index", LongType, nullable = true),
    StructField("to_subindex", LongType, nullable = true),
    StructField("operator_update", StringType, nullable = true), // add|remove
    StructField("metadata_url", StringType, nullable = true),
    StructField("metadata_hash", StringType, nullable = true) // uppercase hex
  ))

  private val HEX = "0123456789ABCDEF".toCharArray
  private def hex(b: Array[Byte], from: Int, len: Int): UTF8String = {
    val out = new Array[Byte](len * 2)
    var i = 0
    while (i < len) {
      val v = b(from + i) & 0xff
      out(2 * i) = HEX(v >>> 4).toByte
      out(2 * i + 1) = HEX(v & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // Cursor-style parser over the byte array; pos = -1 signals malformed.
  private final class Cursor(val b: Array[Byte]) {
    var pos: Int = 0
    def fail(): Unit = pos = Int.MinValue
    def ok: Boolean = pos >= 0
    def u8(): Int =
      if (ok && pos < b.length) { val v = b(pos) & 0xff; pos += 1; v }
      else { fail(); 0 }
    def take(n: Int): Int = // returns start offset of the n bytes
      if (ok && n >= 0 && pos + n <= b.length) { val s = pos; pos += n; s }
      else { fail(); 0 }
    def u16le(): Int = { val a = u8(); val c = u8(); a | (c << 8) }
    def u64le(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
  }

  /** Unsigned LEB128 → decimal string; null-signal via cursor.fail() on
    * overlong (> 37 bytes = 2^259 > max) or truncated input. */
  private def leb128(c: Cursor): UTF8String = {
    var shift = 0
    var small = 0L // accumulate in a long while it fits (shift < 56)
    var big: BigInteger = null
    var done = false
    var n = 0
    while (!done && c.ok) {
      val byte = c.u8()
      if (n >= 37) { c.fail(); return null }
      n += 1
      val payload = byte & 0x7f
      if (big == null && shift <= 56) small |= payload.toLong << shift
      else {
        if (big == null) big = BigInteger.valueOf(small)
        big = big.or(BigInteger.valueOf(payload.toLong).shiftLeft(shift))
      }
      shift += 7
      done = (byte & 0x80) == 0
    }
    if (!c.ok) null
    else if (big == null) UTF8String.fromString(java.lang.Long.toUnsignedString(small))
    else if (big.bitLength() > 256) { c.fail(); null } // TokenAmount < 2^256
    else UTF8String.fromString(big.toString)
  }

  /** Fills (account, index, subindex) at base offset `at` of `row`. */
  private def address(c: Cursor, row: GenericInternalRow, at: Int): Unit =
    c.u8() match {
      case 0 =>
        val s = c.take(32)
        if (c.ok) row.update(at, hex(c.b, s, 32))
      case 1 =>
        val idx = c.u64le(); val sub = c.u64le()
        if (c.ok) { row.update(at + 1, idx); row.update(at + 2, sub) }
      case _ => c.fail()
    }

  /** Strict UTF-8 well-formedness check (no decoding, no allocation):
    * rejects overlong encodings, surrogates, and values above U+10FFFF —
    * the same inputs `String::from_utf8` rejects on the SDK side. */
  private def validUtf8(b: Array[Byte], from: Int, len: Int): Boolean = {
    var i = from
    val end = from + len
    while (i < end) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) i += 1
      else {
        val n = // continuation count, with the first-byte range check
          if (b0 >= 0xc2 && b0 <= 0xdf) 1
          else if (b0 >= 0xe0 && b0 <= 0xef) 2
          else if (b0 >= 0xf0 && b0 <= 0xf4) 3
          else return false
        if (i + n >= end) return false
        // tighter second-byte bounds for the overlong/surrogate edges
        val b1 = b(i + 1) & 0xff
        val b1ok = b0 match {
          case 0xe0 => b1 >= 0xa0 && b1 <= 0xbf
          case 0xed => b1 >= 0x80 && b1 <= 0x9f
          case 0xf0 => b1 >= 0x90 && b1 <= 0xbf
          case 0xf4 => b1 >= 0x80 && b1 <= 0x8f
          case _ => b1 >= 0x80 && b1 <= 0xbf
        }
        if (!b1ok) return false
        var j = 2
        while (j <= n) {
          if ((b(i + j) & 0xc0) != 0x80) return false
          j += 1
        }
        i += n + 1
      }
    }
    true
  }

  private def tokenId(c: Cursor, row: GenericInternalRow): Unit = {
    val n = c.u8()
    val s = c.take(n)
    if (c.ok) row.update(1, hex(c.b, s, n))
  }

  private def amount(c: Cursor, row: GenericInternalRow): Unit = {
    val v = leb128(c)
    if (c.ok) row.update(2, v)
  }

  /** Decode one CIS-2 log. Returns null for malformed bytes; a row with
    * tag="unknown" for custom events (tag < 251, any payload). */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes.length == 0) return null
    val row = new GenericInternalRow(12)
    val c = new Cursor(bytes)
    val tag = c.u8()
    tag match {
      case 255 => // transfer: token, amount, from, to
        row.update(0, UTF8String.fromString("transfer"))
        tokenId(c, row); amount(c, row); address(c, row, 3); address(c, row, 6)
      case 254 => // mint: token, amount, owner → to
        row.update(0, UTF8String.fromString("mint"))
        tokenId(c, row); amount(c, row); address(c, row, 6)
      case 253 => // burn: token, amount, owner → from
        row.update(0, UTF8String.fromString("burn"))
        tokenId(c, row); amount(c, row); address(c, row, 3)
      case 252 => // updateOperator: update, owner → from, operator → to
        row.update(0, UTF8String.fromString("updateOperator"))
        c.u8() match {
          case 0 => row.update(9, UTF8String.fromString("remove"))
          case 1 => row.update(9, UTF8String.fromString("add"))
          case _ => c.fail()
        }
        address(c, row, 3); address(c, row, 6)
      case 251 => // tokenMetadata: token, url, optional hash
        row.update(0, UTF8String.fromString("tokenMetadata"))
        tokenId(c, row)
        val urlLen = c.u16le()
        val s = c.take(urlLen)
        if (c.ok && !validUtf8(c.b, s, urlLen)) c.fail()
        if (c.ok) row.update(10, UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(c.b, s, s + urlLen)))
        c.u8() match {
          case 0 => ()
          case 1 =>
            val h = c.take(32)
            if (c.ok) row.update(11, hex(c.b, h, 32))
          case _ => c.fail()
        }
      case _ => // custom event: valid, but opaque to CIS-2
        return new GenericInternalRow(
          Array[Any](UTF8String.fromString("unknown"),
            null, null, null, null, null, null, null, null, null, null, null))
    }
    // exact consumption: trailing bytes are malformed per the standard
    if (!c.ok || c.pos != bytes.length) null else row
  }

  /** Encode a mint (tag 254) or burn (tag 253): tag, TokenId, LEB128
    * amount, account address (0x00 + 32 bytes). Throws on a kind other
    * than mint/burn, token ids over 255 bytes, negative amounts, or a
    * non-32-byte owner — encode inputs are caller-controlled, so these
    * are programming errors, not data errors. */
  def encodeMintBurn(kind: String, tokenId: Array[Byte], amount: String,
                     owner: Array[Byte]): Array[Byte] = {
    val tag = kind match {
      case "mint" => 254
      case "burn" => 253
      case other => throw new IllegalArgumentException(
        s"cis2_encode kind must be mint|burn, got $other")
    }
    require(tokenId.length <= 255, "token id over 255 bytes")
    require(owner.length == 32, s"owner must be 32 bytes, got ${owner.length}")
    var amt = new BigInteger(amount)
    require(amt.signum() >= 0 && amt.bitLength() <= 256, s"bad amount $amount")
    val leb = new java.io.ByteArrayOutputStream(8)
    var done = false
    while (!done) {
      val low = amt.and(BigInteger.valueOf(0x7f)).intValue()
      amt = amt.shiftRight(7)
      done = amt.signum() == 0
      leb.write(if (done) low else low | 0x80)
    }
    val out = java.nio.ByteBuffer.allocate(
      1 + 1 + tokenId.length + leb.size() + 1 + 32)
    out.put(tag.toByte)
    out.put(tokenId.length.toByte)
    out.put(tokenId)
    out.put(leb.toByteArray)
    out.put(0.toByte) // account address tag
    out.put(owner)
    out.array()
  }
}
