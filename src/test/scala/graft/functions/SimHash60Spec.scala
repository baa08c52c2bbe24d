package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Text

class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("hash60 matches conv(substring(md5,1,15),16,10)") {
    // Text.hash60 is the native Hash60Md5 expression since r22 — pin it
    // against the PORTABLE chain it replaced (the DuckDB oracle's exact
    // formulation), not against SimHashUtil (that would be circular).
    val rnd = new scala.util.Random(42)
    val inputs = Seq("", "a", "hello world", "σπάρκ", "x" * 1000) ++
      (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(80)).mkString) ++
      (1 to 100).map(_ => new String(Array.fill(rnd.nextInt(40))(
        rnd.nextInt(0x2FFF).toChar)))
    val df = inputs.toDF("s")
    val viaNative = df.select(Text.hash60(col("s")).as("h")).as[Long].collect()
    val viaChain = df.select(
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .as[Long].collect()
    assert(viaNative.toSeq == viaChain.toSeq)
    // null propagates like the old chain (md5(null) -> null)
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(Text.hash60(col("s"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("simhash60 expression equals the exploded bit-vote formulation") {
    GraftFunctions.register(spark)
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely different content here, with punctuation!",
      4L -> "a",
      5L -> "repeated repeated repeated repeated tokens tokens"
    ).toDF("doc_id", "text")

    val fast = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr("simhash60(toks)").as("simhash"))

    val slow = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), Text.hash60(col("tok")).as("h"),
        explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(expr("(shiftright(h, cast(j as int)) & 1) * 2 - 1")).as("vote"))
      .groupBy("doc_id")
      .agg(sum(expr(
        "case when vote > 0 then shiftleft(cast(1 as bigint), cast(j as int)) else cast(0 as bigint) end"))
        .as("simhash"))

    val f = fast.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val s = slow.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(f == s)
  }

  test("word_shingles/min_md5 equal the portable HOF formulations") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three",
      "short one", // fewer than k words → empty shingles, null min
      "", // empty text
      "a  b   c d" // multi-space split
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = split(trim(col("text")), " +")
    val hofShingles = when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(
      Text.shingles(col("text"), 3).as("native_sh"),
      hofShingles.as("hof_sh"),
      call_function("min_md5", hofShingles).as("native_min"),
      array_min(transform(hofShingles, s => md5(s))).as("hof_min")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      assert(r.getAs[String]("native_min") == r.getAs[String]("hof_min"))
    }
  }

  // BMP fixtures only: for astral-plane chars the scanner follows the
  // DuckDB/RE2 code-point semantics, while java.util.regex (this
  // reference formulation) splits them into surrogate halves — see the
  // WordTokens scaladoc.
  test("word_tokens equals the regexp_extract_all formulation") {
    GraftFunctions.register(spark)
    val texts = Seq(
      "the quick, brown fox!",
      "tabs\tand\nnewlines are single-char tokens",
      "σπάρκ mixed ascii κείμενο", // multi-byte code points
      "", "   ", "a_b_c 123 __",
      "!!??..", "ends with punct?")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(
        Text.tokens(col("text")).as("native"),
        regexp_extract_all(col("text"), lit(Text.TokenRe), lit(0)).as("re"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("null array yields null; empty array yields 0") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Some(Seq("tok"))), (2L, None))
      .toDF("id", "toks")
      .withColumn("toks",
        when(col("id") === 2L, lit(null).cast("array<string>"))
          .otherwise(col("toks")))
    val out = df.select(expr("simhash60(toks)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).isDefined && out(1).isEmpty)
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(expr("simhash60(toks)")).as[Long].head()
    assert(empty == 0L)
  }
}
