package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Curation

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(form: String, texts: String*): Seq[String] = {
    GraftFunctions.register(spark)
    texts.toDF("t")
      .select(Curation.normalizeText(col("t"), form).as("n"))
      .as[String].collect().toSeq
  }

  test("NFC composes decomposed accents; equal meaning becomes equal bytes") {
    val composed = "café"            // é as one code point
    val decomposed = "café"         // e + combining acute
    assert(composed != decomposed)        // the problem being solved
    assert(norm("NFC", composed, decomposed).distinct.size == 1)
    assert(norm("NFC", decomposed) == Seq(composed))
  }

  test("NFKC folds compatibility forms the tokenizer vocabulary expects") {
    assert(norm("NFKC", "ﬁle") == Seq("file"))      // ﬁ ligature
    assert(norm("NFKC", "ＡＢＣ") == Seq("ABC")) // full-width
    assert(norm("NFKC", "x²") == Seq("x2"))         // superscript two
    // NFC, by contrast, preserves compatibility characters
    assert(norm("NFC", "ﬁle") == Seq("ﬁle"))
  }

  test("NFD is the inverse direction; all four forms are idempotent") {
    assert(norm("NFD", "café") == Seq("café"))
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val once = norm(f, "café ﬁle Ａ")
      assert(norm(f, once.head) == once, f)
    }
  }

  test("already-normalized ASCII passes through; nulls stay null") {
    assert(norm("NFC", "plain ascii text") == Seq("plain ascii text"))
    GraftFunctions.register(spark)
    val out = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(Curation.normalizeText(col("t")).as("n"))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("invalid form is rejected at construction") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("unicode_norm", col("t"), lit("NFX")))
        .collect()
    }
  }

  test("stays a zero-shuffle codegen projection") {
    GraftFunctions.register(spark)
    val plan = Seq("a").toDF("t")
      .select(Curation.normalizeText(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
