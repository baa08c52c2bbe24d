package graft.ext

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats on a crafted doc") {
    val df = Seq((1L, "Hello, world! hello  again")).toDF("id", "text")
    val r = TextAnalysis.tokenStats(df, $"text", $"id").collect().head
    assert(r.getAs[Int]("n_chars") == 26)
    // tokens: Hello , world ! hello again = 6
    assert(r.getAs[Int]("n_tokens") == 6)
    // whitespace words: Hello, world! hello again = 4
    assert(r.getAs[Int]("n_words") == 4)
    assert(r.getAs[Int]("n_uniq_words") == 4)
  }

  test("language id picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el gato y la casa de la que"),
      (3L, "le chat et les maisons des amis"),
      (4L, "der hund und das haus ist ein")).toDF("id", "text")
    val out = TextAnalysis.langId(df, $"text", $"id")
      .orderBy("doc_id").collect().map(_.getAs[String]("lang_pred"))
    assert(out.toSeq == Seq("en", "es", "fr", "de"))
  }

  test("quality score flags degenerate docs") {
    val df = Seq(
      (1L, "a good long document with many different interesting words here"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // low uniq
      (3L, "hi")). // too short
      toDF("id", "text")
    val out = TextAnalysis.qualityScore(df, $"text", $"id")
      .orderBy("doc_id").collect().map(_.getAs[Boolean]("quality_ok"))
    assert(out.toSeq == Seq(true, false, false))
  }

  test("fingerprint: spacing-insensitive content fp, local-edit-stable winnow fp") {
    val df = Seq(
      (1L, "alpha beta  gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta")).toDF("id", "text")
    val out = TextAnalysis.fingerprint(df, $"text", $"id")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == out(1).getString(1)) // content fp equal
    assert(out(0).getString(1) != out(2).getString(1))
  }
}
