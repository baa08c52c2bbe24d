package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the html_text extraction contract on hand-written pages —
  * every rule the scaladoc states, plus the malformed-input cases a
  * real crawl serves constantly. */
class HtmlTextSpec extends SparkSpec {

  private def x(html: String): String = HtmlTextUtil.extract(html)

  test("tags are stripped; inline tags join words, block tags separate") {
    assert(x("<p>Hello <b>world</b></p><p>Second para</p>") ==
      "Hello world\nSecond para")
    assert(x("a<span>b</span>c") == "abc")
    assert(x("line one<br>line two") == "line one\nline two")
  }

  test("script and style lose their content, not just their tags") {
    assert(x("before<script>var x = '<p>not text</p>';</script>after") ==
      "beforeafter")
    assert(x("a<style type=\"text/css\">p { color: red }</style>b") == "ab")
    // case-insensitive close tag
    assert(x("a<script>x</SCRIPT>b") == "ab")
    // unclosed raw-text element consumes to EOF, best effort
    assert(x("a<script>junk forever") == "a")
  }

  test("comments, doctype, and processing instructions vanish") {
    assert(x("<!DOCTYPE html>a<!-- hidden <p>text</p> -->b<?xml v?>c") == "abc")
    // unterminated comment consumes to EOF
    assert(x("a<!-- never closed") == "a")
  }

  test("quoted attribute values may contain '>' without desyncing") {
    assert(x("""<a href="x>y" title='p>q'>link</a> tail""") == "link tail")
  }

  test("entities: the five named + nbsp + numeric; unknown verbatim") {
    assert(x("Tom &amp; Jerry &lt;3 &gt; &quot;hi&quot; &apos;s&nbsp;end") ==
      "Tom & Jerry <3 > \"hi\" 's end")
    assert(x("&#65;&#x42;&#x63;") == "ABc")
    assert(x("AT&T and &bogus; stay") == "AT&T and &bogus; stay")
    // a '&' with no nearby ';' is literal
    assert(x("a & b") == "a & b")
  }

  test("whitespace: runs collapse, lines trim, blanks drop") {
    assert(x("<p>  spaced   out  </p>\n\n<p>\t tab\t</p>") ==
      "spaced out\ntab")
    assert(x("<div></div><div></div><div>only</div>") == "only")
  }

  test("bare '<' that opens nothing tag-like is literal text") {
    assert(x("5 < 6, a <3 b") == "5 < 6, a <3 b")
    // '<' before a letter IS a tag open (same call a browser makes):
    // an unclosed one consumes to EOF under the malformed-input rule
    assert(x("x<y unclosed") == "x")
  }

  test("property: arbitrary strings never throw, output has no raw markup") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // bias toward markup-significant characters so tag/entity/comment
    // paths are hit constantly, not once in a blue moon
    val markupChar = Gen.oneOf('<', '>', '&', ';', '/', '!', '-', '"',
      '\'', '=', 'a', 'p', 's', ' ', '\n', '#', 'x', '0', '9')
    val anyHtml = Gen.listOf(Gen.frequency(
      3 -> markupChar, 1 -> Gen.asciiPrintableChar)).map(_.mkString)
    val p = Prop.forAll(anyHtml) { h =>
      val t = HtmlTextUtil.extract(h)
      // total, and normalization holds: no blank lines, no double
      // spaces, no leading/trailing line whitespace
      t.linesIterator.forall(l =>
        l.nonEmpty && l == l.trim && !l.contains("  "))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("the registered expression matches the direct call and is codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val html = "<html><body><h1>Title</h1><p>Body &amp; soul</p></body></html>"
    val got = Seq(html).toDF("h")
      .select(expr("html_text(h)").as("t")).collect()(0).getString(0)
    assert(got == x(html))
    assert(got == "Title\nBody & soul")
    // codegen check needs a row-dependent input — a pure literal would
    // be constant-folded out of the plan before codegen runs
    val df = spark.range(2)
      .select(concat(lit("<p>row "), col("id"), lit(" &amp; co</p>")).as("h"))
      .select(expr("html_text(h)").as("t"))
    assert(df.orderBy("t").collect().map(_.getString(0)).toSeq ==
      Seq("row 0 & co", "row 1 & co"))
    // a `*(n)`-starred Project line = the expression stayed inside
    // whole-stage codegen (executedPlan prints codegen stages as stars)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("html_text")), plan)
  }
}
