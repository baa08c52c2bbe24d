package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class TextCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl: well-formed docs parse; malformed and incomplete lines quarantine") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(Paths.get(dir, "corpus.jsonl"),
      """{"doc_id": 1, "text": "alpha beta", "source": "web", "lang": "en"}
        |{"doc_id": 2, "text": "gamma"}
        |{oops not json at all
        |{"doc_id": 3}
        |{"text": "no id"}
        |{"doc_id": 4, "text": "delta", "extra_field": "ignored"}
        |""".stripMargin)
    val r = TextCorpus.readJsonl(spark, dir)
    val docs = r.docs.orderBy("doc_id")
      .select("doc_id", "text", "source", "lang")
      .collect().map(x => (x.getLong(0), x.getString(1),
        Option(x.getString(2)), Option(x.getString(3))))
    assert(docs.toSeq == Seq(
      (1L, "alpha beta", Some("web"), Some("en")),
      (2L, "gamma", None, None),
      (4L, "delta", None, None)))
    val corrupt = r.corrupt.as[String].collect()
    assert(corrupt.length == 3)
    assert(corrupt.exists(_.contains("oops not json")))
    // structurally valid but incomplete lines are quarantined too
    assert(corrupt.exists(_.contains("\"doc_id\":3")))
    assert(corrupt.exists(_.contains("no id")))
  }

  test("csv: quoted multiline text parses; bad rows quarantine, not drop") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(Paths.get(dir, "corpus.csv"),
      "doc_id,text,lang\n" +
        "1,\"alpha beta\",en\n" +
        "2,\"a document\nwith an embedded newline\",de\n" +
        "not_a_number,\"bad id\",en\n" +
        "4,,en\n" + // missing required text
        "5,\"fine\",fr\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("_corrupt_record", StringType, nullable = true)))
    val r = TextCorpus.readCsv(spark, dir, schema,
      required = Seq("doc_id", "text"))
    val docs = r.docs.orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    assert(docs.toSeq == Seq(
      (1L, "alpha beta", "en"),
      (2L, "a document\nwith an embedded newline", "de"),
      (5L, "fine", "fr")))
    val corrupt = r.corrupt.as[String].collect()
    assert(corrupt.length == 2)
    assert(corrupt.exists(_.contains("not_a_number")))
    // the operator surface consumes the docs frame directly
    val stats = graft.ext.TextAnalysis.tokenStats(r.docs,
      org.apache.spark.sql.functions.col("text"),
      org.apache.spark.sql.functions.col("doc_id"))
    assert(stats.count() == 3)
  }

  test("files: one row per file with deterministic path-hash ids") {
    val dir = Files.createTempDirectory("graft-files").toString
    Files.writeString(Paths.get(dir, "a.txt"), "first document")
    Files.writeString(Paths.get(dir, "b.txt"), "second document")
    Files.writeString(Paths.get(dir, "skip.dat"), "not matched")
    val df = TextCorpus.readFiles(spark, dir, pathGlob = "*.txt")
    val rows = df.select("path", "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.map(_._2).toSeq == Seq("first document", "second document"))
    assert(rows.forall(_._3 >= 0L))
    // deterministic across re-reads
    val again = TextCorpus.readFiles(spark, dir, pathGlob = "*.txt")
      .select("path", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(again.toSeq == rows.map(r => (r._1, r._3)).toSeq)
    // feeds the standard operator surface directly
    val stats = graft.ext.TextAnalysis.tokenStats(df,
      org.apache.spark.sql.functions.col("text"),
      org.apache.spark.sql.functions.col("doc_id"))
    assert(stats.count() == 2)
  }
}
