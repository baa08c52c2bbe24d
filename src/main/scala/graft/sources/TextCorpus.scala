package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion for the formats training data actually arrives in —
  * the seam between raw dumps and the `documents` shape every
  * dedup/text operator consumes (`doc_id`, `text`, plus carried
  * metadata).
  *
  * Three sources:
  *  - [[readJsonl]] — JSON-lines dumps (one document object per line),
  *    the lingua franca of web-scale text corpora. Schema-enforced scan
  *    with PERMISSIVE mode and a corrupt-record side channel: malformed
  *    lines are never silently dropped NOR do they abort the scan —
  *    [[JsonlResult]] splits them off so the pipeline can quarantine
  *    and count them (data-quality accounting is part of curation, the
  *    same reasoning as the B5 drop policy being observable).
  *  - [[readCsv]] — delimited dumps (metadata tables, label files,
  *    smaller corpora). Same quarantine contract as JSONL: PERMISSIVE
  *    parse with the corrupt-record side channel, multiline quoted
  *    fields ON (a document column WILL contain newlines), header
  *    required.
  *  - [[readFiles]] — document-per-file corpora via Spark's `binaryFile`
  *    source (scanned distributed, never through the driver): emits the
  *    file path, modification time, and the decoded UTF-8 text, with a
  *    deterministic doc id derived from the path hash so downstream
  *    dedup keys are stable across re-reads.
  */
object TextCorpus {

  /** Expected JSONL document shape; extra fields in the input are
    * ignored, missing ones surface as nulls. */
  val jsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  final case class JsonlResult(docs: DataFrame, corrupt: DataFrame)

  /** Read a JSONL corpus: `docs` carries well-formed documents with a
    * non-null doc_id and text; `corrupt` carries the raw offending
    * lines (parse failures AND structurally valid lines missing the
    * required fields) for quarantine/metrics. */
  def readJsonl(spark: SparkSession, path: String): JsonlResult = {
    val raw = graft.CacheScope.cacheTracked(spark.read
      .schema(jsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))
    // Spark requires caching or a re-derivable plan when filtering on
    // the corrupt-record column alone; keep the full row and split. The
    // cache is released with the enclosing CacheScope pass.
    val wellFormed = col("_corrupt_record").isNull &&
      col("doc_id").isNotNull && col("text").isNotNull
    JsonlResult(
      docs = raw.where(wellFormed).drop("_corrupt_record"),
      corrupt = raw.where(!wellFormed)
        .select(coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("source"),
            col("lang")))).as("raw_line")))
  }

  final case class CsvResult(docs: DataFrame, corrupt: DataFrame)

  /** Read a CSV corpus with the same quarantine contract as
    * [[readJsonl]]: rows that fail the schema land in `corrupt` as
    * their raw line, never silently dropped, never aborting the scan.
    * `multiLine` is ON because document text columns legitimately
    * contain newlines inside quotes — note the scale trade this buys:
    * multiline CSV files are NOT splittable (one file = one task's
    * read unit), so a 100 TB corpus should arrive as many moderate
    * files, not one giant one. `schema` must include a nullable
    * `_corrupt_record` string column; `required` lists the columns a
    * row must have non-null to count as well-formed. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              required: Seq[String]): CsvResult = {
    val raw = graft.CacheScope.cacheTracked(spark.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path))
    val wellFormed = required.foldLeft(col("_corrupt_record").isNull) {
      (acc, c) => acc && col(c).isNotNull
    }
    val dataCols = schema.fieldNames.filterNot(_ == "_corrupt_record")
    CsvResult(
      docs = raw.where(wellFormed).drop("_corrupt_record"),
      corrupt = raw.where(!wellFormed)
        .select(coalesce(col("_corrupt_record"),
          to_json(struct(dataCols.map(col).toIndexedSeq: _*)))
          .as("raw_line")))
  }

  /** Read a document-per-file corpus: one row per file with the decoded
    * UTF-8 content. `doc_id` = first 60 bits of md5(path) as a
    * non-negative long (deterministic across re-reads; collisions are
    * negligible below ~2^30 files — use the path itself as the join key
    * when that matters). `pathGlob` filters files (e.g. `*.txt`). */
  def readFiles(spark: SparkSession, path: String,
                pathGlob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(path)
      .select(
        graft.ext.Text.hash60(col("path")).as("doc_id"),
        col("path"),
        col("modificationTime"),
        col("content").cast("string").as("text"))
}
