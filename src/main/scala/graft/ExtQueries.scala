package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline extensions over `documents` / `embeddings`
  * (dedup, similarity search, text analysis, multimodal plumbing).
  * Implementations live in graft.ext; this binds them to the driver
  * testdata with oracle SQL where DuckDB can express the same result. */
object ExtQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> ((s, d) =>
      ext.Dedup.exact(Tables.documents(s, d), col("text"), col("doc_id"))
        .orderBy("content_hash"))
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1"""
  )
}
