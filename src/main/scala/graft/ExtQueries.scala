package graft

/** LLM-data-pipeline extensions over `documents` / `embeddings`:
  * dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity
  * search (brute-force + LSH ANN), text analysis, multimodal plumbing.
  * Implementations live in graft.ext; every entry here has a DuckDB
  * oracle computing the identical result (hash/quantization design in
  * [[graft.ext.Text]] / [[graft.ext.Similarity]] makes that possible).
  */
object ExtQueries {
  val queries: Map[String, ExtShared.Q] =
    ExtDedupQueries.queries ++ ExtAnnQueries.queries ++ ExtTextQueries.queries ++ ExtMediaQueries.queries ++ ExtPackQueries.queries ++ ExtGraphQueries.queries

  val oracles: Map[String, String] =
    ExtDedupQueries.oracles ++ ExtAnnQueries.oracles ++ ExtTextQueries.oracles ++ ExtMediaQueries.oracles ++ ExtPackQueries.oracles ++ ExtGraphQueries.oracles
}
