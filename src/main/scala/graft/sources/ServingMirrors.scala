package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Process-wide registry of the serving-path [[BucketedMirror]]s for one
  * testdata scale factor: `ati` bucketed by `account` (the reference's
  * btree `m0001-…sql` keys every B1/B2/B6/B7 query by account) and
  * `summaries` bucketed by `id` (the reference's primary-key lookup side
  * of the page join). Both are additionally sorted within buckets so a
  * key's rows sit in contiguous, min/max-prunable row groups — together
  * bucket pruning (only the key's bucket files are read) and row-group
  * stats skipping are Spark's answer to the btree random read.
  *
  * Mirrors are built ONCE per scale directory and memoized: the write is
  * the once-per-refresh cost that buys every subsequent page query a
  * pruned scan (see [[BucketedMirror]] for the 100 TB sizing notes — at
  * deployment the bucket count tracks the cluster, not this fixture 16).
  */
object ServingMirrors {

  private val built = scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** The (ati, summaries) serving mirrors for `sfDir`, building them on
    * first use. Must be read through the catalog ([[BucketedMirror.table]])
    * to keep the bucket metadata. */
  def atiSummaries(spark: SparkSession, sfDir: String,
                   buckets: Int = 16): (DataFrame, DataFrame) = {
    val key = java.lang.Long.toHexString(
      java.lang.Integer.toUnsignedLong(sfDir.hashCode))
    val (atiT, sumT) = built.getOrElseUpdate(key, {
      val base = new java.io.File(s"target/graft-scratch/serve_$key").getAbsolutePath
      val atiT = s"graft_ati_serve_$key"
      val sumT = s"graft_summaries_serve_$key"
      BucketedMirror.write(Tables.ati(spark, sfDir), atiT, s"$base/ati",
        "account", buckets, sortCols = Seq("account", "summary"))
      BucketedMirror.write(Tables.summaries(spark, sfDir), sumT,
        s"$base/summaries", "id", buckets, sortCols = Seq("id"))
      (atiT, sumT)
    })
    (BucketedMirror.table(spark, atiT), BucketedMirror.table(spark, sumT))
  }
}
