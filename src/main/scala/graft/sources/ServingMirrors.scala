package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Registry of the serving-path [[BucketedMirror]]s for one testdata
  * scale directory: `ati` bucketed by `account` (the reference's btree
  * `m0001-…sql` keys every B1/B2/B6/B7 query by account) and
  * `summaries` bucketed by `id` (the reference's primary-key lookup side
  * of the page join). Both are additionally sorted within buckets so a
  * key's rows sit in contiguous, min/max-prunable row groups — together
  * bucket pruning (only the key's bucket files are read) and row-group
  * stats skipping are Spark's answer to the btree random read.
  *
  * Mirrors are built ONCE per scale directory: the write is the
  * once-per-refresh cost that buys every subsequent page query a pruned
  * scan (see [[BucketedMirror]] for the 100 TB sizing notes — at
  * deployment the bucket count tracks the cluster, not this fixture 16).
  * The CATALOG is the memo — a process-local map would outlive a
  * restarted session's catalog and hand back table names that no longer
  * resolve — and the whole check-and-build is synchronized so two
  * concurrent first calls can't race overlapping writes to one path.
  * (If the scratch directory is deleted out from under a still-registered
  * table, drop the tables or restart the session to force a rebuild.)
  */
object ServingMirrors {

  /** Table/path key for a scale dir: 16 hex chars of SHA-256 over the
    * CANONICALIZED absolute path. Two spellings of one directory
    * (`dir` vs `dir/`) share a mirror, and distinct directories cannot
    * collide in practice (64 bits, vs the previous 32-bit `hashCode`
    * where a collision would silently serve the other dir's data). */
  private def keyOf(sfDir: String): String = {
    val canon = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** The (ati, summaries) serving mirrors for `sfDir`, building them on
    * first use (per catalog). Must be read through the catalog
    * ([[BucketedMirror.table]]) to keep the bucket metadata. */
  def atiSummaries(spark: SparkSession, sfDir: String,
                   buckets: Int = 16): (DataFrame, DataFrame) = synchronized {
    val key = keyOf(sfDir)
    val atiT = s"graft_ati_serve_$key"
    val sumT = s"graft_summaries_serve_$key"
    if (!spark.catalog.tableExists(atiT) || !spark.catalog.tableExists(sumT)) {
      val base = new java.io.File(s"target/graft-scratch/serve_$key").getAbsolutePath
      BucketedMirror.write(Tables.ati(spark, sfDir), atiT, s"$base/ati",
        "account", buckets, sortCols = Seq("account", "summary"))
      BucketedMirror.write(Tables.summaries(spark, sfDir), sumT,
        s"$base/summaries", "id", buckets, sortCols = Seq("id"))
    }
    (BucketedMirror.table(spark, atiT), BucketedMirror.table(spark, sumT))
  }
}
