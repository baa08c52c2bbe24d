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

  /** Table/path key for a scale dir: [[Scratch.key]] over the
    * canonicalized path + data fingerprint + the BUCKET COUNT. Two
    * spellings of one directory share a mirror; distinct directories,
    * regenerated data, or a different `buckets` parameter each get
    * their own tables — the previous name-only memo would silently
    * hand back mirrors built with another call's bucket spec. */
  private def keyOf(sfDir: String, buckets: Int): String =
    Scratch.key(sfDir, s"b$buckets")

  private def scratch(key: String): String = Scratch.dir("serve", key)

  /** Write-if-absent: the catalog is the memo (see object doc). */
  private def ensure(spark: SparkSession, name: String, path: String,
                     df: => DataFrame, bucketCol: String, buckets: Int,
                     sortCols: Seq[String]): Unit =
    if (!spark.catalog.tableExists(name))
      BucketedMirror.write(df, name, path, bucketCol, buckets, sortCols)

  private def summariesMirror(spark: SparkSession, sfDir: String, key: String,
                              buckets: Int): String = {
    val sumT = s"graft_summaries_serve_$key"
    ensure(spark, sumT, s"${scratch(key)}/summaries",
      Tables.summaries(spark, sfDir), "id", buckets, Seq("id"))
    sumT
  }

  /** The (ati, summaries) serving mirrors for `sfDir`, building them on
    * first use (per catalog). Must be read through the catalog
    * ([[BucketedMirror.table]]) to keep the bucket metadata. */
  def atiSummaries(spark: SparkSession, sfDir: String,
                   buckets: Int = 16): (DataFrame, DataFrame) = synchronized {
    val key = keyOf(sfDir, buckets)
    val atiT = s"graft_ati_serve_$key"
    ensure(spark, atiT, s"${scratch(key)}/ati",
      Tables.ati(spark, sfDir), "account", buckets,
      Seq("account", "summary"))
    val sumT = summariesMirror(spark, sfDir, key, buckets)
    (BucketedMirror.table(spark, atiT), BucketedMirror.table(spark, sumT))
  }

  /** The (cti, summaries) serving mirrors — the CONTRACT side of the
    * same btree analog (the reference's `cti` PK serves B3 pages,
    * postgres.rs:120-181): bucketed by `index` (the leading key of the
    * composite (index, subindex)), sorted (index, subindex, summary) so
    * one contract's rows sit contiguous within its bucket. The
    * summaries mirror is SHARED with [[atiSummaries]]. */
  def ctiSummaries(spark: SparkSession, sfDir: String,
                   buckets: Int = 16): (DataFrame, DataFrame) = synchronized {
    val key = keyOf(sfDir, buckets)
    val ctiT = s"graft_cti_serve_$key"
    ensure(spark, ctiT, s"${scratch(key)}/cti",
      Tables.cti(spark, sfDir), "index", buckets,
      Seq("index", "subindex", "summary"))
    val sumT = summariesMirror(spark, sfDir, key, buckets)
    (BucketedMirror.table(spark, ctiT), BucketedMirror.table(spark, sumT))
  }
}
