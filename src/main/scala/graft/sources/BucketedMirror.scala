package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed serving mirror — the co-located-join layout for the hot
  * read path. The reference keeps its serving tables fast with btree
  * indexes keyed by account (`m0001-…sql`; every B1/B6/B7 query starts
  * `WHERE account = ?`). Spark's analog for repeated key-local work is
  * BUCKETING: hash-partition the table into a fixed number of buckets
  * on the serving key AT WRITE TIME, so every later aggregation or join
  * on that key reads pre-clustered data and plans with NO shuffle at
  * all — `EnsureRequirements` sees the bucketed scan's hash
  * partitioning already satisfies the operator's distribution.
  *
  * At 100 TB this moves the dominant cost of the serving path (the
  * every-query exchange of the fact table) to a once-per-refresh write.
  * Two tables bucketed on the same key with the same bucket count
  * (e.g. `ati` and `summaries` by account) join shuffle-free on either
  * side. Pick the bucket count for the TARGET cluster: one bucket is
  * one task's read unit, so ~2–4× total executor cores, and files of
  * hundreds of MB, not the test fixture's toy counts.
  *
  * Bucketing lives in the catalog (file→bucket assignment is metadata),
  * so mirrors are `saveAsTable` external tables at an explicit path —
  * the data stays plain parquet readable by anything; only shuffle
  * elision needs the table name.
  */
object BucketedMirror {

  /** Write/refresh `df` as an external bucketed table. `sortCols`
    * additionally sorts within each bucket file (serving queries that
    * scan one key's rows in id order read them sequentially). */
  def write(df: DataFrame, name: String, path: String, bucketCol: String,
            buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    // saveAsTable(Overwrite) on an existing external table can leave
    // stale files at the path; drop-then-write is the idempotent form.
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Incremental refresh: append a delta (e.g. one ingest micro-batch's
    * new rows) to an existing mirror under the SAME bucket spec — each
    * append adds one file per touched bucket, and bucket pruning /
    * shuffle elision keep working across all appended files because the
    * file→bucket assignment is the same hash. This is how the mirror
    * tracks a continuously-ingesting upstream (the reference's btree is
    * maintained per insert; here the unit is the micro-batch): call it
    * from `foreachBatch` on the ingest stream. Compact periodically with
    * [[write]] — every append adds a file per bucket, and serving reads
    * degrade as files accumulate (same trade-off as btree page splits
    * vs. vacuum). The bucket spec MUST match the original write; Spark
    * rejects a mismatched append. Readers in OTHER sessions cache the
    * table's file listing — they must `spark.catalog.refreshTable(name)`
    * to see new generations (the writing session refreshes itself). */
  def append(df: DataFrame, name: String, bucketCol: String, buckets: Int,
             sortCols: Seq[String] = Nil): Unit = {
    // hard requirement, not a convenience: Append+saveAsTable on a
    // MISSING table silently CTASes a new managed table at the
    // warehouse dir — after a session restart (catalog lost) a resumed
    // ingest stream would orphan the external mirror's entire history
    // and serve only post-restart rows. Re-register (write) first.
    require(df.sparkSession.catalog.tableExists(name),
      s"append target '$name' is not in the catalog — run BucketedMirror.write " +
        "to (re)register the mirror before appending")
    val w = df.write
      .mode(SaveMode.Append)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** REPLAY-SAFE [[append]] for `foreachBatch`: Structured Streaming
    * re-delivers the last micro-batch after a restart (the batch may
    * have committed to the sink before the checkpoint advanced), and a
    * plain append would duplicate its rows in the mirror. This is the
    * standard batchId-dedup pattern: a marker file per applied batch
    * under the mirror's own path (`_applied_batches/<id>` — the `_`
    * prefix hides the directory from Spark's file listing, like
    * `_spark_metadata`), checked before appending. Returns false when
    * the batch was already applied (the replay no-op).
    *
    * Honest bound: the marker commits AFTER the data files, so a crash
    * BETWEEN the two replays one batch's rows into the mirror — the
    * same at-least-once tail every non-transactional file sink has.
    * The serving reads tolerate it (the page lookup dedups on the
    * unique id — exchange-free on the id-bucketed mirror — so a
    * duplicated generation can shorten a page below `limit` but never
    * surfaces a row twice; StreamingSoakSpec pins this), and the
    * periodic [[write]] compaction squashes it;
    * a deployment needing exact files would anti-join the delta on the
    * unique id instead, at the cost of a mirror scan per batch. The
    * DB sink beside this call needs no marker: its conditional inserts
    * ([[graft.streaming.TransactionalSink]]) are row-idempotent.
    *
    * Compact ([[write]]) only while the ingest stream is STOPPED: the
    * overwrite clears the marker directory along with the data files,
    * so an in-flight batch replayed across a compaction would no
    * longer be recognized as applied. */
  def appendOnce(df: DataFrame, name: String, batchId: Long, bucketCol: String,
                 buckets: Int, sortCols: Seq[String] = Nil): Boolean = {
    val spark = df.sparkSession
    require(spark.catalog.tableExists(name),
      s"append target '$name' is not in the catalog — run BucketedMirror.write " +
        "to (re)register the mirror before appending")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .location
    val markers = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(loc), "_applied_batches")
    val fs = markers.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(markers, batchId.toString)
    if (fs.exists(marker)) false
    else {
      append(df, name, bucketCol, buckets, sortCols)
      fs.mkdirs(markers)
      fs.create(marker, false).close()
      true
    }
  }

  /** The mirror as a DataFrame. Must go through the catalog — a plain
    * `spark.read.parquet(path)` of the same files loses the bucket
    * metadata and with it the shuffle elision. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
