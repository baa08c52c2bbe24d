package graft.query

import graft.{SparkSpec, Tables}
import graft.sources.ServingMirrors

/** Pins the SERVING-path claims [[QueryApi.accountPageServed]] makes —
  * the plan properties that make it the btree analog of the reference's
  * <0.5 s account page (postgres.rs:94-99):
  *  (a) the id probe reads ONLY the account's bucket of the ati mirror
  *      (`SelectedBucketsCount: 1 out of N` — bucket pruning on the
  *      account literal) and plans zero Exchange (TakeOrderedAndProject,
  *      not a sorted shuffle);
  *  (b) the summaries lookup is bucket-pruned by the literal `id IN (…)`
  *      page and also plans zero Exchange;
  *  (c) the served page equals the scan-path [[QueryApi.accountTransactions]]
  *      row-for-row, both directions (the CORRECTNESS rows
  *      b1/b2_served additionally pin this against DuckDB).
  */
class ServingPageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val account = org.apache.spark.sql.functions.lit(7L)
  private lazy val mirrors = ServingMirrors.atiSummaries(spark, sf)

  /** Build `df`'s executed plan with auto-disabling of bucketed scans
    * off. File-level bucket pruning applies EITHER way (the non-bucketed
    * read path still filters files through the bucket set — the default
    * plan only hides it behind "Bucketed: false (disabled by query
    * planner)" because no operator needs the hash distribution); pinning
    * the conf makes the pruning visible as SelectedBucketsCount. */
  private def bucketVisiblePlan(df: => org.apache.spark.sql.DataFrame): String = {
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(k)
    spark.conf.set(k, "false")
    try df.queryExecution.executedPlan.toString
    finally spark.conf.set(k, saved)
  }

  test("id probe: one bucket selected, zero Exchange, top-k fused") {
    val (atiM, _) = mirrors
    val p = bucketVisiblePlan(
      QueryApi.accountPageIds(atiM, account, 0L, 50, ascending = true))
    assert(p.contains("SelectedBucketsCount: 1 out of 16"),
      s"account literal must prune to one bucket:\n$p")
    assert(!p.contains("Exchange"),
      s"id probe must not shuffle (TakeOrderedAndProject):\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected limit+sort fusion in:\n$p")
  }

  test("summaries lookup: bucket-pruned id IN page, zero Exchange") {
    val (atiM, sumM) = mirrors
    val p = bucketVisiblePlan(
      QueryApi.accountPageServed(atiM, sumM, account, 0L, 50,
        ascending = true))
    assert(p.contains("SelectedBucketsCount"),
      s"id IN (…) page must engage bucket pruning on the id mirror:\n$p")
    assert(!p.contains("Exchange"),
      s"summaries lookup must not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected limit+sort fusion in:\n$p")
  }

  test("served page equals the scan path, ascending") {
    val (atiM, sumM) = mirrors
    val served = QueryApi.accountPageServed(atiM, sumM, account, 0L, 50,
        ascending = true).collect().map(_.toSeq).toSeq
    val scanned = QueryApi.accountTransactions(Tables.ati(spark, sf),
        Tables.summaries(spark, sf), org.apache.spark.sql.functions.lit(account),
        0L, Some(50), ascending = true).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == scanned)
  }

  test("contract id probe: one bucket selected, zero Exchange") {
    val (ctiM, _) = ServingMirrors.ctiSummaries(spark, sf)
    val p = bucketVisiblePlan(
      QueryApi.contractPageIds(ctiM, 7L, 1L, 0L, 50, ascending = true))
    assert(p.contains("SelectedBucketsCount: 1 out of 16"),
      s"index literal must prune to one bucket:\n$p")
    assert(!p.contains("Exchange") && p.contains("TakeOrderedAndProject"),
      s"contract id probe must be a shuffle-free top-k:\n$p")
  }

  test("served contract page equals the scan path") {
    val (ctiM, sumM) = ServingMirrors.ctiSummaries(spark, sf)
    val served = QueryApi.contractPageServed(ctiM, sumM, 7L, 1L, 0L, 50,
        ascending = true).collect().map(_.toSeq).toSeq
    val scanned = QueryApi.contractTransactions(Tables.cti(spark, sf),
        Tables.summaries(spark, sf), 7L, 1L, 0L, Some(50),
        ascending = true).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == scanned)
  }

  test("served page equals the scan path, descending") {
    val (atiM, sumM) = mirrors
    val served = QueryApi.accountPageServed(atiM, sumM, account, Long.MaxValue,
        50, ascending = false).collect().map(_.toSeq).toSeq
    val scanned = QueryApi.accountTransactions(Tables.ati(spark, sf),
        Tables.summaries(spark, sf), org.apache.spark.sql.functions.lit(account),
        Long.MaxValue, Some(50), ascending = false).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == scanned)
  }
}
