package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QueryApiSpec extends SparkSpec {
  import spark.implicits._

  private def ati = Seq(
    (7L, 1L), (7L, 3L), (7L, 5L), (8L, 2L), (8L, 3L)).toDF("account", "summary")
  private def sums = Seq(
    (1L, "b1", 10L, 0L, "s1"), (2L, "b1", 10L, 0L, "s2"),
    (3L, "b2", 20L, 1L, "s3"), (5L, "b3", 30L, 2L, "s5")
  ).toDF("id", "block", "timestamp", "height", "summary")

  test("account page asc honors keyset cursor and limit") {
    val out = QueryApi.accountTransactions(ati, sums, lit(7L), 3L, Some(2),
      ascending = true).collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(3L, 5L))
  }

  test("account page desc starts from MAX sentinel") {
    val out = QueryApi.accountTransactions(ati, sums, lit(7L), Long.MaxValue,
      Some(10), ascending = false).collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(5L, 3L, 1L))
  }

  test("top-k per account via window") {
    val out = QueryApi.topKPerAccount(ati, 2)
      .orderBy("account", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((7L, 5L), (7L, 3L), (8L, 3L), (8L, 2L)))
  }

  test("top-k per account: a hot account owning >80% of rows stays exact and bounded") {
    // 10k rows for account 1 spread over 16 input partitions, a handful
    // for everyone else — the exchange-hot-account shape at 100x. The
    // partial WindowGroupLimit (pinned in PlanSpec) caps what each map
    // task forwards per account at k, so the reducer sees <= k x 16 rows
    // for the hot key; the result must still be the exact global top-k.
    val hot = spark.range(10000).select(lit(1L).as("account"),
      (col("id") * 7 % 9973).as("summary")).repartition(16)
    val cold = Seq((2L, 11L), (2L, 12L), (3L, 5L)).toDF("account", "summary")
    val out = QueryApi.topKPerAccount(hot.union(cold), 3)
      .orderBy("account", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // top summary values of id*7 % 9973 over id<10000: the three largest
    // residues of the full cycle 0..9972 are 9972, 9971, 9970
    assert(out.take(3) == Seq((1L, 9972L, 1), (1L, 9971L, 2), (1L, 9970L, 3)))
    assert(out.drop(3) == Seq((2L, 12L, 1), (2L, 11L, 2), (3L, 5L, 1)))
  }

  test("row decode silently drops rows whose summary fails to parse") {
    val withBad = Seq(
      (1L, "b1", 10L, 0L, """{"Left":{"k":1}}"""),
      (2L, "b1", 10L, 0L, """{oops not json"""), // dropped, not an error
      (3L, "b2", 20L, 1L, """{"Right":{"k":3}}""")
    ).toDF("id", "block", "timestamp", "height", "summary")
    val out = QueryApi.decodeRows(withBad).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getString(1) == "1" && out(0).getString(2) == null)
    assert(out(1).getString(1) == null && out(1).getString(2) == "3")
  }

  test("strict decode projects nested typed fields for valid envelopes") {
    val ok = Seq(
      (1L, "b1", 10L, 0L, """{"Left":{"k":1}}"""),
      (3L, "b2", 20L, 1L, """{"Right":{"k":3}}""")
    ).toDF("id", "block", "timestamp", "height", "summary")
    val out = QueryApi.decodeRowsStrict(ok).orderBy("id").collect()
    assert(out(0).getString(1) == "Left" &&
      out(0).getLong(2) == 1L && out(0).isNullAt(3))
    assert(out(1).getString(1) == "Right" &&
      out(1).isNullAt(2) && out(1).getLong(3) == 3L)
  }

  test("strict decode hard-fails on malformed JSON (FAILFAST, lib.rs:307-311)") {
    val bad = Seq((2L, "b1", 10L, 0L, """{oops not json"""))
      .toDF("id", "block", "timestamp", "height", "summary")
    val e = intercept[Exception] {
      QueryApi.decodeRowsStrict(bad).collect()
    }
    assert(e.getMessage.contains("Malformed") ||
      Option(e.getCause).exists(_.getMessage.contains("Malformed")))
  }

  test("strict decode hard-fails on an unknown envelope variant") {
    val unknown = Seq((4L, "b1", 10L, 0L, """{"Middle":{"k":4}}"""))
      .toDF("id", "block", "timestamp", "height", "summary")
    val e = intercept[Exception] {
      QueryApi.decodeRowsStrict(unknown).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown summary variant at id 4")))
  }

  test("strict decode guard survives column pruning of the variant column") {
    // the hard-stop is a filter, so selecting ONLY left_k must still fail
    val unknown = Seq((9L, "b1", 10L, 0L, """{"Middle":{"k":9}}"""))
      .toDF("id", "block", "timestamp", "height", "summary")
    val e = intercept[Exception] {
      QueryApi.decodeRowsStrict(unknown).select("left_k").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown summary variant at id 9")))
  }

  test("change feed keeps protocol events (null sender) and drops own sends") {
    val sws = Seq(
      (1L, "b1", 10L, 0L, "s1", Some(7L)),  // own send → dropped
      (3L, "b2", 20L, 1L, "s3", Some(9L)),  // incoming → kept
      (5L, "b3", 30L, 2L, "s5", None)       // protocol → kept
    ).toDF("id", "block", "timestamp", "height", "summary", "sender")
    val out = QueryApi.changeFeed(ati, sws, lit(7L), 0L, 100)
      .collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(3L, 5L))
  }
}
