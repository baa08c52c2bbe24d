package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.DomainReputation.PageVerdict

class DomainReputationSpec extends SparkSpec {
  import spark.implicits._

  test("running reputation: per-host counts accumulate, verdict flips live") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[PageVerdict]
    val out = DomainReputation.running(input.toDS(),
      minDocs = 3, minOkPm = 600)
    val q = out.writeStream.format("memory").queryName("rep_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: good.com 2/2 ok but under the volume floor; spam.net
      // 1/2 -> 500 pm, under the rate floor
      input.addData(
        PageVerdict("good.com", true), PageVerdict("good.com", true),
        PageVerdict("spam.net", true), PageVerdict("spam.net", false))
      q.processAllAvailable()
      def live() = spark.sql(
          "SELECT host, n_docs, n_ok, ok_pm, domain_ok FROM rep_sink")
        .as[(String, Long, Long, Long, Boolean)].collect()
        .foldLeft(Map.empty[String, (Long, Long, Long, Boolean)]) {
          (m, r) => m + (r._1 -> ((r._2, r._3, r._4, r._5)))
        }
      val b1 = live()
      assert(b1("good.com") == ((2L, 2L, 1000L, false))) // volume floor
      assert(b1("spam.net") == ((2L, 1L, 500L, false)))  // rate floor
      // batch 2: good.com crosses the volume floor CUMULATIVELY (state
      // carries batch 1's two pages); spam.net keeps failing on rate
      input.addData(
        PageVerdict("good.com", false),
        PageVerdict("spam.net", false), PageVerdict("spam.net", false))
      q.processAllAvailable()
      val b2 = live()
      assert(b2("good.com") == ((3L, 2L, 666L, true)))
      assert(b2("spam.net") == ((4L, 1L, 250L, false)))
      // batch 3: a decayed good.com drops below the rate floor — the
      // verdict tracks the RUNNING rate, not the current trigger's
      input.addData(PageVerdict("good.com", false),
        PageVerdict("good.com", false))
      q.processAllAvailable()
      assert(live()("good.com") == ((5L, 2L, 400L, false)))
    } finally q.stop()
  }

  test("streaming verdict equals the batch domainStats rollup on the union") {
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val all = Seq(
      PageVerdict("a.com", true), PageVerdict("a.com", false),
      PageVerdict("b.org", true), PageVerdict("b.org", true),
      PageVerdict("b.org", false), PageVerdict("a.com", true))
    val input = MemoryStream[PageVerdict]
    val out = DomainReputation.running(input.toDS(), minDocs = 2,
      minOkPm = 600)
    val q = out.writeStream.format("memory").queryName("rep_eq")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(all.take(3): _*); q.processAllAvailable()
      input.addData(all.drop(3): _*); q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT host, n_docs, n_ok, ok_pm, domain_ok FROM rep_eq")
        .as[(String, Long, Long, Long, Boolean)].collect()
        .foldLeft(Map.empty[String, (Long, Long, Long, Boolean)]) {
          (m, r) => m + (r._1 -> ((r._2, r._3, r._4, r._5)))
        }
      val batch = graft.ext.Curation.domainStats(
          all.toDF("host", "ok"), col("host"), col("ok"),
          minDocs = 2, minOkPm = 600)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
