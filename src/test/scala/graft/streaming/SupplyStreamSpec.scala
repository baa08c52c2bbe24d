package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.SupplyStream.Delta

class SupplyStreamSpec extends SparkSpec {
  import spark.implicits._

  test("running supply: per-token BigInteger state across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Delta]
    val out = SupplyStream.running(input.toDS())
    val q = out.writeStream.format("memory").queryName("supply_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two tokens; (0,0,a) gets two deltas in one batch
      input.addData(
        Delta(0, 0, "a", "10"), Delta(0, 0, "a", "5"), Delta(0, 0, "b", "7"))
      q.processAllAvailable()
      val b1 = spark.sql(
        "SELECT token_id, total_supply FROM supply_sink")
        .as[(String, String)].collect().toMap
      assert(b1 == Map("a" -> "15", "b" -> "7"))

      // batch 2: a burn on `a`, plus an amount past Decimal(38) on `c`
      val big = (BigInt(1) << 255).toString
      input.addData(Delta(0, 0, "a", "-6"), Delta(0, 0, "c", big))
      q.processAllAvailable()
      val all = spark.sql(
        "SELECT token_id, total_supply FROM supply_sink")
        .as[(String, String)].collect()
      // update mode appends the revised rows; the LAST row per token is
      // the live supply
      val live = all.foldLeft(Map.empty[String, String])((m, r) => m + r)
      assert(live == Map("a" -> "9", "b" -> "7", "c" -> big))
    } finally q.stop()
  }
}
