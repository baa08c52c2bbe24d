package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("attaches most recent right row at or before left time, per key") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 6L, 300L))
      .toDF("k", "t", "v")
    val out = AsOfJoin(left, right,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        payload = Seq(col("v").as("last_v")), tiebreak = col("v"))
      .orderBy("name")
      .select("name", "last_v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // e1: right at exactly t=10 matches; e2: latest ≤25 is t=20;
    // e3: right at t=6 is AFTER t=5 → no match (null → -1)
    assert(out.toSeq == Seq(("e1", 100L), ("e2", 200L), ("e3", -1L)))
  }

  test("equal right times resolved by tiebreak (largest wins)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 9L)).toDF("k", "t", "v")
    val out = AsOfJoin(left, right, col("k"), col("k"), col("t"), col("t"),
      Seq(col("v").as("last_v")), col("v")).collect()
    assert(out.head.getAs[Long]("last_v") == 9L)
  }
}
