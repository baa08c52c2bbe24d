package graft.functions

import graft.SparkSpec

/** BigInteger string-sum aggregator: values beyond Decimal(38), signs,
  * nulls, and partitioning-independence (the merge path). */
class U256Spec extends SparkSpec {
  import spark.implicits._

  test("sums 2^256-scale values exactly (beyond Decimal(38))") {
    val big = BigInt(2).pow(255).toString
    val df = Seq(big, big, "1").toDF("v")
    val out = df.agg(U256.sumBig($"v").as("s")).collect().head.getString(0)
    assert(out == (BigInt(2).pow(256) + 1).toString)
  }

  test("handles negative deltas (burn) and nulls") {
    val df = Seq(Some("100"), Some("-30"), None, Some("-90")).toDF("v")
    val out = df.agg(U256.sumBig($"v").as("s")).collect().head.getString(0)
    assert(out == "-20")
  }

  test("partitioning-independent: same result at 1 and 8 partitions") {
    val rnd = new scala.util.Random(42)
    val xs = List.fill(200)(BigInt(256, rnd) - BigInt(2).pow(255))
    val expected = xs.sum.toString
    val df = xs.map(_.toString).toDF("v")
    val one = df.coalesce(1).agg(U256.sumBig($"v")).collect().head.getString(0)
    val many = df.repartition(8).agg(U256.sumBig($"v")).collect().head.getString(0)
    assert(one == expected)
    assert(many == expected)
  }
}
