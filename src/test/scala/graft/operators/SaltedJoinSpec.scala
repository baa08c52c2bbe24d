package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 fact rows, 90% on one hot key — the straggler shape.
  private def fact = (0 until 1000).map(i =>
    (i.toLong, if (i % 10 == 0) s"k${i % 5}" else "hot", i * 1.5))
    .toDF("id", "key", "v")
  private def dim = Seq(("hot", 1L), ("k0", 2L), ("k1", 3L),
    ("k2", 4L), ("k3", 5L), ("k4", 6L)).toDF("key", "attr")

  test("salted join returns exactly the plain join's rows") {
    val plain = fact.join(dim, "key")
      .select("id", "key", "v", "attr").collect().toSet
    val salted = SaltedJoin.join(fact, dim, "key", col("id"), factor = 8)
      .select("id", "key", "v", "attr").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salting spreads the hot key across sub-partitions") {
    // shuffle on the salted key: the hot key's rows must land in >1
    // partition of the (key, salt) exchange (unsalted, all 900 share one)
    // explicit numPartitions so AQE doesn't coalesce the tiny exchange
    val salted = fact.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .repartition(8, col("key"), col("__salt"))
    val hotPerPartition = salted.mapPartitions { it =>
      Iterator.single(it.count(_.getAs[String]("key") == "hot"))
    }.collect().filter(_ > 0)
    assert(hotPerPartition.length > 1,
      s"expected hot key spread over several partitions, got ${hotPerPartition.toSeq}")
    assert(hotPerPartition.max < 900)
    assert(hotPerPartition.sum == 900)
  }

  test("salt is deterministic: same inputs, same salted assignment twice") {
    val a = SaltedJoin.join(fact, dim, "key", col("id"), 8)
      .orderBy("id").collect().toSeq
    val b = SaltedJoin.join(fact.repartition(7), dim, "key", col("id"), 8)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
