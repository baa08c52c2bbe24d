package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup

class BloomAntiJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomAntiJoin is row-identical to the exact left-anti join") {
    // Dense overlap (every 5th key matches) plus a null-key row, which
    // a left-anti join must always keep.
    val fact = (0L until 3000L).map(i => (i % 997, s"row$i"))
      .toDF("key", "payload")
      .union(Seq((null.asInstanceOf[java.lang.Long], "nullrow"))
        .toDF("key", "payload"))
    val dim = (0L until 200L).map(i => Tuple1(i * 5)).toDF("dkey")

    val viaBloom = BloomAntiJoin(fact, col("key"), dim, col("dkey"),
        expectedItems = 200, fpp = 0.01)
      .orderBy("key", "payload").collect().toSeq
    val exact = fact.join(dim, col("key") === col("dkey"), "left_anti")
      .orderBy("key", "payload").collect().toSeq
    assert(viaBloom == exact)
    assert(viaBloom.exists(_.isNullAt(0)), "null-key row must survive")
    assert(viaBloom.nonEmpty)
  }

  test("disjoint sides: everything is new, nothing is lost to the bloom") {
    val fact = (0L until 500L).map(i => Tuple1(i * 2 + 1)).toDF("key") // odd
    val dim = (0L until 500L).map(i => Tuple1(i * 2)).toDF("dkey")     // even
    val out = BloomAntiJoin(fact, col("key"), dim, col("dkey"),
      expectedItems = 500).as[Long].collect().sorted.toSeq
    assert(out == (0L until 500L).map(_ * 2 + 1))
  }

  test("identical sides: nothing is new") {
    val keys = (0L until 400L).map(i => Tuple1(i * 31)).toDF("key")
    assert(BloomAntiJoin(keys, col("key"), keys.select(col("key").as("dkey")),
      col("dkey"), expectedItems = 400).isEmpty)
  }

  test("undersized filter degrades to more exact work, never wrong rows") {
    val fact = (0L until 2000L).map(i => Tuple1(i)).toDF("key")
    val dim = (0L until 2000L).map(i => Tuple1(i * 3)).toDF("dkey")
    val viaBloom = BloomAntiJoin(fact, col("key"), dim, col("dkey"),
        expectedItems = 10, fpp = 0.5) // absurdly undersized
      .as[Long].collect().sorted.toSeq
    val exact = fact.join(dim, col("key") === col("dkey"), "left_anti")
      .as[Long].collect().sorted.toSeq
    assert(viaBloom == exact)
  }

  test("newAgainst finds exactly the docs absent from history") {
    val history = Seq(
      (1L, "the quick brown fox"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "shared boilerplate page")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "shared boilerplate page"),   // dup of history 3 — dropped
      (11L, "a genuinely new document"),  // new
      (12L, "another new document"),      // new
      (13L, "a genuinely new document"))  // intra-batch dup — still new
      .toDF("doc_id", "text")

    val out = Dedup.newAgainst(history, incoming, col("text"), col("doc_id"),
        expectedHistory = 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 12L, 13L))
  }
}
