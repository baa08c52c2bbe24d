package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas

/** Unit tests for the block-feed → five-tables derivation (SURVEY §2.A)
  * on tiny literal inputs with hand-computed expectations. */
class BlockIngestSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def feedDf = {
    val rows = Seq(
      // height, seq, hash, time, payload, special, sender, accounts,
      // contracts, cis2, bindings
      Row(0L, 0, "h0", 1000L, """{"k":1}""", false, 7L, Seq(7L, 8L),
        Seq(Row(1L, 0L)), Seq(Row(1L, 0L, "t1", "mint", "100")), null),
      Row(0L, 1, "h0", 1000L, """{"k":2}""", true, null, Seq(9L),
        Seq.empty[Row], Seq.empty[Row], null),
      Row(1L, 0, "h1", 2000L, """{"k":3}""", false, 7L, Seq(7L, 7L, 8L),
        Seq(Row(1L, 0L), Row(1L, 0L)), Seq(Row(1L, 0L, "t1", "burn", "30")),
        Seq(Row(0, 0, "pkA", true))),
      Row(2L, 0, "h2", 3000L, """{"k":4}""", false, 7L, Seq(7L),
        Seq.empty[Row], Seq.empty[Row], Seq(Row(0, 0, "pkB", true), Row(0, 1, "pkC", true)))
    )
    spark.createDataFrame(rows.asJava, Schemas.blockFeed(
      org.apache.spark.sql.types.LongType))
  }

  test("summary ids are deterministic and order-preserving with gaps") {
    val ids = BlockIngest.withId(feedDf).select("id").orderBy("id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(0L, 1L, Schemas.SeqMod, 2 * Schemas.SeqMod))
  }

  test("summaries preserves the Left/Right JSON envelope byte-compatibly") {
    val rows = BlockIngest.summaries(feedDf)
      .orderBy("id").collect()
    assert(rows.map(_.getAs[String]("summary")).toSeq == Seq(
      """{"Left":{"k":1}}""", """{"Right":{"k":2}}""",
      """{"Left":{"k":3}}""", """{"Left":{"k":4}}"""))
    assert(rows.map(_.getAs[Long]("timestamp")).toSeq ==
      Seq(1000L, 1000L, 2000L, 3000L))
  }

  test("ati fan-out dedups per summary but not across summaries") {
    val ati = BlockIngest.ati(feedDf)
      .orderBy("summary", "account").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ati.toSeq == Seq(
      (7L, 0L), (8L, 0L), (9L, 1L),
      (7L, Schemas.SeqMod), (8L, Schemas.SeqMod), // 7 deduped within summary
      (7L, 2 * Schemas.SeqMod)))
  }

  test("cti fan-out dedups duplicate contracts per summary") {
    val cti = BlockIngest.cti(feedDf).collect()
    assert(cti.length == 2) // one per summary that touches (1,0), deduped
  }

  test("cis2 running supply: mint adds, burn subtracts (string decimals)") {
    val tok = BlockIngest.cis2Tokens(feedDf).collect()
    assert(tok.length == 1)
    assert(tok.head.getAs[String]("total_supply") == "70")
  }

  test("key bindings keep only the latest snapshot per address (LWW)") {
    val kb = BlockIngest.keyBindings(feedDf)
      .orderBy("key_index").collect()
    // account 7 updated at height 1 (pkA) then height 2 (pkB,pkC):
    // only the height-2 snapshot survives.
    assert(kb.map(_.getAs[String]("public_key")).toSeq == Seq("pkB", "pkC"))
  }

  test("resume height = height of max id") {
    val h = BlockIngest.resumeHeight(BlockIngest.summaries(feedDf))
      .collect().head.getLong(0)
    assert(h == 2L)
  }

  test("canonicalize maps aliases to canonical addresses via broadcast dim") {
    import spark.implicits._
    val facts = Seq(100L, 101L, 102L, 999L).toDF("account")
    val dim = Seq((25L, 100L)).toDF("prefix", "canonical")
    val out = BlockIngest.canonicalize(facts, "account", dim,
        a => shiftright(a, 2))
      .orderBy("account").collect().map(_.getLong(0))
    // 100..102 share prefix 25 → canonical 100; 999 has no entry → itself
    assert(out.toSeq == Seq(100L, 100L, 100L, 999L))
  }
}
