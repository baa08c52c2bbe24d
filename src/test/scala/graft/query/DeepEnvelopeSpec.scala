package graft.query

import graft.SparkSpec

/** [[QueryApi.decodeRowsDeep]] against hand-written REFERENCE-SHAPED
  * envelope fixtures — the nested `BlockItemSummary` /
  * `SpecialTransactionOutcome` layout the reference round-trips
  * (postgres.rs:17-28) and pattern-matches (main.rs:686-700), which the
  * driver's synthetic `{k: n}` payloads cannot exercise: details type
  * tag, sender, events array, protocol tag, and the three hard-stop
  * policies (malformed JSON, unknown variant, unknown details type).
  */
class DeepEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val leftTransfer =
    """{"Left":{"index":0,"energyCost":501,
      |"hash":"9b1deb4d3b7d4bad9bdd2b0d7b3dcb6d2b0d7b3dcb6d9b1deb4d3b7d4bad9bdd",
      |"details":{"type":"accountTransaction","cost":"16500",
      |"sender":"3gLPEnq9zGSZ6saeciSkDPbdR2h4BNzfT1DF2JZmAxcZZBXzqz",
      |"events":[{"tag":"Transferred","amount":"1000000","to":"4tQeqGKgxLEn"},
      |{"tag":"Memo","amount":null,"to":null}]}}}""".stripMargin.replace("\n", "")
  private val leftCreation =
    """{"Left":{"index":1,"energyCost":0,
      |"hash":"aa1deb4d3b7d4bad9bdd2b0d7b3dcb6d2b0d7b3dcb6d9b1deb4d3b7d4bad9bdd",
      |"details":{"type":"accountCreation","cost":null,
      |"sender":null,"events":[]}}}""".stripMargin.replace("\n", "")
  private val rightMint =
    """{"Right":{"tag":"mint","account":"foundation","amount":"42"}}"""

  private def frame(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "summary")

  test("projects the nested reference fields for both variants") {
    val out = QueryApi.decodeRowsDeep(
      frame(1L -> leftTransfer, 2L -> leftCreation, 3L -> rightMint))
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[String]("variant") == "Left")
    assert(r1.getAs[Long]("tx_index") == 0L)
    assert(r1.getAs[String]("details_type") == "accountTransaction")
    assert(r1.getAs[String]("sender")
      == "3gLPEnq9zGSZ6saeciSkDPbdR2h4BNzfT1DF2JZmAxcZZBXzqz")
    assert(r1.getAs[Int]("n_events") == 2)
    assert(r1.getAs[String]("first_event_tag") == "Transferred")
    assert(r1.isNullAt(r1.fieldIndex("protocol_tag")))
    val r2 = out(1)
    assert(r2.getAs[String]("details_type") == "accountCreation")
    assert(r2.getAs[Int]("n_events") == 0)
    assert(r2.isNullAt(r2.fieldIndex("first_event_tag")))
    val r3 = out(2)
    assert(r3.getAs[String]("variant") == "Right")
    assert(r3.isNullAt(r3.fieldIndex("details_type")))
    assert(r3.isNullAt(r3.fieldIndex("n_events")))
    assert(r3.getAs[String]("protocol_tag") == "mint")
    assert(r3.getAs[String]("protocol_amount") == "42")
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("hard-fails on an unknown envelope variant") {
    val e = intercept[Exception] {
      QueryApi.decodeRowsDeep(
        frame(4L -> """{"Middle":{"index":9}}""")).collect()
    }
    assert(msgs(e).exists(_.contains("unknown summary variant at id 4")))
  }

  test("hard-fails on an unknown details type tag (Upward::Unknown)") {
    val unknownType = leftTransfer.replace("accountTransaction", "futureV9Thing")
    val e = intercept[Exception] {
      QueryApi.decodeRowsDeep(frame(5L -> unknownType)).collect()
    }
    assert(msgs(e).exists(_.contains("unknown block item details type at id 5")))
  }

  test("hard-fails on a Left with MISSING details type (null tag)") {
    val e = intercept[Exception] {
      QueryApi.decodeRowsDeep(
        frame(6L -> """{"Left":{"index":2,"details":{"cost":"1"}}}""")).collect()
    }
    assert(msgs(e).exists(_.contains("unknown block item details type at id 6")))
  }

  test("hard-fails on malformed JSON (FAILFAST)") {
    val e = intercept[Exception] {
      QueryApi.decodeRowsDeep(frame(7L -> """{oops not json""")).collect()
    }
    assert(msgs(e).exists(_.contains("Malformed")) ||
      msgs(e).exists(_.contains("MALFORMED")))
  }

  test("guards survive column pruning of a single nested projection") {
    val unknownType = leftTransfer.replace("accountTransaction", "futureV9Thing")
    val e = intercept[Exception] {
      QueryApi.decodeRowsDeep(frame(8L -> unknownType))
        .select("sender").collect()
    }
    assert(msgs(e).exists(_.contains("unknown block item details type at id 8")))
  }
}
