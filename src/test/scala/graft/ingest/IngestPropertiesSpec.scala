package graft.ingest

import java.math.BigInteger

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.model.Schemas

/** Property-based invariants from the reference's documented contract
  * (SURVEY §5.3): id monotonicity-with-gaps (README.md:101), Left/Right
  * envelope round-trip (main.rs:99-109), alias-class canonicalization
  * equivalence (main.rs:133-146), and mint/burn supply conservation.
  * Driven by raw scalacheck (no scalatest bridge in the offline dep
  * set): pure-Scala properties run hundreds of cases, Spark-backed ones
  * a handful (each case is a full job).
  */
class IngestPropertiesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def checkProp(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  test("summary ids are strictly increasing in (height, seq) — gaps allowed") {
    val pairGen = for {
      h <- Gen.chooseNum(0L, 1L << 40)
      s <- Gen.chooseNum(0, (Schemas.SeqMod - 1).toInt)
    } yield (h, s)
    checkProp(Prop.forAll(pairGen, pairGen) { (a, b) =>
      val idA = a._1 * Schemas.SeqMod + a._2
      val idB = b._1 * Schemas.SeqMod + b._2
      // order-preserving AND invertible
      ((idA < idB) == (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))) &&
        (idA >> Schemas.SeqBits) == a._1 &&
        (idA & (Schemas.SeqMod - 1)) == a._2
    }, cases = 500)
  }

  test("Left/Right envelope preserves any JSON payload byte-compatibly") {
    val jsonGen = for {
      k <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
      v <- Gen.chooseNum(-1000000L, 1000000L)
    } yield s"""{"$k":$v}"""
    checkProp(Prop.forAll(jsonGen, Gen.oneOf(true, false)) { (payload, special) =>
      val rows = Seq(Row(1L, 0, "h", 0L, payload, special, 5L,
        Seq(5L), Seq.empty[Row], Seq.empty[Row], null))
      val feed = spark.createDataFrame(rows.asJava,
        Schemas.blockFeed(org.apache.spark.sql.types.LongType))
      val out = BlockIngest.summaries(feed).collect().head.getAs[String]("summary")
      val tag = if (special) "Right" else "Left"
      out == s"""{"$tag":$payload}"""
    }, cases = 6)
  }

  test("canonicalization is idempotent and constant on an alias class") {
    // alias class = id div 8; canonical = class * 8. Any member maps to
    // the canonical, and canonicalizing twice equals canonicalizing once.
    val accGen = Gen.chooseNum(0L, 1023L)
    checkProp(Prop.forAll(Gen.listOfN(20, accGen)) { accounts =>
      import spark.implicits._
      val df = accounts.toDF("account")
      val dim = accounts.map(a => (a >> 3, (a >> 3) << 3))
        .distinct.toDF("prefix", "canonical")
      def canon(d: org.apache.spark.sql.DataFrame) =
        BlockIngest.canonicalize(d, "account", dim,
          a => org.apache.spark.sql.functions.shiftright(a, 3))
      val once = canon(df).collect().map(_.getLong(0)).toSeq
      val twice = canon(canon(df)).collect().map(_.getLong(0)).toSeq
      once == accounts.map(a => (a >> 3) << 3) && twice == once
    }, cases = 5)
  }

  test("mint/burn supply conservation: total = sum of signed deltas") {
    val eventGen = Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.oneOf("mint", "burn"))
    checkProp(Prop.forAll(Gen.listOfN(12, eventGen)) { events =>
      val rows = events.zipWithIndex.map { case ((amt, kind), i) =>
        Row(i.toLong, 0, s"h$i", 0L, "{}", false, 1L, Seq(1L),
          Seq.empty[Row],
          Seq(Row(0L, 0L, "t", kind, amt.toString)), null)
      }
      val feed = spark.createDataFrame(rows.asJava,
        Schemas.blockFeed(org.apache.spark.sql.types.LongType))
      val got = BlockIngest.cis2Tokens(feed).collect()
      val expected = events.map { case (amt, kind) =>
        if (kind == "mint") BigInteger.valueOf(amt)
        else BigInteger.valueOf(amt).negate()
      }.foldLeft(BigInteger.ZERO)(_.add(_))
      if (events.isEmpty) got.isEmpty
      else new BigInteger(got.head.getAs[String]("total_supply")) == expected
    }, cases = 5)
  }
}
