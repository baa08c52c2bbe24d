package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Bloom, GraftFunctions}

class BloomSemiJoinSpec extends SparkSpec {
  import spark.implicits._

  private def buildFilter(keys: Seq[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val agg = udaf(new Bloom.Agg(numBits, numHashes))
    keys.toDF("k").repartition(7) // exercise partial-aggregate merge
      .agg(agg(xxhash64(col("k"))).as("bloom"))
      .collect()(0).getAs[Array[Byte]]("bloom")
  }

  test("no false negatives across partitioned build; bounded false positives") {
    val present = (0L until 2000L).map(_ * 7919L + 13L)
    val numBits = Bloom.optimalBits(2000, 0.01)
    val numHashes = Bloom.optimalHashes(numBits, 2000)
    val bloom = buildFilter(present, numBits, numHashes)

    GraftFunctions.register(spark)
    val probe = (xs: Seq[Long]) =>
      xs.toDF("k").select(
        call_function("bloom_might_contain",
          typedLit(bloom), xxhash64(col("k"))).as("hit"))
        .as[Boolean].collect()

    assert(probe(present).forall(identity), "bloom reported a false negative")

    val absent = (1L to 20000L).map(_ * 104729L + 3L).filterNot(present.contains)
    val fpRate = probe(absent).count(identity).toDouble / absent.size
    assert(fpRate < 0.03, f"false-positive rate $fpRate%.4f way over the 1%% design")
  }

  test("filter sizing: optimal formulas, hard cap degrades bits not correctness") {
    assert(Bloom.optimalBits(1000, 0.01) % 64 == 0)
    assert(Bloom.optimalBits(1000, 0.01) >= 9000) // ~9.59 bits/key at 1%
    assert(Bloom.optimalBits(Long.MaxValue / 2, 0.01) == (1 << 26)) // capped
    assert(Bloom.optimalHashes(9600, 1000) == 7)
    assert(Bloom.optimalHashes(64, 1L << 40) == 1) // clamped low
  }

  test("sized(): KMV-derived filter keeps pruning when the dim is 100x a stale guess") {
    // the VERDICT r11 scenario: a caller's hardcoded expectedItems
    // assumed ~200 keys, the real dim has 20000 — the undersized bloom
    // saturates (every probe hits, pruning silently vanishes), while
    // the data-derived size keeps the fpp near target.
    val nDim = 20000
    val dimKeys = (0 until nDim).map(i => i.toLong * 7919L + 13L)
    val est = BloomSemiJoin.estimateItems(
      dimKeys.map(Tuple1(_)).toDF("dkey").repartition(5), col("dkey"))
    // KMV k=1024 → standard error ~3%; 15% is a loose 5-sigma band
    assert(math.abs(est - nDim).toDouble / nDim < 0.15, s"estimate $est")

    // pruning survives: the derived size keeps false positives rare,
    // the stale 200-key size saturates into pass-through
    val derivedBits = Bloom.optimalBits(math.max(2L * est, 1L << 10), 0.01)
    val derivedBloom = buildFilter(dimKeys, derivedBits,
      Bloom.optimalHashes(derivedBits, math.max(2L * est, 1L << 10)))
    val staleBits = Bloom.optimalBits(200, 0.01)
    val staleBloom = buildFilter(dimKeys, staleBits,
      Bloom.optimalHashes(staleBits, 200))
    GraftFunctions.register(spark)
    val absent = (1 to 20000).map(_.toLong * 104729L + 3L)
      .filterNot(dimKeys.toSet)
    def fpRate(bloom: Array[Byte]) =
      absent.map(Tuple1(_)).toDF("k").select(
        call_function("bloom_might_contain",
          typedLit(bloom), xxhash64(col("k"))).as("hit"))
        .as[Boolean].collect().count(identity).toDouble / absent.size
    assert(fpRate(derivedBloom) < 0.03,
      "derived sizing must hold the design fpp at the real dim size")
    assert(fpRate(staleBloom) > 0.9,
      "the stale guess should saturate (the degradation sized() removes)")

    // and end to end, sized() stays row-identical to the exact semi join
    val fact = (0L until 3000L).map(i => (dimKeys(i.toInt % nDim), s"r$i"))
      .toDF("key", "payload")
    val viaSized = BloomSemiJoin.sized(fact, col("key"),
        dimKeys.map(Tuple1(_)).toDF("dkey"), col("dkey"))
      .orderBy("key", "payload").collect().toSeq
    val exact = fact.join(dimKeys.map(Tuple1(_)).toDF("dkey"),
        col("key") === col("dkey"), "left_semi")
      .orderBy("key", "payload").collect().toSeq
    assert(viaSized == exact && viaSized.nonEmpty)
  }

  test("bloomSemiJoin is row-identical to the exact left-semi join") {
    val fact = (0L until 3000L).map(i => (i % 997, s"row$i"))
      .toDF("key", "payload")
      .union(Seq((null.asInstanceOf[java.lang.Long], "nullrow"))
        .toDF("key", "payload")) // null key: never matches a semi join
    val dim = (0L until 200L).map(i => Tuple1(i * 5)).toDF("dkey")

    val viaBloom = BloomSemiJoin(fact, col("key"), dim, col("dkey"),
        expectedItems = 200, fpp = 0.01)
      .orderBy("key", "payload").collect().toSeq
    val exact = fact.join(dim, col("key") === col("dkey"), "left_semi")
      .orderBy("key", "payload").collect().toSeq
    assert(viaBloom == exact)
    assert(viaBloom.nonEmpty)
  }
}
