package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Bloom, GraftFunctions}

/** Bloom-accelerated left-ANTI join — the "what is genuinely new?"
  * primitive of a continuously-growing corpus: return the fact rows
  * whose key does NOT appear in the dim side, without shuffling either
  * full side.
  *
  * The semi-join direction ([[BloomSemiJoin]]) prunes only the fact
  * side, because a bloom miss there *excludes* a row and a hit must be
  * verified. The anti direction is the mirror image, and it prunes
  * BOTH sides:
  *
  *  1. aggregate the dim side's key hashes into one bloom filter
  *     (partial per-partition aggregation, merge = bitwise OR);
  *  2. probe the fact side: a bloom MISS proves the key is absent from
  *     dim (no false negatives), so the row is part of the answer
  *     immediately — zero further work. Only the hits — true matches
  *     plus `fpp·|fact|` false positives — become candidates for the
  *     exact check;
  *  3. build a SECOND bloom over the candidates' keys (the small
  *     survivor set) and broadcast it into the dim scan: dim rows whose
  *     key cannot be among the candidates are irrelevant to the exact
  *     join and are dropped at scan time, BEFORE dim's exchange;
  *  4. exact left-anti join of candidates against the pruned dim
  *     scrubs step 2's false positives.
  *
  * Result = step-2 misses ∪ step-4 survivors — row-for-row identical to
  * `fact.join(dim, key, "left_anti")` (misses are provably absent;
  * candidates are settled exactly). The exchange under the exact join
  * moves `~(matches + fpp·|fact|)` fact rows and `~(matches +
  * fpp·|dim|)` dim rows instead of both full tables: at 100 TB of
  * history and a fresh crawl batch, both sides of the shuffle are the
  * size of the OVERLAP, not the corpus.
  *
  * Null semantics match Spark's left-anti join: a null fact key equals
  * nothing, so the row is always in the answer (it takes the candidate
  * path — xxhash64 of a null column is a constant — and survives the
  * exact anti join).
  *
  * An undersized `expectedItems` degrades to a higher false-positive
  * rate — more rows through the exact join, never wrong results
  * ([[Bloom.optimalBits]] caps the filter at 8 MiB either way).
  */
object BloomAntiJoin {

  def apply(fact: DataFrame, factKey: Column,
            dim: DataFrame, dimKey: Column,
            expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(fact.sparkSession)

    def bloomOver(df: DataFrame, key: Column, n: Long): DataFrame = {
      val bits = Bloom.optimalBits(n, fpp)
      val agg = udaf(new Bloom.Agg(bits, Bloom.optimalHashes(bits, n)))
      df.select(xxhash64(key).as("__h")).agg(agg(col("__h")).as("__bloom"))
    }

    val dimBloom = bloomOver(dim, dimKey, expectedItems)
    val probed = fact.join(broadcast(dimBloom)) // one-row build: no shuffle
    val hit = call_function("bloom_might_contain",
      col("__bloom"), xxhash64(factKey))

    // Bloom misses are settled: the key is provably absent from dim.
    val definiteNew = probed.where(!hit).drop("__bloom")
    val candidates = probed.where(hit).drop("__bloom")

    // Reverse prune: drop dim rows that cannot match any candidate key,
    // at scan time, before dim's exchange. Candidate count is unknown
    // without an extra job, so size the filter by the same expectedItems
    // bound — oversizing only wastes (capped) filter bits.
    val candBloom = bloomOver(candidates, factKey, expectedItems)
    val prunedDim = dim.join(broadcast(candBloom))
      .where(call_function("bloom_might_contain",
        col("__bloom"), xxhash64(dimKey)))
      .select(dimKey.as("__dim_key"))

    val survivors = candidates.join(prunedDim,
      factKey === col("__dim_key"), "left_anti")
    definiteNew.unionByName(survivors)
  }
}
