package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Bloom, GraftFunctions}

/** Bloom-accelerated left-semi join — the explicit form of the runtime
  * join filter that decides whether a 100 TB semi join is feasible:
  *
  *  1. aggregate the dim side's key hashes into one bloom filter
  *     (partial aggregation per partition, merge = bitwise OR — one
  *     pass, a few MB of state);
  *  2. broadcast the single-row filter into the fact side and drop
  *     every fact row whose key cannot be in the dim set, at scan time,
  *     BEFORE any exchange;
  *  3. run the exact left-semi join on the survivors, which scrubs the
  *     bloom's false positives.
  *
  * The result is row-for-row IDENTICAL to `fact.join(dim, key,
  * "left_semi")` — no false negatives by construction, false positives
  * removed by step 3 — but the exchange under the exact join moves only
  * `matches + fpp·|fact|` rows instead of the whole fact table. That is
  * the difference between shuffling ~100 TB and shuffling ~the answer.
  * (Null fact keys never match a semi join; they may pass the bloom but
  * are scrubbed like any false positive.)
  *
  * An oversized dim degrades gracefully: [[Bloom.optimalBits]] caps the
  * filter size, which raises the false-positive rate and shifts work to
  * the exact join — never wrong results. Callers with a truly huge dim
  * should partition it and intersect per-partition filters, or accept
  * the plain shuffle join.
  */
object BloomSemiJoin {

  def apply(fact: DataFrame, factKey: Column,
            dim: DataFrame, dimKey: Column,
            expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val numBits = Bloom.optimalBits(expectedItems, fpp)
    val numHashes = Bloom.optimalHashes(numBits, expectedItems)
    val bloomAgg = udaf(new Bloom.Agg(numBits, numHashes))
    val filter = dim.select(xxhash64(dimKey).as("__h"))
      .agg(bloomAgg(col("__h")).as("__bloom"))
    fact.join(broadcast(filter)) // one-row build side: broadcast, no shuffle
      .where(call_function("bloom_might_contain",
        col("__bloom"), xxhash64(factKey)))
      .drop("__bloom")
      .join(dim.select(dimKey.as("__dim_key")).distinct(),
        factKey === col("__dim_key"), "left_semi")
  }
}
