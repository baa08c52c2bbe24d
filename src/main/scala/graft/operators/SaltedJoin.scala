package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: when a shuffle join's key distribution is
  * heavily skewed (a handful of hot keys holding most rows) and the
  * other side is too large to broadcast, a plain shuffle sends every
  * row of a hot key to ONE reducer — the straggler that dominates the
  * stage at 100 TB. Salting spreads each hot key over `factor`
  * sub-partitions:
  *
  *  - the FACT side gets a deterministic salt in [0, factor) derived by
  *    hashing a high-cardinality fact column (`saltSource`) — not a
  *    random number, so task retries and replays stay idempotent;
  *  - the DIM side is replicated `factor`× (one copy per salt value);
  *  - the join key becomes (key, salt), so each hot key's rows land on
  *    `factor` reducers instead of one.
  *
  * Cost: dim shuffle volume ×factor — the usual trade. AQE's skew-join
  * handles sort-merge skew adaptively at runtime; this operator is the
  * explicit, planner-independent form for pipelines that must bound
  * stragglers up front (or joins AQE cannot split, e.g. under
  * bucketing). Results are exactly those of the unsalted join.
  */
object SaltedJoin {

  def join(fact: DataFrame, dim: DataFrame, key: String,
           saltSource: Column, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
