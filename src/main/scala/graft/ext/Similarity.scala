package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Float discipline: embeddings are quantized to integers
  * (`round(x * 1e6)` per component) before any arithmetic, so dot
  * products and squared norms are EXACT integer sums — identical under
  * any partitioning, any engine, any summation order. Only the final
  * cosine (one int division + one sqrt) touches floating point, and
  * that is a single deterministic IEEE operation in both engines.
  */
object Similarity {

  /** Quantized embedding: array<long> of round(x*1e6). */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1e6).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** cosine = dot / (sqrt(|a|^2 * |b|^2)) on quantized ints, rounded to
    * 6 dp (the rounding is on a deterministic double, so both engines
    * agree). */
  def cosineQ(qa: Column, qb: Column): Column =
    round(dotQ(qa, qb).cast("double") /
      sqrt(dotQ(qa, qa).cast("double") * dotQ(qb, qb).cast("double")), 6)

  /** cosine with pre-computed squared norms — the per-pair cost drops to
    * one dot product; norms are computed once per VECTOR, not once per
    * candidate pair (at scale each vector is in many pairs). The double
    * math is the exact same sequence of IEEE ops as [[cosineQ]]. */
  def cosineQNormed(qa: Column, qb: Column, n2a: Column, n2b: Column): Column =
    round(dotQ(qa, qb).cast("double") /
      sqrt(n2a.cast("double") * n2b.cast("double")), 6)

  /** Brute-force top-k cosine neighbours of one query vector: the
    * baseline ANN. The single query row is broadcast (no shuffle of the
    * corpus); the top-k is TakeOrderedAndProject — no global sort.
    * Scale: O(corpus) scan per query — fine as the verify/recall
    * baseline; use [[annLsh]] (or an IVF variant of it) as the serving
    * path. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, embCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = embeddings.where(col(idCol) === queryId)
      .select(quantize(col(embCol)).as("__q"))
      .withColumn("__qn2", dotQ(col("__q"), col("__q")))
    embeddings.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), quantize(col(embCol)).as("__e"), col("__q"), col("__qn2"))
      .select(col(idCol),
        cosineQNormed(col("__e"), col("__q"),
          dotQ(col("__e"), col("__e")), col("__qn2")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id (`planes` sign bits). The plane
    * weights are md5-derived integers (hash60(p:i) % 1000 - 500), so the
    * sign is computed on an EXACT integer sum — portable and
    * deterministic. DuckDB mirror uses the same formula. */
  def lshBucket(qEmb: Column, dim: Int, planes: Int): Column = {
    val bit: Int => Column = p => {
      val s = aggregate(
        zip_with(qEmb,
          transform(sequence(lit(0), lit(dim - 1)),
            i => Text.hash60(concat(lit(p.toString), lit(":"), i.cast("string"))) % 1000 - 500),
          (x, w) => x * w),
        lit(0L), (acc, v) => acc + v)
      when(s > 0, lit(1L << p)).otherwise(0L)
    }
    (0 until planes).map(bit).reduce(_ + _)
  }

  /** LSH-bucketed ANN: search only the query's bucket. One shuffle-free
    * scan with a pushed bucket filter once bucket ids are materialized;
    * here computed inline. Recall < 1 by construction — pair with
    * [[bruteForceTopK]] for recall measurement. */
  def annLsh(embeddings: DataFrame, idCol: String, embCol: String,
             queryId: Long, k: Int, dim: Int = 64, planes: Int = 4): DataFrame = {
    val withBucket = embeddings.select(col(idCol),
        quantize(col(embCol)).as("__qe"))
      .withColumn("__n2", dotQ(col("__qe"), col("__qe")))
      .withColumn("__bucket", lshBucket(col("__qe"), dim, planes))
    val q = withBucket.where(col(idCol) === queryId)
      .select(col("__qe").as("__q"), col("__n2").as("__qn2"),
        col("__bucket").as("__qb"))
    withBucket.where(col(idCol) =!= queryId)
      .join(broadcast(q), col("__bucket") === col("__qb"))
      .select(col(idCol),
        cosineQNormed(col("__qe"), col("__q"), col("__n2"), col("__qn2")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding near-dup candidates: top-`k` most-cosine-similar pairs
    * among LSH-bucket collisions (pairs sharing a bucket). At scale the
    * bucket join replaces the quadratic all-pairs; increasing `planes`
    * tightens buckets. */
  def nearDupPairs(embeddings: DataFrame, idCol: String, embCol: String,
                   k: Int, dim: Int = 64, planes: Int = 4): DataFrame = {
    val withBucket = embeddings.select(col(idCol).as("vid"),
        quantize(col(embCol)).as("qe"))
      .withColumn("n2", dotQ(col("qe"), col("qe")))
      .withColumn("bucket", lshBucket(col("qe"), dim, planes))
    withBucket.as("a").join(withBucket.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        cosineQNormed(col("a.qe"), col("b.qe"), col("a.n2"), col("b.n2")).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }
}
