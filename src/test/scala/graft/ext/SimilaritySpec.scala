package graft.ext

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    Seq(
      (0L, base),
      (1L, base.map(x => x * 2.0f)),          // same direction → cosine 1
      (2L, base.map(x => -x)),                // opposite → cosine -1
      (3L, Array.fill(8)(rnd.nextFloat() * 2 - 1)),
      (4L, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    ).toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks scaled copy first, negation last") {
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 1L)
    assert(out.head._2 > 0.999999)
    assert(out.last._1 == 2L)
    assert(out.last._2 < -0.999999)
  }

  test("LSH ANN results are a subset of brute-force with same scores") {
    val bf = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.annLsh(vecs, "vec_id", "embedding", 0L, 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(lsh.nonEmpty) // same-direction copy always shares the bucket
    lsh.foreach { case (id, c) => assert(bf(id) == c) }
    assert(lsh.map(_._1).contains(1L))
  }

  test("near-dup pairs finds the colinear pair with cosine ~1") {
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding", k = 5, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val top = out.head
    assert((top._1, top._2) == (0L, 1L))
    assert(top._3 > 0.999999)
  }
}
