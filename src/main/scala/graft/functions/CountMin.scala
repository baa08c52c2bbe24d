package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{element_at, least, lit}

/** Count-Min sketch — mergeable frequency estimation (heavy hitters
  * over tokens / domains / users) in O(depth × width) bounded state.
  *
  * Like [[KMV]], the standard library sketch (Spark's
  * `count_min_sketch`) has an engine-specific layout that an external
  * oracle can never reproduce. This one is fully DETERMINISTIC and
  * portable: the cell for key `x` in row `r` is
  * `hash60(md5(r + ":" + x)) % width` — the corpus-wide md5 convention
  * ([[SimHashUtil.hash60]]), so DuckDB recomputes the IDENTICAL
  * counters from `CAST(('0x'||substr(md5(r||':'||x),1,15)) AS BIGINT)
  * % width` and point estimates hash-match exactly.
  *
  * The buffer is one long[depth*width] updated in place (+1 per row per
  * input; Spark only runs the encoder at partial-aggregation shuffle
  * boundaries), and merge is elementwise add — associative and
  * commutative, so map-side partial aggregation applies on any
  * partitioning: at 100 TB each task folds its partition into one
  * depth×width array and the shuffle moves sketches, never keys. The
  * classic guarantee: est ≥ true, est ≤ true + ε·N with prob 1-δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  */
object CountMin {

  /** Cell index of `key` in sketch row `row` — the Scala spelling of
    * the oracle's md5 expression; also usable at PLAN TIME for literal
    * probe keys (the declared query bakes the probed cells into the
    * projection as constants). */
  def cell(row: Int, key: String, width: Int): Int =
    (SimHashUtil.hash60(s"$row:$key".getBytes("UTF-8")) % width).toInt

  final class Sketch(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && width >= 1, "depth and width must be positive")

    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], key: String): Array[Long] = {
      // NULL keys count nowhere — the oracle's md5(r || ':' || key)
      // concat is NULL for a null key and lands in no cell; Scala
      // string interpolation would have counted the literal "null"
      if (key == null) return b
      var r = 0
      while (r < depth) { b(r * width + cell(r, key, width)) += 1L; r += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column aggregate: `df.agg(CountMin.sketch(keyCol, 4, 256))` →
    * array<bigint> of depth×width counters (row-major). */
  def sketch(key: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.functions.udaf(new Sketch(depth, width)).apply(key)

  /** Point estimate of a LITERAL key from a sketch column: min over
    * rows of the key's cells. The cell indices are computed at plan
    * time ([[cell]] is deterministic), so the probe is a handful of
    * `element_at`s + `least` — pure codegen projection, no re-hashing
    * at run time. */
  def estimate(sketchCol: Column, key: String, depth: Int, width: Int): Column = {
    val cells = (0 until depth).map { r =>
      element_at(sketchCol, lit(r * width + cell(r, key, width) + 1))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
