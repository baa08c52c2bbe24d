package graft

/** Pins the driver contract itself: the flagship `entry` must return
  * rows (the driver's first smoke check — a regression here fails the
  * round before any correctness row runs), and every declared query
  * must carry its oracle (a key typo on either side would silently
  * demote the row to the weaker rows-only check instead of failing
  * loudly here).
  */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every declared query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
  }

  test("declared names stay inside the bench-line alphabet") {
    // Bench's hand-rolled JSON escaper only quotes; names with quotes,
    // backslashes, or control chars would corrupt the driver's line.
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"query name '$n' needs escaping")
    }
  }
}
