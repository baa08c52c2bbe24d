package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  test("Derby insertIgnore uses WHERE NOT EXISTS with re-bound keys") {
    val (sql, rebind) = Dialect.Derby.insertIgnore("ati",
      Seq("account", "summary"), Seq("account", "summary"))
    assert(rebind)
    assert(sql.contains("SELECT ?, ? FROM SYSIBM.SYSDUMMY1"))
    assert(sql.contains("WHERE NOT EXISTS (SELECT 1 FROM ati WHERE account = ? AND summary = ?)"))
  }

  test("Postgres insertIgnore uses ON CONFLICT DO NOTHING, bound once") {
    val (sql, rebind) = Dialect.Postgres.insertIgnore("cis2_deltas",
      Seq("summary", "seq", "idx", "subidx", "token_id", "delta"),
      Seq("summary", "seq"))
    assert(!rebind)
    assert(sql.contains("VALUES (?, ?, ?, ?, ?, ?)"))
    assert(sql.contains("ON CONFLICT (summary, seq) DO NOTHING"))
    assert(!sql.contains("SYSDUMMY1"))
  }
}
