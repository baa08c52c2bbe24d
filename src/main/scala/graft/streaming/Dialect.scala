package graft.streaming

/** Minimal SQL dialect abstraction for the serving sink: the reference
  * targets Postgres (wallet-proxy-indexer/src/postgres.rs); tests here
  * run embedded Derby (in /opt/spark/jars). Only the type names and the
  * conditional-insert formulation differ — the write protocol
  * ([[TransactionalSink]]) is dialect-independent.
  */
sealed trait Dialect {
  def textType: String
  def boolType: String
  /** A one-row dummy FROM clause for `INSERT … SELECT ? WHERE NOT
    * EXISTS` conditional inserts. */
  def dummyFrom: String

  /** Dialect-native "insert the row unless its key already exists".
    * Returns the SQL plus whether the key columns must be bound a
    * SECOND time after the value placeholders (the portable
    * `WHERE NOT EXISTS` formulation repeats them; `ON CONFLICT DO
    * NOTHING` does not). Both shapes report update count 0 for a
    * duplicate, so `executeBatch` counts drive idempotent replay
    * identically. */
  def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Boolean)
}

object Dialect {
  case object Derby extends Dialect {
    val textType = "VARCHAR(32672)"
    val boolType = "BOOLEAN"
    val dummyFrom = "FROM SYSIBM.SYSDUMMY1"
    def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Boolean) = (
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |SELECT ${cols.map(_ => "?").mkString(", ")} $dummyFrom
         |WHERE NOT EXISTS (SELECT 1 FROM $table WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")})""".stripMargin,
      true)
  }
  case object Postgres extends Dialect {
    val textType = "TEXT"
    val boolType = "BOOLEAN"
    val dummyFrom = ""
    // Atomic under concurrency — no NOT-EXISTS race, no PK-violation
    // path (postgres.rs's ON CONFLICT upserts are the reference shape).
    def insertIgnore(table: String, cols: Seq[String], keys: Seq[String]): (String, Boolean) = (
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${keys.mkString(", ")}) DO NOTHING""".stripMargin,
      false)
  }
}
