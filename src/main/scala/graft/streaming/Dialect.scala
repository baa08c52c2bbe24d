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
}

object Dialect {
  case object Derby extends Dialect {
    val textType = "VARCHAR(32672)"
    val boolType = "BOOLEAN"
    val dummyFrom = "FROM SYSIBM.SYSDUMMY1"
  }
  case object Postgres extends Dialect {
    val textType = "TEXT"
    val boolType = "BOOLEAN"
    val dummyFrom = ""
  }
}
