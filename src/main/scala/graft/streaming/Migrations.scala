package graft.streaming

import java.sql.{Connection, DriverManager}

/** Versioned schema migrations for the serving database — the analog of
  * the reference's migrations ledger (migrations.rs:38-62, 211-258):
  * a `migrations` table records applied versions; [[migrate]] applies
  * every step above the current version, one transaction per step.
  */
object Migrations {

  /** DDL per schema version (reference m0001/m0002 analogs, flattened to
    * the five serving tables; SURVEY §1.2). Deterministic ids from the
    * engine replace SERIAL keys. */
  def steps(d: Dialect): Seq[(Int, String, Seq[String])] = Seq(
    (1, "initial schema", Seq(
      s"""CREATE TABLE summaries (
         |  id BIGINT NOT NULL PRIMARY KEY,
         |  block VARCHAR(64) NOT NULL,
         |  ts BIGINT NOT NULL,
         |  height BIGINT NOT NULL,
         |  summary ${d.textType} NOT NULL)""".stripMargin,
      """CREATE TABLE ati (
         |  account BIGINT NOT NULL,
         |  summary BIGINT NOT NULL,
         |  PRIMARY KEY (account, summary))""".stripMargin,
      """CREATE TABLE cti (
         |  idx BIGINT NOT NULL,
         |  subidx BIGINT NOT NULL,
         |  summary BIGINT NOT NULL,
         |  PRIMARY KEY (idx, subidx, summary))""".stripMargin,
      """CREATE TABLE cis2_deltas (
         |  summary BIGINT NOT NULL,
         |  seq INT NOT NULL,
         |  idx BIGINT NOT NULL,
         |  subidx BIGINT NOT NULL,
         |  token_id VARCHAR(256) NOT NULL,
         |  delta VARCHAR(100) NOT NULL,
         |  PRIMARY KEY (summary, seq))""".stripMargin,
      """CREATE TABLE cis2_tokens (
         |  idx BIGINT NOT NULL,
         |  subidx BIGINT NOT NULL,
         |  token_id VARCHAR(256) NOT NULL,
         |  total_supply VARCHAR(100) NOT NULL,
         |  PRIMARY KEY (idx, subidx, token_id))""".stripMargin)),
    (2, "account public key bindings", Seq(
      s"""CREATE TABLE bindings (
         |  address BIGINT NOT NULL,
         |  src_id BIGINT NOT NULL,
         |  credential_index INT NOT NULL,
         |  key_index INT NOT NULL,
         |  public_key VARCHAR(256) NOT NULL,
         |  is_simple_account ${d.boolType} NOT NULL,
         |  PRIMARY KEY (address, src_id, credential_index, key_index))""".stripMargin)),
    (3, "covering indexes for range queries", Seq(
      "CREATE INDEX idx_summaries_height ON summaries (height)",
      "CREATE INDEX idx_summaries_ts ON summaries (ts)",
      "CREATE INDEX idx_bindings_pk ON bindings (public_key)"))
  )

  def connect(url: String): Connection = DriverManager.getConnection(url)

  /** Current schema version (B8 analog: MAX(version)); 0 if the ledger
    * doesn't exist yet (B9 existence probe). */
  def currentVersion(c: Connection): Int = {
    val tables = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    var exists = false
    while (tables.next())
      if (tables.getString("TABLE_NAME").equalsIgnoreCase("migrations")) exists = true
    if (!exists) return 0
    val rs = c.createStatement().executeQuery("SELECT MAX(version) FROM migrations")
    if (rs.next()) rs.getInt(1) else 0
  }

  /** Apply all pending migration steps; one transaction per step,
    * recorded in the ledger (migrations.rs:171-207). Idempotent. */
  def migrate(url: String, dialect: Dialect): Unit = {
    val c = connect(url)
    try {
      c.setAutoCommit(false)
      if (currentVersion(c) == 0) {
        c.createStatement().execute(
          """CREATE TABLE migrations (
            |  version INT NOT NULL PRIMARY KEY,
            |  description VARCHAR(200) NOT NULL,
            |  applied_at TIMESTAMP NOT NULL)""".stripMargin)
        c.commit()
      }
      val cur = currentVersion(c)
      steps(dialect).filter(_._1 > cur).foreach { case (v, desc, ddls) =>
        ddls.foreach(c.createStatement().execute(_))
        val ps = c.prepareStatement(
          "INSERT INTO migrations (version, description, applied_at) VALUES (?, ?, CURRENT_TIMESTAMP)")
        ps.setInt(1, v); ps.setString(2, desc); ps.executeUpdate()
        c.commit()
      }
    } finally c.close()
  }
}
