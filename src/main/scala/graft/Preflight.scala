package graft

import org.apache.spark.sql.SparkSession

/** Testdata-drift canary (VERDICT r10 §next 4). Round 10 was killed by a
  * silent upstream change — the driver regenerated `events.parquet` with
  * `ts` as timestamp[us] where every prior generation used
  * TIMESTAMP(NANOS) — and the engine's answer was 42 identical analysis
  * exceptions scattered through a bench sweep instead of one loud line.
  * This check reads ONLY parquet footers (no data scan) and compares every
  * driver table's columns against the expected inventory, reporting each
  * drift as an explicit `testdata schema changed: <table>.<col> <seen> vs
  * <expected>` string.
  *
  * It reports rather than throws: a drifted column must not abort the
  * queries that never touch it (the r10 failure mode in reverse — 63 of
  * 105 queries were healthy and still ran). Callers print the warnings
  * up front; any query genuinely broken by the drift then errors with the
  * cause already on record.
  */
object Preflight {
  /** column → acceptable Spark simpleString dtypes. Timestamp-like columns
    * accept every encoding the driver generator has actually emitted across
    * rounds (legacy int64 nanos read as bigint under nanosAsLong,
    * timestamp, timestamp_ntz); [[Tables]] normalizes them. */
  private val expected: Map[String, Seq[(String, Set[String])]] = {
    val ts = Set("timestamp", "timestamp_ntz", "bigint", "date")
    Map(
      "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> ts),
      "events" -> Seq("event_id" -> Set("bigint"), "ts" -> ts,
        "user_id" -> Set("bigint"), "event_type" -> Set("string"),
        "value" -> Set("double"), "props" -> Set("string")),
      "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Seq("vec_id" -> Set("bigint"),
        "embedding" -> Set("array<float>"), "label" -> Set("int")))
  }

  /** Number of driver tables under watch (spec convenience). */
  def tableCount: Int = expected.size

  /** All drift warnings for the tables under `sfDir`; empty = no drift.
    * Read-only in effect as well as intent: the nanosAsLong flag the
    * footer reads need (the canary must observe the RAW scan encoding —
    * routing through Tables.events would hide exactly the drift it
    * exists to catch) is restored to its prior value afterwards, so a
    * diagnostic never changes read semantics for anything after it
    * (ADVICE r11). */
  def check(spark: SparkSession, sfDir: String): Seq[String] = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val seen = spark.read.parquet(s"$sfDir/$table.parquet")
          .schema.map(f => f.name -> f.dataType.simpleString).toMap
        val missing = cols.collect { case (c, _) if !seen.contains(c) =>
          s"testdata schema changed: $table.$c missing (expected one of " +
            s"${cols.toMap.apply(c).mkString("/")})" }
        val drifted = cols.collect {
          case (c, ok) if seen.contains(c) && !ok.contains(seen(c)) =>
            s"testdata schema changed: $table.$c ${seen(c)} vs " +
              s"expected ${ok.mkString("/")}" }
        missing ++ drifted
      } catch {
        case e: Throwable => Seq(s"testdata schema changed: $table unreadable " +
          s"at $sfDir (${Option(e.getMessage).getOrElse(e.getClass.getName).take(60)})")
      }
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
