package graft

import java.nio.file.Files

/** The drift canary must (a) stay silent on the driver's actual current
  * testdata, and (b) name table.col + seen vs expected when an encoding
  * changes — the r10 failure produced 42 interchangeable analysis
  * exceptions and zero direct statements of the cause. */
class PreflightSpec extends SparkSpec {

  test("current driver testdata passes clean at every shipped SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(dir).isDirectory)
      val warnings = Preflight.check(spark, dir)
      assert(warnings.isEmpty, s"$sf: ${warnings.mkString("; ")}")
    }
  }

  test("a drifted column is reported as table.col seen vs expected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("preflight").toString
    // copy the real sf0.001 inventory, then sabotage documents.n_chars
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_chars", $"n_chars".cast("int"))
      .write.parquet(s"$dir/documents.parquet")
    val warnings = Preflight.check(spark, dir)
    assert(warnings.size === 1, warnings.mkString("; "))
    assert(warnings.head ===
      "testdata schema changed: documents.n_chars int vs expected bigint")
  }

  test("a missing table is reported, not thrown") {
    val dir = Files.createTempDirectory("preflight-empty").toString
    val warnings = Preflight.check(spark, dir)
    assert(warnings.size === Preflight.tableCount)
    assert(warnings.forall(_.contains("unreadable")))
  }

  test("check() restores nanosAsLong — a diagnostic must not mutate the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // default state before (getOption reports the default "false"): the
    // EFFECTIVE value must survive check(), even though the footer reads
    // need it true (ADVICE r11 — the canary was leaving the flag set,
    // changing read semantics for everything after it)
    spark.conf.unset(key)
    Preflight.check(spark, "/root/testdata/sf0.001")
    assert(spark.conf.get(key) === "false")
    // explicitly true before: stays true after
    spark.conf.set(key, "true")
    Preflight.check(spark, "/root/testdata/sf0.001")
    assert(spark.conf.get(key) === "true")
    spark.conf.unset(key)
  }
}
