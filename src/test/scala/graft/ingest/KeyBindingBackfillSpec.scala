package graft.ingest

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.ingest.KeyBindingBackfill.{AccountKey, AccountKeys, CredentialKeys}
import graft.streaming.{Dialect, Migrations}

/** Probe + fake node shared with executor closures (same JVM under
  * local[*]; the object is statically reachable, so the mapPartitions
  * closure serializes without dragging the spec instance along). */
object FetchProbe {
  val maxGroup = new AtomicInteger(0)
  val calls = new AtomicInteger(0)
  def reset(): Unit = { maxGroup.set(0); calls.set(0) }

  // Deterministic fake node: even addresses have 1 credential × 1 key
  // (simple), odd addresses 2 credentials with 1 and 2 keys (3 rows).
  val fakeFetch: Seq[Long] => Seq[AccountKeys] = { addrs =>
    calls.incrementAndGet()
    maxGroup.accumulateAndGet(addrs.size, math.max)
    addrs.map { a =>
      val nCreds = 1 + (a % 2).toInt
      AccountKeys(a, (0 until nCreds).map(c =>
        CredentialKeys(c, (0 to c).map(k => AccountKey(k, s"pk-$a-$c-$k")))))
    }
  }
}

class KeyBindingBackfillSpec extends SparkSpec {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-backfill").toString
  private val url = s"jdbc:derby:$root/db;create=true"

  private def q(sql: String): Seq[Seq[Any]] = {
    val c = Migrations.connect(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.Buffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally c.close()
  }

  test("backfill: bounded fan-out, double-explode flatten, batched idempotent insert") {
    Migrations.migrate(url, Dialect.Derby)
    FetchProbe.reset()

    val accounts = spark.range(123).as[Long].repartition(4)
    val infos = KeyBindingBackfill.enrich(accounts, FetchProbe.fakeFetch, concurrency = 10)

    // flatten shape: evens → 1 row (simple), odds → 3 rows (not simple)
    val rows = KeyBindingBackfill.bindingRows(infos).collect()
    assert(rows.length == 62 * 1 + 61 * 3)
    val r0 = rows.find(r => r.getAs[Long]("address") == 0L).get
    assert(r0.getAs[String]("public_key") == "pk-0-0-0")
    assert(r0.getAs[Boolean]("is_simple_account"))
    val odd = rows.filter(_.getAs[Long]("address") == 1L)
    assert(odd.length == 3 && odd.forall(!_.getAs[Boolean]("is_simple_account")))

    KeyBindingBackfill.run(infos, url, Dialect.Derby, batchSize = 50)
    // the fan-out respected the concurrency bound
    assert(FetchProbe.maxGroup.get <= 10 && FetchProbe.calls.get >= 13)
    assert(q("SELECT COUNT(*) FROM bindings").head.head == 62 + 61 * 3)
    assert(q("SELECT COUNT(*) FROM bindings WHERE src_id = 0").head.head == 62 + 61 * 3)

    // rerun is an exact no-op
    KeyBindingBackfill.run(infos, url, Dialect.Derby)
    assert(q("SELECT COUNT(*) FROM bindings").head.head == 62 + 61 * 3)

    // a stream-derived snapshot (src_id > 0) always wins over backfill:
    // simulate the stream having written address 7, then rerun backfill
    val c = Migrations.connect(url)
    try {
      c.createStatement().executeUpdate("DELETE FROM bindings WHERE address = 7")
      c.createStatement().executeUpdate(
        "INSERT INTO bindings VALUES (7, 9999, 0, 0, 'pk-stream', true)")
    } finally c.close()
    KeyBindingBackfill.run(infos, url, Dialect.Derby)
    val a7 = q("SELECT src_id, public_key FROM bindings WHERE address = 7")
    assert(a7 == Seq(Seq(9999L, "pk-stream")) ||
      a7.map(r => (r.head.asInstanceOf[Number].longValue(), r(1))) == Seq((9999L, "pk-stream")))
  }
}
