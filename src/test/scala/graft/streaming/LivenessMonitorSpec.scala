package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{Row, SaveMode}

import graft.SparkSpec
import graft.model.Schemas

class LivenessMonitorSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("flags a stalled query after maxBehind; data clears it, empty batches don't") {
    var now = 0L
    val m = new LivenessMonitor(240, () => now)
    val id = UUID.randomUUID()
    m.recordStart(id, now)

    now = 239 * 1000L
    assert(!m.isBehind(id)) // inside the cutoff
    now = 241 * 1000L
    assert(m.isBehind(id)) // stalled since start — reference errors here
    assert(m.behindQueries == Set(id))

    m.recordProgress(id, 5, now)
    assert(!m.isBehind(id)) // a data batch resets the clock

    now += 241 * 1000L
    m.recordProgress(id, 0, now) // empty trigger = still behind
    assert(m.isBehind(id))

    m.recordStop(id)
    assert(m.tracked.isEmpty && !m.isBehind(id))
  }

  test("a straggling progress event after termination cannot resurrect the query") {
    var now = 0L
    val m = new LivenessMonitor(240, () => now)
    val id = UUID.randomUUID()
    m.recordStart(id, now)
    m.recordStop(id)
    assert(!m.sawData(id))

    // listener events are async: a data-carrying progress event can be
    // delivered after the termination event. It must not re-track the
    // query, but its data still counts toward the final sawData flag.
    m.recordProgress(id, 4, now)
    assert(m.tracked.isEmpty && m.behindQueries.isEmpty)
    assert(m.sawData(id))

    // a checkpoint restart reuses the query id: start re-tracks it as a
    // fresh incarnation with no data seen yet
    m.recordStart(id, now)
    assert(m.tracked == Set(id))
    assert(!m.sawData(id))
    now = 241 * 1000L
    assert(m.isBehind(id)) // and the liveness clock runs for it again
  }

  test("attached to a real query: tracks it and is not behind after data") {
    val root = Files.createTempDirectory("graft-live").toString
    val feedDir = s"$root/feed"
    val url = s"jdbc:derby:$root/db;create=true"
    Migrations.migrate(url, Dialect.Derby)

    val rows = Seq(
      Row(0L, 0, "h0", 0L, """{"k":0}""", false, 0L,
        Seq(0L, 1L), Seq.empty[Row], Seq.empty[Row], null))
    spark.createDataFrame(rows.asJava,
        Schemas.blockFeed(org.apache.spark.sql.types.LongType))
      .write.mode(SaveMode.Append).parquet(feedDir)

    val m = new LivenessMonitor(3600)
    spark.streams.addListener(m)
    try {
      val q = BlockStreamPipeline.start(spark, feedDir, s"$root/ckpt", url,
        Dialect.Derby, availableNow = true)
      q.awaitTermination(120000)
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis + 30000
      while (!m.sawData(q.id) && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(m.sawData(q.id))
      assert(!m.isBehind(q.id))
    } finally spark.streams.removeListener(m)
  }
}
