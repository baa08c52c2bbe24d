package graft.streaming

import java.util.UUID

import org.apache.spark.sql.streaming.StreamingQueryListener

/** A2 liveness monitoring — the Spark analog of the reference's
  * `max_behind` node-staleness cutoff: the reference hard-errors when no
  * finalized block arrives within `max_behind_seconds`
  * (`next_chunk_timeout`, lib.rs:432-447) so the service can fail over
  * to the next node endpoint (lib.rs:523-595).
  *
  * In Structured Streaming liveness is an observability concern, not a
  * watermark: this `StreamingQueryListener` tracks the last wall-clock
  * instant each query made progress WITH data (empty micro-batches do
  * not count — a trigger that read nothing is exactly the "node behind"
  * condition). Operators poll [[isBehind]]/[[behindQueries]] and decide
  * the response (alert, stop the query, switch sources) — the decision
  * loop stays outside the engine just as the reference's failover loop
  * wraps its node client.
  *
  * The clock is injectable for deterministic tests.
  */
final class LivenessMonitor(maxBehindSeconds: Long,
                            clock: () => Long = () => System.currentTimeMillis())
    extends StreamingQueryListener {

  private val lastAlive = new java.util.concurrent.ConcurrentHashMap[UUID, java.lang.Long]()
  private val dataSeen = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()
  // Bounded LRU of terminated queries' final sawData flag: a long-lived
  // driver that starts and stops many queries (restart loops,
  // availableNow batches) must not accumulate per-query entries forever,
  // but [[sawData]] stays answerable for recently-terminated queries
  // (listener events arrive asynchronously — a caller may only get to
  // ask after termination).
  private val recentStopped = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[UUID, java.lang.Boolean](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[UUID, java.lang.Boolean]): Boolean =
        size > 1024
    })

  /** A start for an id in the terminated LRU is a RESTART (Spark keeps
    * the query id stable across checkpoint restarts): drop the old
    * incarnation's record and track afresh. */
  private[streaming] def recordStart(id: UUID, atMs: Long): Unit = {
    recentStopped.remove(id)
    lastAlive.put(id, atMs)
  }

  /** Progress events are delivered asynchronously and can arrive after
    * the termination event; without the terminated-LRU guard such a
    * straggler would re-insert the id and permanently resurrect a dead
    * query in [[tracked]]/[[behindQueries]]. */
  private[streaming] def recordProgress(id: UUID, inputRows: Long, atMs: Long): Unit =
    if (inputRows > 0) {
      if (recentStopped.containsKey(id)) recentStopped.put(id, true)
      else { dataSeen.add(id); lastAlive.put(id, atMs) }
    }

  /** Termination moves the query's state out of the live maps into the
    * bounded terminated-query LRU. */
  private[streaming] def recordStop(id: UUID): Unit = {
    lastAlive.remove(id)
    recentStopped.put(id, dataSeen.remove(id))
  }

  /** Queries currently tracked (started, not terminated). */
  def tracked: Set[UUID] = {
    import scala.jdk.CollectionConverters._
    lastAlive.keySet.asScala.toSet
  }

  /** True iff the query ever completed a data-carrying micro-batch
    * (live queries, plus the most recent ~1024 terminated ones). */
  def sawData(id: UUID): Boolean =
    dataSeen.contains(id) ||
      Option(recentStopped.get(id)).exists(_.booleanValue)

  /** True iff the query is live and has gone longer than
    * `maxBehindSeconds` without a data-carrying micro-batch (measured
    * from start for a query that never produced one). */
  def isBehind(id: UUID): Boolean =
    Option(lastAlive.get(id)).exists(t => clock() - t > maxBehindSeconds * 1000L)

  def behindQueries: Set[UUID] = tracked.filter(isBehind)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    recordStart(e.id, clock())

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    recordProgress(e.progress.id, e.progress.numInputRows, clock())

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    recordStop(e.id)
}
