package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** The STREAMING tier of the domain-level quality gate
  * ([[graft.ext.Curation.domainStats]] is the batch rollup): per-host
  * page-verdict counts accumulate across micro-batches via
  * `mapGroupsWithState`, so a live crawl maintains each domain's
  * running reputation — and the gate verdict reflects EVERYTHING ever
  * seen from the host, not just the current trigger's pages. Crawl
  * schedulers consume the emitted stream to throttle or drop domains
  * whose pass rate decays mid-crawl.
  *
  * State per host is the (n_docs, n_ok) pair — uniform, bounded (one
  * entry per live domain, two longs each), no timeout: reputation
  * never expires by itself. Emits one updated row per TOUCHED host per
  * micro-batch (update-mode semantics, [[SupplyStream]]'s contract).
  * Verdict thresholds mirror the batch gate: volume floor AND
  * parts-per-thousand pass-rate floor.
  */
object DomainReputation {

  case class PageVerdict(host: String, ok: Boolean)
  case class DomainCounts(n_docs: Long, n_ok: Long)
  case class Reputation(host: String, n_docs: Long, n_ok: Long,
                        ok_pm: Long, domain_ok: Boolean)

  def running(pages: Dataset[PageVerdict], minDocs: Long = 1,
              minOkPm: Long = 700): Dataset[Reputation] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[Reputation]
    implicit val stateEnc = Encoders.product[DomainCounts]
    // mapGroupsWithState, not flatMap: exactly one row per touched
    // host per trigger IS the map variant's contract (update-mode
    // implied — one less knob to drift from the sink's output mode)
    pages
      .groupByKey(_.host)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[PageVerdict],
         state: GroupState[DomainCounts]) =>
          val cur = state.getOption.getOrElse(DomainCounts(0L, 0L))
          val next = rows.foldLeft(cur) { (acc, p) =>
            DomainCounts(acc.n_docs + 1, acc.n_ok + (if (p.ok) 1 else 0))
          }
          state.update(next)
          val okPm = next.n_ok * 1000 / next.n_docs
          Reputation(host, next.n_docs, next.n_ok, okPm,
            next.n_docs >= minDocs && okPm >= minOkPm)
      }
  }
}
