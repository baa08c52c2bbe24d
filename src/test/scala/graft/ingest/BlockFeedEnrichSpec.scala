package graft.ingest

import java.util.concurrent.ConcurrentHashMap

import graft.SparkSpec
import graft.ingest.BlockFeed.{BlockHeader, FeedRow}

/** Probe object: static so executor closures don't capture the spec. */
object EnrichProbe {
  val itemFetches = ConcurrentHashMap.newKeySet[Long]()
  val specialFetches = ConcurrentHashMap.newKeySet[Long]()
  @volatile var maxGroup = 0
  def reset(): Unit = { itemFetches.clear(); specialFetches.clear(); maxGroup = 0 }

  val fetchItems: Seq[BlockHeader] => Seq[FeedRow] = { hs =>
    maxGroup = math.max(maxGroup, hs.size)
    hs.foreach(h => itemFetches.add(h.height))
    hs.flatMap(h => (0 until h.transaction_count).map(i =>
      FeedRow(h.height, i, h.block_hash, h.block_time_ms,
        s"""{"k":${h.height}}""", is_special = false, sender = Some(h.height),
        affected_accounts = Seq(h.height), affected_contracts = Nil,
        cis2_events = Nil, key_bindings = None)))
  }
  val fetchSpecial: Seq[BlockHeader] => Seq[FeedRow] = { hs =>
    hs.foreach(h => specialFetches.add(h.height))
    hs.map(h => FeedRow(h.height, 1000, h.block_hash, h.block_time_ms,
      s"""{"s":${h.height}}""", is_special = true, sender = None,
      affected_accounts = Seq(99L), affected_contracts = Nil,
      cis2_events = Nil, key_bindings = None))
  }
}

class BlockFeedEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("enrichment skips the item fetch for empty blocks but not specials") {
    EnrichProbe.reset()
    // heights 0..19; even heights are empty (transaction_count 0)
    val headers = (0L until 20L).map(h =>
      BlockHeader(h, s"h$h", 1000 * h, if (h % 2 == 0) 0 else 2)).toDS()

    val feed = BlockFeed.enrich(headers,
      EnrichProbe.fetchItems, EnrichProbe.fetchSpecial, maxParallel = 4)
    val rows = feed.collect()

    // item fetch saw ONLY the 10 non-empty blocks (main.rs:796-798 skip)
    import scala.jdk.CollectionConverters._
    assert(EnrichProbe.itemFetches.asScala == (1L until 20L by 2).toSet)
    // special fetch saw every block
    assert(EnrichProbe.specialFetches.asScala == (0L until 20L).toSet)
    assert(EnrichProbe.maxGroup <= 4)

    // 10 non-empty blocks × 2 items + 20 specials
    assert(rows.length == 10 * 2 + 20)

    // the enriched rows feed the normal ingest derivations
    val summaries = BlockIngest.summaries(feed.toDF()).collect()
    assert(summaries.length == rows.length)
    assert(summaries.forall(r => r.getAs[String]("summary").startsWith("{\"Left\":")
      || r.getAs[String]("summary").startsWith("{\"Right\":")))
  }
}
