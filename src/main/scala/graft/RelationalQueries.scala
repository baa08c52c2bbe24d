package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** General relational coverage over the TPC-H-ish testdata: aggregation,
  * multi-way joins (broadcast dims), rollup, set ops, semi/anti joins,
  * windows, sessionization, as-of enrichment. These are the bench
  * headliners; each has a DuckDB oracle.
  *
  * Float discipline: every SUM over doubles casts each addend to
  * DECIMAL(18,4) first — decimal addition is exact and associative, so
  * Spark's parallel partial aggregation and DuckDB's sequential sum give
  * bit-identical results (a raw double sum would differ in the low bits
  * depending on partitioning). Per-row double arithmetic (price *
  * (1-discount)) is IEEE-deterministic and identical in both engines.
  */
object RelationalQueries {

  private val Dec = "decimal(18,4)"
  private type Q = (SparkSession, String) => DataFrame

  // Exact-decimal arithmetic: inputs are 2-decimal values stored as
  // doubles; casting each input to decimal first makes every product
  // exact in both engines (double products would differ in the last
  // ulp between engines and accumulate across rows).
  private def price2 = col("l_extendedprice").cast("decimal(12,2)")
  private def disc1m = lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")
  private def tax1p = lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")
  private def revenue = price2 * disc1m

  val queries: Map[String, Q] = Map(
    "qj" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          sum(revenue * tax1p).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "qk" -> ((s, d) => {
      val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).where(col("o_orderdate") < lit("1998-03-15"))
      val li = Tables.lineitem(s, d).where(col("l_shipdate") > lit("1998-03-15"))
      li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenue).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "qx" -> ((s, d) => {
      // TPC-H Q10 shape: revenue lost to returned items, per customer.
      // The only big shuffle is lineitem⋈orders on orderkey; customer is
      // broadcast after its own nation-dim broadcast.
      val li = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(revenue).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    "qp" -> ((s, d) => {
      // dims (region→nation→customer) broadcast down the join chain; the
      // only shuffle joins lineitem⋈orders on orderkey.
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      val li = Tables.lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // Correlated SCALAR subquery (the TPC-H Q2 shape): Catalyst
    // decorrelates it into an aggregate + join, not a per-row probe —
    // the SQL is deliberately written subquery-style to pin that path.
    "qn" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_corr")
      s.sql("""
        SELECT l_partkey, l_orderkey, l_extendedprice
        FROM li_corr l1
        WHERE l_extendedprice = (SELECT min(l_extendedprice)
                                 FROM li_corr l2
                                 WHERE l2.l_partkey = l1.l_partkey)
        ORDER BY l_partkey, l_orderkey""")
    }),

    // Correlated EXISTS (the TPC-H Q4 shape) → decorrelated semi join
    // under an aggregation.
    "qd" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("ord_corr")
      Tables.lineitem(s, d).createOrReplaceTempView("li_corr2")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM ord_corr o
        WHERE EXISTS (SELECT 1 FROM li_corr2 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_discount > 0.05)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }),

    "ql" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast(Dec)).cast("double").as("total"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    "qa" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "qe" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "qi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val y96 = o.where(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.where(year(col("o_orderdate")) === 1997).select("o_custkey")
      y96.intersect(y97).orderBy("o_custkey")
    }),

    "qw" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(Dec)).over(w).cast("double").as("running"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "qr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          sum(col("l_quantity").cast(Dec)).cast("double").as("qty"))
        .orderBy("p_brand")),

    "qo" -> ((s, d) => {
      // point-in-time: each event gets the customer's most recent order
      // as of the event time. Orders deduped to one per (custkey, date)
      // so the match is unique in both engines.
      val ordersD = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      AsOfJoin(
        left = Tables.events(s, d).select("event_id", "user_id", "ts"),
        right = ordersD,
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"),
        payload = Seq(col("o_orderkey").as("last_orderkey")),
        tiebreak = col("o_orderkey"))
        .select("event_id", "user_id", "last_orderkey")
        .orderBy("event_id")
    }),

    // The per-user lag/running-sum windows here (and in qsc2 /
    // q_funnel) are inherently sequential per key — unlike the
    // occurrence COUNTS reformulated as partial aggregates (Curation/
    // TextAnalysis), gap detection cannot pre-combine map-side. The
    // bound is one user's event count; a pathological hot user at
    // 100 TB needs a time-bounded pre-split (sessionize per day, then
    // stitch boundary sessions), which changes semantics and is a
    // caller decision, not a default.
    "qs" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ms").isNull ||
            unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("first_event"), max("event_id").as("last_event"))
        .orderBy("user_id", "session_id")
    }),

    "qu" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
        .orderBy("day")),

    // SCD2 history from a change feed: every event opens a validity
    // interval the NEXT event of the same key closes (null = current) —
    // the slowly-changing-dimension shape a warehouse derives from CDC.
    // One user-keyed window; millisecond longs out (engine-portable).
    "qz" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("valid_from_ms").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("valid_from_ms"))
        .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(byUser))
        .orderBy("user_id", "valid_from_ms", "event_id")
    }),

    // Ordered conversion funnel: first view, first click strictly after
    // it, first purchase strictly after that, per user — stage counts.
    // Three dependent full-partition windows share ONE user-keyed
    // exchange, then a per-user fold and a tiny final aggregate.
    "qf" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
      val staged = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("v_ms",
          min(when(col("event_type") === "view", col("ms"))).over(byUser))
        .withColumn("c_ms",
          min(when(col("event_type") === "click" && col("ms") > col("v_ms"),
            col("ms"))).over(byUser))
        .withColumn("p_ms",
          min(when(col("event_type") === "purchase" && col("ms") > col("c_ms"),
            col("ms"))).over(byUser))
      staged.groupBy("user_id")
        .agg(max("v_ms").as("v"), max("c_ms").as("c"), max("p_ms").as("p"))
        .agg(sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
        .select(explode(array(
          struct(lit("1_view").as("stage"), col("n_view").as("n_users")),
          struct(lit("2_click").as("stage"), col("n_click").as("n_users")),
          struct(lit("3_purchase").as("stage"),
            col("n_purchase").as("n_users")))).as("s"))
        .select("s.stage", "s.n_users")
        .orderBy("stage")
    }),

    // the SCALE path for quantiles: q_median's exact row_number walk
    // shuffles every row into per-key sorted windows; the histogram
    // needs one uniform (key,bin) partial-agg shuffle and then windows
    // over ≤256 rows per key, at binWidth-bounded error
    "qh" -> ((s, d) =>
      graft.operators.HistogramQuantile.quantiles(Tables.events(s, d),
          col("event_type"), round(col("value") * 100), binWidth = 128,
          pcts = Seq(50, 90, 99))
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")),

    "qm" -> ((s, d) => {
      // exact lower median, spelled out (row_number + count) so both
      // engines agree bit-for-bit — built-in percentile/quantile
      // functions interpolate with engine-specific semantics. The value
      // emitted is a stored double, never a computed one.
      val byVal = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val whole = Window.partitionBy("event_type")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(byVal))
        .withColumn("cnt", count(lit(1)).over(whole))
        .where(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col("value").as("median_value"))
        .orderBy("event_type")
    }),

    "qc" -> ((s, d) =>
      // full cube over (type, day): every subtotal combination in one
      // pass (Expand + single aggregation). Null group keys are
      // relabeled '(all)' so ordering is engine-independent.
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")).cast("string"))
        .cube("event_type", "day")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dec)).cast("double").as("sum_value"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("day"), lit("(all)")).as("day"),
          col("n"), col("sum_value"))
        .orderBy("event_type", "day")),

    "qv" -> ((s, d) =>
      // wide daily counts per event type: pivot with an explicit value
      // list (no extra distinct pass; stable output schema).
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("day")),

    "qg" -> ((s, d) => {
      // banded point-in-interval join: each user's events inside their
      // first-3-days window, joined on (user, day-bucket) — uniform
      // shuffle keys, no theta join (operators.RangeJoin).
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      val firsts = ev.groupBy(col("user_id").as("f_user"))
        .agg(min("ts_ms").as("start_ms"))
        .withColumn("end_ms", col("start_ms") + lit(3L * 86400000L))
      graft.operators.RangeJoin.pointInInterval(ev, firsts,
          Seq("user_id" -> "f_user"),
          col("ts_ms"), col("start_ms"), col("end_ms"),
          bucketWidth = 86400000L)
        .groupBy("user_id").agg(count(lit(1)).as("n_early_events"))
        .orderBy("user_id")
    }),

    "qt" -> ((s, d) => {
      // events.event_type has ~5 values — the canonical skewed join key:
      // an unsalted shuffle join sends every 'view' row to one reducer.
      // SaltedJoin spreads each type over 8 sub-keys (deterministic salt
      // from event_id); results are exactly the plain join's.
      val ev = Tables.events(s, d)
      val dim = ev.groupBy("event_type").agg(min("event_id").as("type_first"))
      graft.operators.SaltedJoin.join(ev, dim, "event_type",
          col("event_id"), factor = 8)
        .groupBy("event_type", "type_first")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dec)).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    "qb" -> ((s, d) => {
      // runtime-filter semi join: events of users who ever signed up.
      // The bloom pre-filter drops non-signup users' rows before the
      // exact semi join's shuffle; the result is row-identical to the
      // plain semi join (which is what the oracle computes). The filter
      // is SIZED FROM THE DATA (KMV NDV estimate of the dim side, not a
      // hardcoded guess that silently degrades to pass-through at 100x
      // the assumed dim); dim is persisted because sized() passes over
      // it twice (NDV sketch, then bloom build) and its derivation
      // scans events.
      val ev = Tables.events(s, d)
      val dim = graft.CacheScope.persistTracked(
        ev.where(col("event_type") === "signup")
          .select(col("user_id").as("uid")).distinct())
      graft.operators.BloomSemiJoin.sized(ev, col("user_id"), dim,
          col("uid"), fpp = 0.01)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy("user_id")
    })
  )

  private val dec = "DECIMAL(18,4)"
  private def rev =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val oracles: Map[String, String] = Map(
    "qj" -> s"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS $dec)) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS $dec)) AS DOUBLE) AS sum_base_price,
       CAST(SUM($rev) AS DOUBLE) AS sum_disc_price,
       CAST(SUM($rev * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "qk" -> s"""
SELECT l_orderkey, SUM($rev) AS revenue, o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "qx" -> s"""
SELECT c_custkey, c_name, SUM($rev) AS revenue, c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "qp" -> s"""
SELECT n_name, SUM($rev) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "qn" -> """
SELECT l_partkey, l_orderkey, l_extendedprice
FROM lineitem l1
WHERE l_extendedprice = (SELECT min(l_extendedprice)
                         FROM lineitem l2
                         WHERE l2.l_partkey = l1.l_partkey)
ORDER BY l_partkey, l_orderkey""",

    "qd" -> """
SELECT o_orderpriority, count(*) AS n
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",

    "ql" -> """
SELECT r_name, n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "qa" -> """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey""",

    "qe" -> """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
ORDER BY c_custkey""",

    "qi" -> """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
ORDER BY o_custkey""",

    "qw" -> """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
FROM orders ORDER BY o_custkey, o_orderkey""",

    "qr" -> """
SELECT p_brand, count(DISTINCT l_suppkey) AS n_supp,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand""",

    "qo" -> """
WITH orders_d AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
FROM events e ASOF LEFT JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id""",

    "qs" -> """
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM sess GROUP BY 1, 2 ORDER BY 1, 2""",

    "qu" -> """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(DISTINCT user_id) AS users, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1""",

    "qz" -> """
SELECT user_id, event_id, event_type,
       epoch_ms(ts) AS valid_from_ms,
       lead(epoch_ms(ts)) OVER (PARTITION BY user_id
         ORDER BY epoch_ms(ts), event_id) AS valid_to_ms
FROM events ORDER BY user_id, valid_from_ms, event_id""",

    "qf" -> """
WITH s1 AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms,
         min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
           OVER (PARTITION BY user_id) AS v_ms
  FROM events
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ms > v_ms THEN ms END)
           OVER (PARTITION BY user_id) AS c_ms
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ms > c_ms THEN ms END)
           OVER (PARTITION BY user_id) AS p_ms
  FROM s2
), u AS (
  SELECT user_id, max(v_ms) AS v, max(c_ms) AS c, max(p_ms) AS p
  FROM s3 GROUP BY 1
), f AS (
  SELECT CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
  FROM u
)
SELECT stage, n_users FROM (
  SELECT '1_view' AS stage, n_view AS n_users FROM f
  UNION ALL SELECT '2_click', n_click FROM f
  UNION ALL SELECT '3_purchase', n_purchase FROM f
) ORDER BY stage""",

    "qt" -> s"""
WITH dim AS (SELECT event_type, min(event_id) AS type_first FROM events GROUP BY 1)
SELECT e.event_type, d.type_first, count(*) AS n,
       CAST(SUM(CAST(e.value AS $dec)) AS DOUBLE) AS sum_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY 1, 2 ORDER BY 1""",

    "qb" -> """
SELECT user_id, count(*) AS n
FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
GROUP BY 1 ORDER BY 1""",

    "qh" -> """
WITH b AS (
  SELECT event_type AS k,
         CAST(round(value * 100) AS BIGINT) // 128 AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
), c AS (
  SELECT k, bin,
         SUM(n) OVER (PARTITION BY k ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY k) AS total
  FROM b
)
SELECT k AS event_type,
       CAST((min(CASE WHEN cum * 100 >= total * 50 THEN bin END) + 1) * 128 AS BIGINT) AS p50_hi,
       CAST((min(CASE WHEN cum * 100 >= total * 90 THEN bin END) + 1) * 128 AS BIGINT) AS p90_hi,
       CAST((min(CASE WHEN cum * 100 >= total * 99 THEN bin END) + 1) * 128 AS BIGINT) AS p99_hi
FROM c GROUP BY 1 ORDER BY 1""",

    "qm" -> """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
)
SELECT event_type, value AS median_value
FROM r WHERE rn = (cnt + 1) // 2
ORDER BY event_type""",

    "qc" -> s"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, value
  FROM events
)
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(day, '(all)') AS day,
       count(*) AS n,
       CAST(SUM(CAST(value AS $dec)) AS DOUBLE) AS sum_value
FROM e GROUP BY CUBE (event_type, day)
ORDER BY 1, 2""",

    "qv" -> """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) FILTER (event_type = 'view') AS "view",
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY 1 ORDER BY 1""",

    "qg" -> """
WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
f AS (SELECT user_id AS f_user, min(ts_ms) AS start_ms FROM ev GROUP BY 1)
SELECT ev.user_id, count(*) AS n_early_events
FROM ev JOIN f ON ev.user_id = f.f_user
  AND ev.ts_ms >= f.start_ms AND ev.ts_ms < f.start_ms + 259200000
GROUP BY 1 ORDER BY 1"""
  )
}
