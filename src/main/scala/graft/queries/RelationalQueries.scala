package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational/analytic coverage over the TPC-H-ish star schema and the
  * events stream-analog table (SURVEY.md §2.10 right column): scan-heavy
  * aggregation, multi-way broadcast joins, and window-function
  * sessionization. */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: one scan, hash aggregate with
    * map-side partials — the canonical "does aggregation scale" probe. */
  val qTpchQ1 = Q(
    "q_tpch_q1",
    (s, dir) => Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // money-scale sums accumulate in DECIMAL(18,6): exact and
        // order-independent, so they hash-match the oracle at any SF
        // (double sums differ in the last ulp across engines, §7.5)
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Orders ⋈ customer ⋈ nation rollup to nation: the dimensions are
    * broadcast (no shuffle of the fact side beyond the final agg). */
  val qOrdersNation = Q(
    "q_orders_nation",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("revenue"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                          JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** Market-segment top spenders: join + window ranking (top-3 customers
    * by account balance per segment). */
  val qSegmentTop = Q(
    "q_segment_top",
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 6).as("bal"), col("rank"))
        .orderBy("c_mktsegment", "rank")
    },
    Some("""SELECT c_mktsegment, c_custkey, round(c_acctbal, 6) AS bal,
                   CAST(row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank
            FROM customer QUALIFY rank <= 3
            ORDER BY c_mktsegment, rank"""))

  /** Sessionization over events: a new session starts when a user's gap
    * from the previous event exceeds 30 min (lag window). Output: per
    * event_type, number of sessions started and events. The batch form
    * of the streaming state-machine (see graft.streaming). */
  val qSessionize = Q(
    "q_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("new_session").as("n_session_starts"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (SELECT event_type,
                   -- order by the MICROSECOND-truncated time + id, matching
                   -- the engine's converted frame: raw ns ordering could
                   -- disagree inside one microsecond and flip the lag
                   CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                             > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
            FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(new_session) AS BIGINT) AS n_session_starts
            FROM e GROUP BY event_type ORDER BY event_type"""))

  /** JSON extraction over events.props + filter + agg (§2.10 JSON fns). */
  val qEventsJson = Q(
    "q_events_json",
    (s, dir) => Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("k"), 6).as("avg_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 6) AS avg_k
            FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
            WHERE k IS NOT NULL GROUP BY event_type ORDER BY event_type"""))

  /** Exact interpolated percentiles per event type (Spark `percentile` ≡
    * DuckDB `quantile_cont`, both linear interpolation over the sorted
    * set — order-insensitive, so cross-engine-stable unlike sums). */
  val qEventPercentiles = Q(
    "q_event_percentiles",
    (s, dir) => Tables.events(s, dir)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        round(min("value"), 6).as("vmin"),
        round(max("value"), 6).as("vmax"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.95), 6) AS p95,
                   round(quantile_cont(value, 0.99), 6) AS p99,
                   round(min(value), 6) AS vmin,
                   round(max(value), 6) AS vmax
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** As-of join events→orders: each event picks up the user's latest
    * order at event time (graft.operators.AsofJoin, the union+window
    * formulation). Oracle: DuckDB's native ASOF LEFT JOIN — two utterly
    * different implementations agreeing on every aggregate. Right side
    * deduped to one order per (cust, date) (max orderkey) since ASOF tie
    * order is engine-defined. */
  val qAsofOrders = Q(
    "q_asof_orders",
    (s, dir) => {
      val l = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("user_id").as("cust"), unix_micros(col("ts")).as("t_us"))
      val r = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("cust"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("rt_us"))
        .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
        .select(col("cust"), col("rt_us"),
          col("m.o_orderkey").as("o_orderkey"), col("m.o_totalprice").as("o_totalprice"))
      val joined = graft.operators.AsofJoin.asof(
        l, r, key = "cust", leftTime = "t_us", rightTime = "rt_us",
        rightCols = Seq("o_orderkey", "o_totalprice"), rightTieBreak = "o_orderkey")
      joined.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double"), lit(0.0)).as("revenue"))
        .orderBy("event_type")
    },
    Some("""WITH l AS (SELECT event_id, event_type, user_id AS cust, epoch_us(ts) AS t_us FROM events),
            r AS (SELECT o_custkey AS cust, epoch_us(o_orderdate) AS rt_us,
                         max(o_orderkey) AS o_orderkey,
                         arg_max(o_totalprice, o_orderkey) AS o_totalprice
                  FROM orders GROUP BY 1, 2),
            j AS (SELECT l.event_type, r.o_orderkey, r.o_totalprice
                  FROM l ASOF LEFT JOIN r ON l.cust = r.cust AND r.rt_us <= l.t_us)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(o_orderkey) AS BIGINT) AS n_matched,
                   coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS revenue
            FROM j GROUP BY event_type ORDER BY event_type"""))

  /** TPC-H Q6-style: tight filter + single scalar sum — the predicate-
    * pushdown and scan-efficiency probe. */
  val qTpchQ6 = Q(
    "q_tpch_q6",
    (s, dir) => Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(coalesce(
        sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,6)")).cast("double"),
        lit(0.0)).as("revenue")),
    Some("""SELECT coalesce(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** TPC-H Q3-style: 3-way join, group, top-10 by revenue — the
    * join-order/broadcast probe. */
  val qTpchQ3 = Q(
    "q_tpch_q3",
    (s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).where(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_orderkey, odate
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** TPC-H Q5-style: six-table star join — regional supplier revenue
    * where the supplying and ordering nations coincide. Every dimension
    * (customer, supplier, nation, region) is broadcast; only the
    * orders ⋈ lineitem fact-fact edge shuffles. The deepest
    * join-planning probe in the registry. */
  val qTpchQ5 = Q(
    "q_tpch_q5",
    (s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                          JOIN nation ON s_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** Interval × point range join ([[graft.operators.RangeJoin]]): promo
    * windows derived from low-key orders (lo = orderdate, hi = lo +
    * 1..7 days) catch every lineitem shipped inside them — day-binned
    * equi-join + exact residual, NOT a nested-loop theta join (the spec
    * asserts no BNLJ/cartesian in the plan). Oracle: DuckDB's native
    * inequality join — two different algorithms, same rows. */
  val qRangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      val windows = Tables.orders(s, dir)
        .where(col("o_orderkey") <= 80)
        .select(col("o_orderkey").as("window_id"),
          col("o_orderdate").as("lo"),
          expr("timestampadd(DAY, CAST(o_orderkey % 7 + 1 AS INT), o_orderdate)").as("hi"))
      val hits = graft.operators.RangeJoin.pointInInterval(
        windows, Tables.lineitem(s, dir), "lo", "hi", "l_shipdate")
      hits.groupBy("window_id")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("window_id")
    },
    Some("""WITH w AS (SELECT o_orderkey AS window_id, o_orderdate AS lo,
                              o_orderdate + INTERVAL 1 DAY * (o_orderkey % 7 + 1) AS hi
                       FROM orders WHERE o_orderkey <= 80)
            SELECT window_id, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM lineitem JOIN w ON l_shipdate >= lo AND l_shipdate <= hi
            GROUP BY window_id ORDER BY window_id"""))

  /** TPC-H Q14-style promo revenue share: fact ⋈ broadcast part with a
    * month filter, conditional aggregation, one output row. */
  val qTpchQ14 = Q(
    "q_tpch_q14",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
            sum(rev).cast("double"), 6).as("promo_share"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_share,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""))

  /** TPC-H Q18-style large-volume orders: the HAVING-filtered aggregate
    * IS the semi-join side (no second lineitem scan — the sum is reused
    * as the output column), then orders + broadcast customer attach the
    * descriptive columns. AQE turns the data-dependent small side into
    * a runtime broadcast. */
  val qTpchQ18 = Q(
    "q_tpch_q18",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
        .where(col("sum_qty") > 170.0)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          round(col("o_totalprice"), 6).as("total"), col("sum_qty"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (SELECT l_orderkey,
                                CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
                         FROM lineitem GROUP BY l_orderkey
                         HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 170.0)
            SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
                   round(o_totalprice, 6) AS total, sum_qty
            FROM big JOIN orders ON l_orderkey = o_orderkey
                     JOIN customer ON o_custkey = c_custkey
            ORDER BY total DESC, o_orderkey LIMIT 100"""))

  /** Sliding RANGE-frame moving average: per user, the 1-hour trailing
    * window over event values — the interval-frame window shape (RANGE,
    * not ROWS) that log analytics runs constantly. Bounded to 5 users
    * for the fixture; the window itself is one shuffle on user_id
    * however large the table. DECIMAL window sums for cross-engine
    * exactness. */
  val qEventsMovingAvg = Q(
    "q_events_moving_avg",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("t_us"))
        .rangeBetween(-3600L * 1000000L, 0)
      Tables.events(s, dir)
        .where(col("user_id") < 5)
        .withColumn("t_us", unix_micros(col("ts")))
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("mov_avg",
          round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double") /
            col("n_win"), 6))
        .select("event_id", "user_id", "n_win", "mov_avg")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, CAST(n_win AS BIGINT) AS n_win,
                   round(CAST(s AS DOUBLE) / n_win, 6) AS mov_avg
            FROM (SELECT event_id, user_id,
                         count(*) OVER w AS n_win,
                         sum(CAST(value AS DECIMAL(18,6))) OVER w AS s
                  FROM events WHERE user_id < 5
                  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
            ORDER BY event_id"""))

  /** Explicit LEFT ANTI join: customers with no urgent order, rolled up
    * per market segment. The anti side is pre-filtered and deduplicated
    * by the join itself; at scale this is one shuffle (or a broadcast
    * when the filtered side is small — AQE's call). Oracle via
    * NOT EXISTS — the relational twin of the anti join. */
  val qNoUrgent = Q(
    "q_no_urgent",
    (s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,6)")).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Equal-width histogram of event values per type: global [min, max]
    * from a one-row broadcast aggregate, 10 bins, bin index from
    * identical double arithmetic on both engines (floor of the same
    * bits — no interpolation). The profiling sweep every ingest
    * pipeline runs before choosing filters. */
  val qValueHistogram = Q(
    "q_value_histogram",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val bounds = e.agg(min("value").as("mn"), max("value").as("mx"))
      e.crossJoin(broadcast(bounds))
        // degenerate mx == mn guard: everything lands in bin 0
        .withColumn("bin",
          when(col("mx") === col("mn"), lit(0L)).otherwise(
            least(lit(9L), floor((col("value") - col("mn")) * 10.0 /
              (col("mx") - col("mn"))).cast("long"))))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("sum_value"))
        .orderBy("event_type", "bin")
    },
    Some("""WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
            SELECT event_type,
                   CASE WHEN mx = mn THEN 0
                        ELSE least(9, CAST(floor((value - mn) * 10.0 / (mx - mn)) AS BIGINT))
                   END AS bin,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
            FROM events CROSS JOIN b
            GROUP BY event_type, bin ORDER BY event_type, bin"""))

  /** TPC-H Q7-style nation-pair trade flow: the supplier's nation and
    * the customer's nation attach to the SAME lineitem through two
    * different broadcast dimension chains, revenue per directed pair
    * per year. The two-role-dimension pattern (one dim table joined
    * twice under different aliases). */
  val qTpchQ7 = Q(
    "q_tpch_q7",
    (s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === n1("sk"))
        .join(broadcast(n2), c("c_nationkey") === n2("ck"))
        .where(sup("s_nationkey") < 5 && c("c_nationkey") < 5 &&
          sup("s_nationkey") =!= c("c_nationkey"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN supplier ON l_suppkey = s_suppkey
                          JOIN nation n1 ON s_nationkey = n1.n_nationkey
                          JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey < 5 AND c_nationkey < 5
              AND s_nationkey <> c_nationkey
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year"""))

  /** Sequential funnel: per user, count click→view transitions between
    * CONSECUTIVE events (lead window over event time) — the adjacency
    * pattern behind funnel/conversion analytics. One shuffle on
    * user_id; the lead frame is a single following row. */
  val qFunnel = Q(
    "q_funnel",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_type", lead("event_type", 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "click" && col("next_type") === "view", 1L)
            .otherwise(0L)).as("click_to_view"))
        .where(col("user_id") < 20)
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'click' AND next_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS click_to_view
            FROM (SELECT user_id, event_type,
                         lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS next_type
                  FROM events)
            WHERE user_id < 20 GROUP BY user_id ORDER BY user_id"""))

  /** Arg-extreme aggregates: the event carrying the max/min value per
    * type (`max_by`/`min_by` ≡ DuckDB `arg_max`/`arg_min`), id
    * tie-broken via the (value, id) struct so both engines pick the
    * same row deterministically. */
  val qArgExtremes = Q(
    "q_arg_extremes",
    (s, dir) => Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        max(struct(col("value"), col("event_id"))).getField("event_id").as("max_event"),
        min(struct(col("value"), col("event_id"))).getField("event_id").as("min_event"),
        round(max("value"), 6).as("max_value"),
        round(min("value"), 6).as("min_value"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   (max(struct_pack(v := value, id := event_id))).id AS max_event,
                   (min(struct_pack(v := value, id := event_id))).id AS min_event,
                   round(max(value), 6) AS max_value,
                   round(min(value), 6) AS min_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Descriptive statistics (the `df.summary()` analog) per return
    * flag: count / mean / sample std / min / max of quantity. Std via
    * the explicit two-moment formula over DECIMAL sums —
    * `stddev_samp`'s streaming accumulation is order-dependent in the
    * last ulp and differs across engines, but exact decimal Σx and Σx²
    * pushed through the identical double formula give identical bits. */
  val qSummaryStats = Q(
    "q_summary_stats",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("s1"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,6)")).cast("double").as("s2"),
        round(min("l_quantity"), 6).as("qmin"),
        round(max("l_quantity"), 6).as("qmax"))
      .select(col("l_returnflag"), col("n"),
        round(col("s1") / col("n"), 6).as("mean"),
        // n=1 group guard: (n-1)=0 is a job-killing ANSI division —
        // sample std of a singleton is undefined, emit NULL like the oracle
        when(col("n") > 1,
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6))
          .as("std"),
        col("qmin"), col("qmax"))
      .orderBy("l_returnflag"),
    Some("""WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                              CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s2,
                              round(min(l_quantity), 6) AS qmin,
                              round(max(l_quantity), 6) AS qmax
                       FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n, round(s1 / n, 6) AS mean,
                   CASE WHEN n > 1
                        THEN round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
                   END AS std,
                   qmin, qmax
            FROM m ORDER BY l_returnflag"""))

  /** TPC-H Q4-style order-priority check, adapted to the fixture's
    * columns (no l_commitdate/l_receiptdate — "late" = any line shipped
    * more than 60 days after the order date): count orders per priority
    * having at least one late line. The LEFT SEMI join shape — the
    * existence probe never duplicates orders however many lines match,
    * and the lineitem side carries only (l_orderkey, l_shipdate) into
    * the join. */
  val qTpchQ4 = Q(
    "q_tpch_q4",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
      val l = Tables.lineitem(s, dir)
      val late = l.join(o, l("l_orderkey") === o("o_orderkey"))
        // timestamp + interval (NOT date_add, which truncates to DATE):
        // bit-identical to the oracle's o_orderdate + INTERVAL 60 DAY
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("late_key")).distinct()
      o.join(late, o("o_orderkey") === late("late_key"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q10-style returned-item revenue: which customers returned the
    * most value in a quarter. Fact-fact shuffle join orders ⋈ lineitem
    * restricted to l_returnflag = 'R'; customer and nation broadcast;
    * top-20 by lost revenue. */
  val qTpchQ10 = Q(
    "q_tpch_q10",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
      val l = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"),
          round(first(col("c_acctbal")), 6).as("acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   round(any_value(c_acctbal), 6) AS acctbal
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q16-style supplier-diversity count, adapted (the fixture has
    * no partsupp — lineitem is the part↔supplier link): per (brand,
    * type-prefix, size) the number of DISTINCT suppliers shipping that
    * part shape, excluding one brand. distinct-agg after a broadcast
    * join; the distinct dedups map-side under partial_count(distinct). */
  val qTpchQ16 = Q(
    "q_tpch_q16",
    (s, dir) => {
      val p = Tables.part(s, dir).where(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      val l = Tables.lineitem(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"),
          substring(col("p_type"), 1, 6).as("p_type_prefix"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"),
          col("p_type_prefix"), col("p_size"))
        .limit(30)
    },
    Some("""SELECT p_brand, substring(p_type, 1, 6) AS p_type_prefix, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
            GROUP BY p_brand, p_type_prefix, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type_prefix, p_size
            LIMIT 30"""))

  /** TPC-H Q19-style disjunctive-predicate revenue: an OR of three
    * (brand AND size AND quantity-range) conjunctions after a broadcast
    * part join. The OR cannot prune the scan, but each conjunct's
    * brand/size legs sit on the broadcast side and the quantity legs on
    * the fact side — Catalyst splits them across the join (the
    * partial-pushdown probe). */
  val qTpchQ19 = Q(
    "q_tpch_q19",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 30)))
        .agg(coalesce(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
            .cast("double"), lit(0.0)).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT coalesce(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)"""))

  /** TPC-H Q8-style national market share: of the ECONOMY-part revenue
    * sold to ASIA customers per year, what fraction came from NATION_3
    * suppliers. Conditional aggregation over a 7-table star join —
    * every dimension broadcast, one fact-fact shuffle; the share is a
    * single IEEE division of two exact decimal sums. */
  val qTpchQ8 = Q(
    "q_tpch_q8",
    (s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val cn = Tables.nation(s, dir).select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region"))
      val sn = Tables.nation(s, dir).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val p = Tables.part(s, dir).where(col("p_type") === "ECONOMY")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, dir)
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), c("c_nationkey") === cn("cn_key"))
        .join(broadcast(r), cn("cn_region") === r("r_regionkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(sn), sup("s_nationkey") === sn("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
            sum(vol).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
                         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN part ON l_partkey = p_partkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    * so zero-order customers survive with count 0, then the histogram
    * of customers per order count — the two-level aggregation shape. */
  val qTpchQ13 = Q(
    "q_tpch_q13",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q15-style top supplier: revenue per supplier over a quarter,
    * keep the max-revenue supplier(s). The max and the equality filter
    * both run on EXACT decimal sums (no double round-trip), so the
    * argmax cannot flip on a ulp cross-engine; only the displayed
    * revenue is rounded. */
  val qTpchQ15 = Q(
    "q_tpch_q15",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
      val rev = l.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .as("total_revenue"))
      val top = rev.agg(max("total_revenue").as("max_revenue"))
      val sup = Tables.supplier(s, dir)
      rev.crossJoin(broadcast(top))
        .where(col("total_revenue") === col("max_revenue"))
        .join(broadcast(sup), col("supplier_no") === sup("s_suppkey"))
        .select(col("supplier_no"), col("s_name"),
          round(col("total_revenue").cast("double"), 6).as("total_revenue"))
        .orderBy("supplier_no")
    },
    Some("""WITH rev AS (SELECT l_suppkey AS supplier_no,
                                sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
                         FROM lineitem
                         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
                         GROUP BY l_suppkey)
            SELECT supplier_no, s_name,
                   round(CAST(total_revenue AS DOUBLE), 6) AS total_revenue
            FROM rev JOIN supplier ON supplier_no = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
            ORDER BY supplier_no"""))

  /** TPC-H Q17-style small-quantity revenue: lines of one brand whose
    * quantity is under 20% of that part's average quantity — the
    * correlated-aggregate shape, decorrelated into a per-part aggregate
    * joined back to the fact (each side broadcast-friendly after the
    * brand cut). */
  val qTpchQ17 = Q(
    "q_tpch_q17",
    (s, dir) => {
      val p = Tables.part(s, dir).where(col("p_brand") === "Brand#5")
      val l = Tables.lineitem(s, dir)
      val branded = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      val avgQ = branded.groupBy(col("l_partkey").as("ap_key"))
        .agg((sum(col("l_quantity").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      branded.join(broadcast(avgQ), col("l_partkey") === col("ap_key"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(coalesce(round(sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("double") / 7.0, 6), lit(0.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    Some("""WITH branded AS (SELECT l_partkey, l_quantity, l_extendedprice
                             FROM lineitem JOIN part ON l_partkey = p_partkey
                             WHERE p_brand = 'Brand#5'),
                 avgq AS (SELECT l_partkey AS ap_key,
                                 CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
                          FROM branded GROUP BY l_partkey)
            SELECT coalesce(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6), 0.0) AS avg_yearly,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM branded JOIN avgq ON l_partkey = ap_key
            WHERE l_quantity < 0.2 * avg_qty"""))

  /** TPC-H Q22-style dormant high-balance customers: above the global
    * positive-balance average, with no RECENT orders (none since
    * 2000-01-01 — every fixture customer has some order on file, so the
    * literal "no orders ever" is vacuous here) — scalar-subquery
    * threshold (one-row broadcast) + LEFT ANTI existence negation,
    * grouped by nation. */
  val qTpchQ22 = Q(
    "q_tpch_q22",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val avgBal = c.where(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("2000-01-01"))
        .select(col("o_custkey")).distinct()
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(18,6)")).cast("double"), 6)
            .as("totacctbal"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
                   round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                               FROM customer WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Bloom-pruned fact-fact semi-join ([[graft.operators.BloomJoin]]):
    * lineitems of high-value orders, with the probe side cut by a
    * codegen'd `might_contain` BEFORE the exact join — the runtime-
    * filter pattern made explicit. The bloom is pure pruning (the exact
    * semi-join kills its false positives), so the result — and the
    * oracle — is the plain semi-join's. At 100 TB the win is shuffle
    * volume: only probe rows passing the 1 MB broadcast sketch enter
    * the join exchange, unconditionally — no CBO size-threshold gamble
    * (`spark.sql.optimizer.runtime.bloomFilter.*`). */
  val qBloomJoin = Q(
    "q_bloom_join",
    (s, dir) => {
      val highValue = Tables.orders(s, dir)
        .where(col("o_totalprice") > 480000.0)
        .select("o_orderkey")
      graft.operators.BloomJoin.semiJoin(
        Tables.lineitem(s, dir), "l_orderkey", highValue, "o_orderkey",
        estItems = 100000L, numBits = 1048576L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem SEMI JOIN (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000)
                 o ON l_orderkey = o.o_orderkey
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  def all: Seq[Q] = Seq(qTpchQ1, qTpchQ3, qTpchQ4, qTpchQ5, qTpchQ6, qTpchQ7,
    qTpchQ8, qTpchQ10, qTpchQ13, qTpchQ14, qTpchQ15, qTpchQ16, qTpchQ17,
    qTpchQ18, qTpchQ19, qTpchQ22, qOrdersNation,
    qSegmentTop, qSessionize, qEventsJson,
    qEventPercentiles, qAsofOrders, qRangeJoin, qEventsMovingAvg, qNoUrgent,
    qValueHistogram, qFunnel, qArgExtremes, qSummaryStats, qBloomJoin)
}
