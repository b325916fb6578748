package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining OLAP surface (§2.10): set operations, CUBE grouping sets,
  * and pivot — each expressed both through the DataFrame/SQL API and an
  * equivalent DuckDB oracle. */
object OlapQueries {

  /** INTERSECT / EXCEPT / UNION over customer-key sets (building-segment
    * customers vs high-value order customers), as scalar subqueries —
    * exercises Spark SQL's native set operators end-to-end. */
  val qSetOps = Q(
    "q_set_ops",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        WITH seg AS (SELECT c_custkey AS k FROM graft_customer WHERE c_mktsegment = 'BUILDING'),
             big AS (SELECT DISTINCT o_custkey AS k FROM graft_orders WHERE o_totalprice > 300000)
        SELECT
          CAST((SELECT count(*) FROM (SELECT k FROM seg INTERSECT SELECT k FROM big)) AS BIGINT) AS n_intersect,
          CAST((SELECT count(*) FROM (SELECT k FROM seg EXCEPT SELECT k FROM big)) AS BIGINT) AS n_except,
          CAST((SELECT count(*) FROM (SELECT k FROM seg UNION SELECT k FROM big)) AS BIGINT) AS n_union""")
    },
    Some("""WITH seg AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
                 big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
            SELECT
              CAST((SELECT count(*) FROM (SELECT k FROM seg INTERSECT SELECT k FROM big)) AS BIGINT) AS n_intersect,
              CAST((SELECT count(*) FROM (SELECT k FROM seg EXCEPT SELECT k FROM big)) AS BIGINT) AS n_except,
              CAST((SELECT count(*) FROM (SELECT k FROM seg UNION SELECT k FROM big)) AS BIGINT) AS n_union"""))

  /** CUBE over (event_type, iso weekday): all four grouping combinations
    * in one pass (Spark `cube` ≡ GROUP BY CUBE). */
  val qEventsCube = Q(
    "q_events_cube",
    (s, dir) => Tables.events(s, dir)
      .withColumn("dow", (weekday(col("ts")) + 1).cast("int")) // ISO: Mon=1
      .cube("event_type", "dow")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("dow"), lit(-1)).as("dow"), col("cnt"), col("sum_value"))
      .orderBy("event_type", "dow"),
    Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(dow, -1) AS dow,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM (SELECT event_type, CAST(isodow(ts) AS INTEGER) AS dow, value FROM events)
            GROUP BY CUBE(event_type, dow) ORDER BY event_type, dow"""))

  /** Explicit GROUPING SETS (the non-hierarchical cousin of
    * rollup/cube): per-type totals and per-weekday totals in ONE pass
    * over events — no grand total, no cross product, exactly two
    * marginal tables from a single scan. Spark 4's
    * `Dataset.groupingSets` ≡ GROUP BY GROUPING SETS. */
  val qEventsGroupingSets = Q(
    "q_events_grouping_sets",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("dow", (weekday(col("ts")) + 1).cast("int")) // ISO: Mon=1
      e.groupingSets(
        Seq(Seq(col("event_type")), Seq(col("dow"))),
        col("event_type"), col("dow"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("dow"), lit(-1)).as("dow"), col("cnt"), col("sum_value"))
        .orderBy("event_type", "dow")
    },
    Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(dow, -1) AS dow,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM (SELECT event_type, CAST(isodow(ts) AS INTEGER) AS dow, value FROM events)
            GROUP BY GROUPING SETS ((event_type), (dow))
            ORDER BY event_type, dow"""))

  /** Pivot: per-source document counts spread across language columns
    * (explicit value list -> stable schema; DuckDB mirror via FILTER). */
  val qPivotLangs = Q(
    "q_pivot_langs",
    (s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val pivoted = Tables.documents(s, dir)
        .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
      pivoted.select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy("source")
    },
    Some("""SELECT source,
                   CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS de,
                   CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS en,
                   CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS es,
                   CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
                   CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS zh
            FROM documents GROUP BY source ORDER BY source"""))

  /** Correlated-analysis shape: orders priced far above their own
    * customer's average (window avg as the decorrelated form). Counts
    * only — boundary-safe across engines. */
  val qAboveAvg = Q(
    "q_above_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
      Tables.orders(s, dir)
        .withColumn("cavg", avg("o_totalprice").over(w))
        .where(col("o_totalprice") > col("cavg") * 1.5)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT o_orderpriority, o_totalprice,
                         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
                  FROM orders)
            WHERE o_totalprice > cavg * 1.5
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Z-order layout audit ([[graft.operators.ZOrder]]): quantize events
    * to an 8-bit (user, value) grid, Morton-interleave into a 16-bit
    * z key, and profile the 256-bucket distribution (`z >> 8`). At
    * scale this z key is the write-clustering sort: files become
    * z-ranges, so a predicate on user_id OR on value prunes to a small
    * contiguous file set (a single-column sort clusters one and
    * scatters the other). Integer-only — bit-identical cross-engine. */
  val qZorderCluster = Q(
    "q_zorder",
    (s, dir) => {
      import graft.operators.ZOrder
      val qx = (col("user_id") % 256).cast("int")
      // value/4.0 is exact (power-of-two divisor); clamp to the grid
      val qy = least(floor(col("value") / 4.0).cast("int"), lit(255))
      Tables.events(s, dir)
        .select(ZOrder.interleave2(qx, qy, 8).as("z"))
        .groupBy(shiftright(col("z"), 8).cast("int").as("z_bucket"))
        .agg(count(lit(1)).as("n_events"),
          min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("z_bucket")
    },
    Some {
      val z = graft.operators.ZOrder.sqlInterleave2(
        "user_id % 256",
        "least(CAST(floor(value / 4.0) AS INTEGER), 255)", 8)
      s"""WITH zs AS (SELECT CAST($z AS BIGINT) AS z FROM events)
          SELECT CAST(z >> 8 AS INTEGER) AS z_bucket,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
          FROM zs GROUP BY 1 ORDER BY z_bucket"""
    })

  def all: Seq[Q] = Seq(qSetOps, qEventsCube, qEventsGroupingSets, qPivotLangs,
    qAboveAvg, qZorderCluster)
}
