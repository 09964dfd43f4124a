package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Fns._

/** Join operators beyond plain equi-joins: as-of, banded range join,
  * semi/anti composition, rollup with grouping ids, tumbling windows.
  *
  * As-of join is implemented as the union-sort-backfill pattern (tag both
  * streams, one window over the merge key, last non-null order attribute)
  * — a single shuffle on the key, no per-row probes, the shape that holds
  * at 100 TB. The range join avoids O(n·m) by bucketing both sides on the
  * band width and joining on bucket id (the equi-join carries the work;
  * the residual BETWEEN filter only sees bucket-local pairs).
  */
object Joins {

  /** Latest order at-or-before each event for the same customer
    * (events.user_id = orders.o_custkey). Orders are pre-deduped to one
    * row per (custkey, orderdate) — max orderkey wins — so the as-of pick
    * is deterministic. */
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val wDedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val o2 = orders
      .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"),
        lit(null).cast("long").as("event_id"), lit(null).cast("string").as("event_type"),
        lit(0).as("src"))
    val ev = events.select(col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"),
      col("event_id"), col("event_type"), lit(1).as("src"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    o2.unionByName(ev)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", to_date(last(when(col("src") === 0, col("t")), ignoreNulls = true).over(w)))
      .filter(col("src") === 1)
      .select(col("event_id"), col("k").as("user_id"), epochS(col("t")).as("ts_s"),
        col("event_type"), col("asof_orderkey"), col("asof_orderdate"),
        col("asof_totalprice"))
      .orderBy("event_id")
  }

  /** Tumbling 1-hour window aggregation over events — the batch twin of
    * the structured-streaming job in graft.streaming.EventStream. */
  def windowTumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("hour_start_s"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("hour_start_s", "event_type")

  /** SLIDING 1-hour window every 15 minutes — the overlapping-window twin
    * of [[windowTumbling]] (and of the streaming job's sliding variant).
    * Spark's window generator expands each event into exactly
    * width/slide = 4 epoch-aligned windows before the hash aggregation —
    * a fixed 4× map-side expansion that partial-aggregates away before
    * the shuffle, so the shuffled volume is windows×types, not events×4.
    * The oracle rebuilds the same window starts arithmetically
    * (floor(epoch/slide)·slide − k·slide, k < width/slide). */
  def windowSliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start_s"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start_s", "event_type")

  /** Banded range join: lineitems whose extended price falls within ±band
    * of a part's retail price, aggregated per part. Both sides bucketed on
    * the band width; the join is an equi-join on bucket id. */
  def rangeJoin(lineitem: DataFrame, part: DataFrame, band: Double = 50.0,
                bucket: Double = 100.0): DataFrame = {
    val li = lineitem.select(col("l_extendedprice"), col("l_quantity"))
      .withColumn("b", floor(col("l_extendedprice") / bucket).cast("long"))
    val p = part.select(col("p_partkey"), col("p_retailprice"))
      .withColumn("b", explode(sequence(
        floor((col("p_retailprice") - band) / bucket).cast("long"),
        floor((col("p_retailprice") + band) / bucket).cast("long"))))
    li.join(p, Seq("b"))
      .filter(col("l_extendedprice").between(
        col("p_retailprice") - band, col("p_retailprice") + band))
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_lines"), decSum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_partkey")
  }

  /** Semi/anti join composition: order-holding vs order-less customers per
    * market segment. */
  def semiAnti(customer: DataFrame, orders: DataFrame): DataFrame = {
    val ok = orders.select("o_custkey")
    val semi = customer.join(ok, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(true))
    val anti = customer.join(ok, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit(false))
    semi.unionByName(anti).select("segment", "has_orders", "n_customers")
      .orderBy("segment", "has_orders")
  }

  /** Multi-level ROLLUP over the region/nation hierarchy with grouping
    * ids (the warehouse's drill-down rollup mart). */
  def rollupRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"),
        grouping_id().as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("revenue"), col("n_lines"), col("gid").cast("int").as("gid"))
      .orderBy("gid", "region_name", "nation_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, d) => asofJoin(Tables.events(s, d), Tables.orders(s, d))),
    "q_window_tumbling" -> ((s, d) => windowTumbling(Tables.events(s, d))),
    "q_window_sliding" -> ((s, d) => windowSliding(Tables.events(s, d))),
    "q_range_join" -> ((s, d) => rangeJoin(Tables.lineitem(s, d), Tables.part(s, d))),
    "q_semi_anti" -> ((s, d) => semiAnti(Tables.customer(s, d), Tables.orders(s, d))),
    "q_rollup_cube" -> ((s, d) => rollupRevenue(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH o2 AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
               ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
         SELECT e.event_id, e.user_id, CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_s,
           e.event_type, o.o_orderkey AS asof_orderkey,
           CAST(o.o_orderdate AS DATE) AS asof_orderdate,
           o.o_totalprice AS asof_totalprice
         FROM events e ASOF LEFT JOIN o2 o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         ORDER BY e.event_id""",
    "q_window_tumbling" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start_s,
         event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_window_sliding" ->
      """WITH k AS (SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, 3) t(i)),
         w AS (SELECT CAST(FLOOR(epoch(ts) / 900) * 900 - i * 900 AS BIGINT) AS win_start_s,
                 event_type, value
               FROM events, k)
         SELECT win_start_s, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_range_join" ->
      """SELECT p_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part
           ON l_extendedprice BETWEEN p_retailprice - 50 AND p_retailprice + 50
         GROUP BY p_partkey ORDER BY p_partkey""",
    "q_semi_anti" ->
      """SELECT c_mktsegment AS segment, TRUE AS has_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
         FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1
         UNION ALL
         SELECT c_mktsegment, FALSE, CAST(COUNT(*) AS BIGINT)
         FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1
         ORDER BY segment, has_orders""",
    "q_rollup_cube" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(GROUPING(r_name, n_name) AS INT) AS gid
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY gid, region_name, nation_name"""
  )
}
