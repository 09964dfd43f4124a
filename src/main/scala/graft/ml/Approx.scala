package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Fns._

/** Approximate sketches + time-range windows.
  *
  * At 100 TB, exact distinct counts and exact percentiles are shuffles
  * over the full key space; HLL and quantile sketches answer the same
  * profiling questions in one pass with bounded error — the scale path
  * for the reference's profiling/statistics features. Sketch internals
  * are engine-specific, so `q_approx_profile` is a rows-only check; the
  * spec bounds its error against the exact answers instead.
  */
object Approx {

  /** One-pass approximate profile of the event stream (exact values
    * alongside, for error inspection). */
  def approxProfile(events: DataFrame): DataFrame =
    events.agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("value"), 0.02).as("approx_values"),
      expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"),
      expr("percentile(value, 0.5)").as("exact_p50"),
      expr("approx_percentile(value, 0.9, 10000)").as("approx_p90"))

  /** Time-range rolling window: events in the PRECEDING HOUR per user
    * (value-range frame, not row-count frame — the correct semantics for
    * irregular event streams). */
  def rollingTimeWindow(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-3600L, 0L)
    events
      .withColumn("ts_s", epochS(col("ts")))
      .withColumn("n_last_1h", count(lit(1)).over(w))
      .withColumn("value_last_1h",
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
      .select("event_id", "user_id", "ts_s", "n_last_1h", "value_last_1h")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_profile" -> ((s, d) => approxProfile(Tables.events(s, d))),
    "q_rolling_time_window" -> ((s, d) => rollingTimeWindow(Tables.events(s, d)))
  )

  /** q_approx_profile deliberately has NO oracle: sketch values are
    * engine-specific (rows-only check; error-bounded by ApproxSpec). */
  val oracles: Map[String, String] = Map(
    "q_rolling_time_window" ->
      """WITH t AS (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, value FROM events)
         SELECT event_id, user_id, ts_s,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_last_1h
         FROM t
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY event_id"""
  )
}
