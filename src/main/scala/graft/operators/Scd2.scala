package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Fns._

/** Slowly Changing Dimension Type 2.
  *
  * Re-expresses /root/reference/macros/scd_type2_macro.sql Spark-first:
  * instead of the macro's incremental merge dance (expire + union), the
  * whole version history is derived in ONE window pass over the change
  * stream — effective_to is simply the next change's timestamp
  * (lead over the key partition). One shuffle on the business key; no
  * self-joins, no driver loops — this is the shape that scales to 100 TB.
  */
object Scd2 {

  /** Build the full SCD2 history from a change stream keyed by `user_id`
    * ordered by `ts` (tie-broken by event_id for determinism). */
  def build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from_s", epochS(col("ts")))
      .withColumn("effective_to_s", epochS(lead(col("ts"), 1).over(w)))
      .select(
        surrogateKey(col("user_id"), col("effective_from_s")).as("scd_key"),
        col("user_id"),
        col("event_type").as("attr_type"),
        col("value").as("attr_value"),
        col("version"),
        col("effective_from_s"),
        col("effective_to_s"),
        col("effective_to_s").isNull.as("is_current"),
        when(col("version") === 1, "NEW").otherwise("UPDATED").as("change_reason"),
        md5(concat_ws("|", col("event_type"), fmt2(col("value"))).cast("binary")).as("change_hash"))
      .orderBy("user_id", "version")
  }

  /** SCD integrity validation (scd_type2_macro.sql validate_scd_integrity):
    * overlapping current rows per key + effective-date gaps via lag. */
  def integrity(events: DataFrame): DataFrame = {
    val scd = build(events)
    val overlaps = scd.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") > 1)
      .agg(count(lit(1)).as("issue_count"))
      .select(lit("OVERLAPPING_CURRENT").as("issue_type"), col("issue_count"))
    val wGap = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val gaps = scd
      .withColumn("prev_to", lag(col("effective_to_s"), 1).over(wGap))
      .filter(col("prev_to").isNotNull && col("effective_from_s") =!= col("prev_to"))
      .agg(count(lit(1)).as("issue_count"))
      .select(lit("DATE_GAPS").as("issue_type"), col("issue_count"))
    overlaps.unionAll(gaps).orderBy("issue_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2_build" -> ((s, d) => build(Tables.events(s, d))),
    "q_scd2_integrity" -> ((s, d) => integrity(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_scd2_build" ->
      """WITH h AS (
           SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS effective_from_s,
             CAST(FLOOR(epoch(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS effective_to_s
           FROM events)
         SELECT
           md5(CAST(user_id AS VARCHAR) || '||' || CAST(effective_from_s AS VARCHAR)) AS scd_key,
           user_id, event_type AS attr_type, value AS attr_value, version,
           effective_from_s, effective_to_s,
           effective_to_s IS NULL AS is_current,
           CASE WHEN version = 1 THEN 'NEW' ELSE 'UPDATED' END AS change_reason,
           md5(event_type || '|' || printf('%.2f', value)) AS change_hash
         FROM h ORDER BY user_id, version""",
    "q_scd2_integrity" ->
      """WITH h AS (
           SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS effective_from_s,
             CAST(FLOOR(epoch(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS effective_to_s
           FROM events),
         o AS (SELECT CAST(COUNT(*) AS BIGINT) AS issue_count FROM (
                 SELECT user_id FROM h WHERE effective_to_s IS NULL
                 GROUP BY user_id HAVING COUNT(*) > 1)),
         g AS (SELECT CAST(COUNT(*) AS BIGINT) AS issue_count FROM (
                 SELECT *, LAG(effective_to_s) OVER (PARTITION BY user_id ORDER BY version) AS prev_to
                 FROM h) WHERE prev_to IS NOT NULL AND effective_from_s <> prev_to)
         SELECT 'DATE_GAPS' AS issue_type, issue_count FROM g
         UNION ALL
         SELECT 'OVERLAPPING_CURRENT' AS issue_type, issue_count FROM o
         ORDER BY issue_type"""
  )
}
