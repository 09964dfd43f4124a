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
    * ordered by `ts` (tie-broken by event_id for determinism).
    * `source_event_id` + `effective_from_us` carry enough of the source
    * to REPLAY a key's history exactly — which is what makes [[merge]]
    * provably equal to a full rebuild. */
  def build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from_s", epochS(col("ts")))
      .withColumn("effective_to_s", epochS(lead(col("ts"), 1).over(w)))
      .select(
        // keyed on the MICROSECOND effective-from: two changes for one
        // user inside the same epoch second are distinct versions and
        // must get distinct surrogate keys — the floor-second form
        // collided on them (one such pair exists in the sf0.1 data)
        surrogateKey(col("user_id"), unix_micros(col("ts"))).as("scd_key"),
        col("user_id"),
        col("event_id").as("source_event_id"),
        col("event_type").as("attr_type"),
        col("value").as("attr_value"),
        col("version"),
        col("effective_from_s"),
        unix_micros(col("ts")).as("effective_from_us"),
        col("effective_to_s"),
        col("effective_to_s").isNull.as("is_current"),
        when(col("version") === 1, "NEW").otherwise("UPDATED").as("change_reason"),
        rowHash(col("event_type"), fmt2(col("value"))).as("change_hash"))
      .orderBy("user_id", "version")
  }

  /** Incremental merge (incremental_strategy='merge' of the reference
    * macro, Spark-first): keys untouched by the new batch pass through
    * byte-identical; each touched key's history is replayed from the
    * snapshot's own replay columns plus the new changes and rebuilt in
    * one window pass. Only the touched partitions shuffle — the 100 TB
    * shape — and the result equals a full rebuild exactly (the
    * q_scd2_incremental oracle IS the full-rebuild SQL). */
  def merge(current: DataFrame, newChanges: DataFrame): DataFrame = {
    val changedKeys = newChanges.select(col("user_id")).distinct()
    val untouched = current.join(changedKeys, Seq("user_id"), "left_anti")
    val replayed = current.join(changedKeys, Seq("user_id"), "left_semi")
      .select(col("user_id"),
        col("source_event_id").as("event_id"),
        timestamp_micros(col("effective_from_us")).as("ts"),
        col("attr_type").as("event_type"),
        col("attr_value").as("value"))
    val incoming = newChanges.select("user_id", "event_id", "ts", "event_type", "value")
    val rebuilt = build(replayed.unionByName(incoming))
    untouched.select(rebuilt.columns.map(col): _*)
      .unionByName(rebuilt)
      .orderBy("user_id", "version")
  }

  /** Driver-facing incremental demo: build from the first half of the
    * stream, merge the second half in — must hash-match the full-rebuild
    * oracle. */
  def incremental(events: DataFrame): DataFrame = {
    val mid = events.agg(floor(max(col("event_id")) / 2d).cast("long").as("mid"))
    val tagged = events.crossJoin(broadcast(mid))
    val first = tagged.filter(col("event_id") <= col("mid")).drop("mid")
    val second = tagged.filter(col("event_id") > col("mid")).drop("mid")
    merge(build(first), second)
  }

  /** SCD integrity validation (scd_type2_macro.sql validate_scd_integrity):
    * overlapping current rows per key + effective-date gaps via lag.
    *
    * Fused into ONE pass over the change stream: both checks derive from
    * the same key-partitioned window (effective_to = lead, prev_to = lag
    * of that lead — same partitioning+ordering, so one shuffle serves
    * both), rolled up per key (still co-partitioned — no extra exchange)
    * and then to two issue rows. The old form built the SCD2 window twice,
    * doubling the warehouse family's most expensive shuffle. */
  def integrity(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("effective_from_s", epochS(col("ts")))
      .withColumn("effective_to_s", epochS(lead(col("ts"), 1).over(w)))
      .withColumn("prev_to", lag(col("effective_to_s"), 1).over(w))
    val perKey = flagged.groupBy(col("user_id")).agg(
      sum(when(col("effective_to_s").isNull, 1L).otherwise(0L)).as("n_current"),
      sum(when(col("prev_to").isNotNull && col("effective_from_s") =!= col("prev_to"), 1L)
        .otherwise(0L)).as("n_gaps"))
    perKey.agg(
      count(when(col("n_current") > 1, lit(1))).as("overlap_count"),
      sum(col("n_gaps")).as("gap_count"))
      .select(explode(array(
        struct(lit("DATE_GAPS").as("issue_type"), col("gap_count").as("issue_count")),
        struct(lit("OVERLAPPING_CURRENT").as("issue_type"), col("overlap_count").as("issue_count")))).as("s"))
      .select(col("s.issue_type").as("issue_type"), col("s.issue_count").as("issue_count"))
      .orderBy("issue_type")
  }

  /** Point-in-time (as-of) lookup against the SCD2 history — the
    * leakage-safe join a training pipeline uses to attach dimension
    * state AS OF a moment strictly before the label event (here:
    * `lagS` seconds before each probe's timestamp). The probe set is a
    * deterministic md5 quarter-sample of the stream.
    *
    * Shape: one equi-join on the business key with the version-interval
    * range predicate evaluated post-match — each probe meets only its
    * own key's versions (bounded per key), never a cross join; both
    * sides shuffle once on user_id. Probes earlier than the key's first
    * version survive with matched=false (the row a feature pipeline
    * must see, not silently drop). */
  def asOfLookup(events: DataFrame, lagS: Long = 3600): DataFrame = {
    val hist = build(events).select(
      col("user_id").as("h_user"), col("version"), col("attr_type"),
      col("attr_value"), col("effective_from_s"), col("effective_to_s"))
    val probes = events
      .withColumn("d", hexDigit("event_id", 1))
      .filter(col("d") < 4)
      .select(col("event_id"), col("user_id"), (epochS(col("ts")) - lagS).as("asof_s"))
    probes.join(hist,
        col("user_id") === col("h_user") &&
          col("effective_from_s") <= col("asof_s") &&
          (col("effective_to_s").isNull || col("asof_s") < col("effective_to_s")),
        "left")
      .select(col("event_id"), col("user_id"), col("asof_s"),
        col("version").isNotNull.as("matched"),
        col("version"), col("attr_type"), col("attr_value"), col("effective_from_s"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2_build" -> ((s, d) => build(Tables.events(s, d))),
    "q_scd2_incremental" -> ((s, d) => incremental(Tables.events(s, d))),
    "q_scd2_integrity" -> ((s, d) => integrity(Tables.events(s, d))),
    "q_scd2_asof" -> ((s, d) => asOfLookup(Tables.events(s, d)))
  )

  private val buildSql =
    """WITH h AS (
         SELECT *,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS effective_from_s,
           CAST(FLOOR(epoch(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS effective_to_s
         FROM events)
       SELECT
         md5(CAST(user_id AS VARCHAR) || '||' || CAST(epoch_us(ts) AS VARCHAR)) AS scd_key,
         user_id, event_id AS source_event_id,
         event_type AS attr_type, value AS attr_value, version,
         effective_from_s, epoch_us(ts) AS effective_from_us, effective_to_s,
         effective_to_s IS NULL AS is_current,
         CASE WHEN version = 1 THEN 'NEW' ELSE 'UPDATED' END AS change_reason,
         md5(COALESCE(event_type, '_graft_null_') || '|' || COALESCE(printf('%.2f', value), '_graft_null_')) AS change_hash
       FROM h ORDER BY user_id, version"""

  val oracles: Map[String, String] = Map(
    "q_scd2_build" -> buildSql,
    // incremental merge must equal the full rebuild — same oracle
    "q_scd2_incremental" -> buildSql,
    "q_scd2_asof" ->
      """WITH h AS (
           SELECT user_id AS h_user, event_type AS attr_type, value AS attr_value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS effective_from_s,
             CAST(FLOOR(epoch(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS effective_to_s
           FROM events),
         p AS (
           SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) - 3600 AS asof_s
           FROM events
           WHERE (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) < 4)
         SELECT p.event_id, p.user_id, p.asof_s,
           h.version IS NOT NULL AS matched,
           h.version, h.attr_type, h.attr_value, h.effective_from_s
         FROM p LEFT JOIN h
           ON p.user_id = h.h_user
           AND h.effective_from_s <= p.asof_s
           AND (h.effective_to_s IS NULL OR p.asof_s < h.effective_to_s)
         ORDER BY p.event_id""",
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
