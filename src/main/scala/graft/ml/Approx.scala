package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Fns._
import graft.functions.PrefixSum

/** Approximate sketches + time-range windows.
  *
  * At 100 TB, exact distinct counts and exact percentiles are shuffles
  * over the full key space; HLL and quantile sketches answer the same
  * profiling questions in one pass with bounded error — the scale path
  * for the reference's profiling/statistics features. Sketch internals
  * are engine-specific, so `q_approx_profile` cannot hash-compare the
  * raw estimates; instead it emits the EXACT answers (oracle-checkable)
  * plus boolean bound checks that the sketches landed within their
  * declared error — the oracle asserts those booleans are literally
  * TRUE, turning the sketch-error contract into a hash-gated row.
  */
object Approx {

  /** One-pass approximate profile of the event stream, emitted as an
    * oracle-comparable contract row:
    *
    *   - `exact_users` / `exact_values`: exact distinct counts (DuckDB
    *     computes the same values independently);
    *   - `exact_p50`: exact interpolated median via the distributed
    *     [[PrefixSum.exactPercentiles]] device (no single-reducer
    *     Percentile buffer), rounded to 6dp as the percentile oracles do;
    *   - `users_hll_ok` / `values_hll_ok`: HLL (rsd 0.02) estimate
    *     within 6% (3σ) of exact;
    *   - `p50_rank_ok` / `p90_rank_ok`: the approx_percentile(accuracy
    *     10000) value's RANK RUN [frac(<v), frac(≤v)] intersects
    *     p ± 0.005 — rank-space is the sketch's actual guarantee
    *     (1/accuracy), and the run form stays correct under heavy
    *     duplicate values.
    *
    * Everything non-scan is a broadcast of 1-row artifacts: two full
    * scans total (sketch+NDV aggregate, rank recount) plus the
    * percentile device's distinct shuffle. The sketch row feeds BOTH the
    * rank recount (broadcast) and the final row; the two embeddings are
    * identical subtrees, so Catalyst's ReuseExchange computes the
    * aggregate once and broadcasts it twice within the one action — an
    * eager localCheckpoint pin here was MEASURED 6× slower (it forces a
    * separate full materialization of the expand-heavy countDistinct
    * aggregate instead of the in-plan reuse; 0.75 s → 4.4 s at sf0.1),
    * and single-materialization reuse also means there is no racing-copy
    * divergence for the sketch values. */
  def approxProfile(events: DataFrame): DataFrame = {
    val sk = events.agg(
      // rsd 0.02 for BOTH sketches so the 6% (3σ) bound below is a real
      // three-sigma contract — the default rsd 0.05 under a 5% bound
      // would be a 1σ gate with a ~1/3 failure rate on regenerated data
      approx_count_distinct(col("user_id"), 0.02).as("au"),
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("value"), 0.02).as("av"),
      countDistinct(col("value")).as("exact_values"),
      expr("approx_percentile(value, 0.5, 10000)").as("ap50"),
      expr("approx_percentile(value, 0.9, 10000)").as("ap90"))
    val p50 = PrefixSum.exactPercentiles(
        events.select("value"), "value", Nil, Seq("p50_raw" -> 0.5))
      .select((floor(col("p50_raw") * 1e6 + 0.5) / 1e6).as("exact_p50"))
    val ranks = events.select("value").filter(col("value").isNotNull)
      .crossJoin(broadcast(sk.select("ap50", "ap90")))
      .agg(
        (sum(when(col("value") < col("ap50"), 1L).otherwise(0L)) /
          count(lit(1))).as("r50_lt"),
        (sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)) /
          count(lit(1))).as("r50_le"),
        (sum(when(col("value") < col("ap90"), 1L).otherwise(0L)) /
          count(lit(1))).as("r90_lt"),
        (sum(when(col("value") <= col("ap90"), 1L).otherwise(0L)) /
          count(lit(1))).as("r90_le"))
    def rankOk(lt: String, le: String, p: Double, tol: Double) =
      (col(lt) <= lit(p + tol)) && (col(le) >= lit(p - tol))
    sk.crossJoin(broadcast(p50)).crossJoin(broadcast(ranks))
      .select(
        col("exact_users"), col("exact_values"), col("exact_p50"),
        (abs(col("au") - col("exact_users")) <=
          col("exact_users") * 0.06).as("users_hll_ok"),
        (abs(col("av") - col("exact_values")) <=
          col("exact_values") * 0.06).as("values_hll_ok"),
        rankOk("r50_lt", "r50_le", 0.5, 0.005).as("p50_rank_ok"),
        rankOk("r90_lt", "r90_le", 0.9, 0.005).as("p90_rank_ok"))
  }

  /** Re-aggregatable distinct-count mart: per-(event_type, day) HLL
    * sketches (Apache DataSketches `hll_sketch_agg`, lgConfigK=14) rolled
    * up to the per-type total via `hll_union_agg` — the 100 TB pattern
    * for distinct-count marts. Exact COUNT(DISTINCT) does NOT
    * re-aggregate: the weekly/monthly/total numbers each need their own
    * full-shuffle over the raw keys, so a daily-refresh warehouse rescans
    * the corpus for every grain. Sketches are bounded byte blobs that
    * union associatively, so the daily sketch table is built ONCE per
    * day's partition and every coarser grain derives from sketch bytes
    * alone — no second touch of raw events, and the union is
    * partial-aggregated map-side like any other agg.
    *
    * Oracle contract (same device as [[approxProfile]]): the row carries
    * the EXACT per-type distinct count and the exact sum of per-day
    * distincts (both DuckDB-recomputable), plus `union_ok` asserting the
    * unioned-sketch estimate landed within 5% (lgK=14 ⇒ rsd 0.81%, so 5%
    * is > 6σ) or ±2 absolute for tiny groups. The exact columns exist to
    * hash-gate the contract at test SF; a production mart at 100 TB ships
    * only the sketch bytes and estimates. `sum_day_users ≥ exact_users`
    * is the cross-day overlap the union dedups — the number a naive
    * SUM-of-dailies rollup would get wrong. */
  /** Day-grain HLL state: per (event_type, day) the 14-bit sketch bytes
    * plus the exact daily distinct — the rows a daily job PERSISTS
    * (StorageSpec round-trips them through day-partitioned parquet and
    * pins rollup-from-files == direct rollup; the deployed shape: daily
    * job appends a state partition, the weekly job reads state only). */
  private[graft] def hllDaily(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        countDistinct(col("user_id")).as("du"))

  def hllRollup(events: DataFrame): DataFrame = {
    val daily = hllDaily(events)
    val rolled = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("du")).as("sum_day_users"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    rolled.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("sum_day_users"),
        col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double") <=
          greatest(col("exact_users") * lit(0.05), lit(2.0))).as("union_ok"))
      .orderBy("event_type")
  }

  /** Signed log-width bin of `value`: floor(log10(1+|v|)·20) with the
    * negative axis mirrored below -1 — ~12% relative bin width, the
    * fixed-size mergeable summary [[quantileState]] keys on. Shared by
    * state build and estimate so they can never drift. */
  private[graft] def qBin: Column =
    when(col("value") >= 0, floor(log10(col("value") + 1) * 20))
      .otherwise(lit(-1) - floor(log10(-col("value") + 1) * 20))
      .cast("long")

  /** Upper edge (in value space) of bin `b` — the quantile estimate for
    * a bin the cumulative count crosses. Monotone in b, so the first
    * crossing bin is recoverable as a MIN over qualifying edges. */
  private def qBinUpper(b: Column): Column =
    when(b >= 0, pow(lit(10d), (b + 1).cast("double") / 20d) - 1)
      .otherwise(-(pow(lit(10d), (-b - 1).cast("double") / 20d) - 1))

  /** Day-grain mergeable quantile state: per (event_type, day, bin) row
    * counts. This is the ONLY thing built from raw events — bounded at
    * types × days × (a few hundred log bins), it unions associatively
    * across days/partitions/corpus shards exactly like the HLL bytes in
    * [[hllRollup]]. */
  def quantileState(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"), qBin.as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Per-type p50/p95 estimates derived from day-grain state ONLY (no
    * raw-event access — the spec pins this by merging split-half states):
    * union the daily bins, one cumulative window over the ≤few-hundred
    * bins per type, estimate = upper edge of the first crossing bin. */
  def quantileEstimates(state: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val days = state.groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_days"), sum(col("n")).as("total"))
    state.groupBy(col("event_type"), col("bin"))
      .agg(sum(col("n")).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .join(days, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"), max(col("total")).as("n"),
        min(when(col("cum") >= col("total") * 0.5, qBinUpper(col("bin"))))
          .as("est_p50"),
        min(when(col("cum") >= col("total") * 0.95, qBinUpper(col("bin"))))
          .as("est_p95"))
  }

  /** Re-aggregatable QUANTILE mart — the quantile sibling of
    * [[hllRollup]]: exact per-type percentiles do not re-aggregate
    * (every coarser grain re-shuffles raw values), but the log-binned
    * day-grain state does — coarser grains derive from state rows
    * alone. Oracle contract (the [[approxProfile]] device): the row
    * carries the EXACT per-type p50/p95 (DuckDB-recomputable via
    * quantile_cont — the contract columns at test SF; a production mart
    * ships only the state and estimates) plus `p50_ok`/`p95_ok`
    * asserting the bin estimate landed within two log-bin widths
    * (0.35·(1+|exact|)) of exact. */
  def quantileRollup(events: DataFrame): DataFrame = {
    val est = quantileEstimates(quantileState(events))
    val exact = graft.functions.PrefixSum.exactPercentiles(
      events.filter(col("value").isNotNull)
        .select(col("event_type"), col("value")),
      "value", Seq("event_type"),
      Seq("xp50" -> 0.5, "xp95" -> 0.95)).drop("pct_n")
    def ok(e: String, x: String) =
      abs(col(e) - r6(col(x))) <= (abs(r6(col(x))) + 1d) * 0.35
    est.join(broadcast(exact.withColumnRenamed("event_type", "et_q")),
        col("event_type") <=> col("et_q"), "left")
      .select(col("event_type"), col("n_days"), col("n"),
        r6(col("xp50")).as("exact_p50"), r6(col("xp95")).as("exact_p95"),
        ok("est_p50", "xp50").as("p50_ok"), ok("est_p95", "xp95").as("p95_ok"))
      .orderBy("event_type")
  }

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
    "q_rolling_time_window" -> ((s, d) => rollingTimeWindow(Tables.events(s, d))),
    "q_hll_rollup" -> ((s, d) => hllRollup(Tables.events(s, d))),
    "q_quantile_rollup" -> ((s, d) => quantileRollup(Tables.events(s, d)))
  )

  // q_approx_profile's oracle computes the exact stats independently and
  // asserts the sketch-bound booleans literally TRUE — a hash mismatch
  // means either an exact-stat divergence or a sketch outside its
  // declared error. Sketches are deterministic in Spark, so the gate is
  // stable run-to-run.
  val oracles: Map[String, String] = Map(
    "q_approx_profile" ->
      """SELECT
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS exact_values,
           FLOOR(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS exact_p50,
           TRUE AS users_hll_ok, TRUE AS values_hll_ok,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
         FROM events""",
    "q_rolling_time_window" ->
      """WITH t AS (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, value FROM events)
         SELECT event_id, user_id, ts_s,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_last_1h
         FROM t
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    // Exact stats recomputed independently; union_ok asserted literally
    // TRUE (the sketch-error contract, as in q_approx_profile).
    "q_hll_rollup" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS du
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
           FROM events GROUP BY 1)
         SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d.du) AS BIGINT) AS sum_day_users,
           MAX(t.exact_users) AS exact_users,
           TRUE AS union_ok
         FROM daily d JOIN tot t ON d.event_type = t.event_type
         GROUP BY 1 ORDER BY 1""",
    // Exact percentiles recomputed independently; the bin-estimate
    // bound booleans asserted literally TRUE (the q_approx_profile
    // sketch-error contract device).
    "q_quantile_rollup" ->
      """SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS exact_p50,
           FLOOR(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000 AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
         FROM events WHERE value IS NOT NULL
         GROUP BY 1 ORDER BY 1"""
  )
}
