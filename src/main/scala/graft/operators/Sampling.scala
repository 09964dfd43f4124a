package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Sampling, dataset splits, multi-dim aggregates, and skew handling —
  * the selection layer of a training-data pipeline.
  *
  * Sampling is HASH-based, never rand(): the same row lands in the same
  * bucket on every run, every engine, every cluster size — reproducible
  * train/eval splits are non-negotiable for 100 TB training data (a
  * rand() sample is neither resumable nor auditable).
  */
object Sampling {

  /** 0..99 bucket from the first 4 hex digits of md5(key) — identical
    * arithmetic is expressible in any SQL engine. `key` is a column name
    * resolvable in the frame. Built on [[graft.functions.Fns.hexDigit]]
    * (the single shared digit source) so the sampling device can never
    * drift from the marts' deterministic-noise arithmetic. */
  def hashBucket(key: String): Column =
    pmod(hexDigit(key, 1) * 4096 + hexDigit(key, 2) * 256 +
      hexDigit(key, 3) * 16 + hexDigit(key, 4), lit(100))

  /** SQL twin of [[hashBucket]] for the oracle. */
  def hashBucketSql(key: String): String = {
    def hv(i: Int) = s"(strpos('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), $i, 1)) - 1)"
    s"((${hv(1)} * 4096 + ${hv(2)} * 256 + ${hv(3)} * 16 + ${hv(4)}) % 100)"
  }

  /** Deterministic p% document sample. */
  def hashSample(documents: DataFrame, pct: Int = 10): DataFrame =
    documents
      .withColumn("bucket", hashBucket("doc_id"))
      .filter(col("bucket") < pct)
      .select("doc_id", "bucket", "lang", "n_chars")
      .orderBy("doc_id")

  /** Reproducible train/val/test split (80/10/10). */
  def trainEvalSplit(documents: DataFrame): DataFrame =
    documents
      .withColumn("bucket", hashBucket("doc_id"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Stratified 20% sample: per-language totals vs sampled counts. */
  def stratifiedSample(documents: DataFrame, pct: Int = 20): DataFrame =
    documents
      .withColumn("bucket", hashBucket("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("bucket") < pct, 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("sample_ratio", r4(col("n_sampled") / col("n_total")))
      .orderBy("lang")

  /** Exact quartiles of event value per event type — distributed via
    * [[graft.functions.PrefixSum.exactPercentiles]] (grouped cumulative
    * counts, range-bucketed past the NDV threshold) rather than
    * `percentile(value, …)`, whose per-group value→count buffer sits on
    * one reducer and scales with the group's NDV. */
  def groupPercentiles(events: DataFrame): DataFrame = {
    val qs = graft.functions.PrefixSum.exactPercentiles(
      events.select(col("event_type"), col("value")), "value", Seq("event_type"),
      Seq("p25_0" -> 0.25, "p50_0" -> 0.5, "p75_0" -> 0.75)).drop("pct_n")
    // null-safe join: a NULL event_type is a real group to groupBy (and
    // to the percentile aggregate this replaces) in both engines
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .join(broadcast(qs.withColumnRenamed("event_type", "et_q")),
        col("event_type") <=> col("et_q"), "left")
      .drop("et_q")
      .select(col("event_type"),
        r6(col("p25_0")).as("p25"), r6(col("p50_0")).as("p50"),
        r6(col("p75_0")).as("p75"), col("n"))
      .orderBy("event_type")
  }

  /** CUBE over (region, market segment): every subtotal combination with
    * grouping ids. */
  def cubeRevenue(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        decSum(col("c_acctbal")).as("sum_acctbal"),
        grouping_id().as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("n_customers"), col("sum_acctbal"), col("gid").cast("int").as("gid"))
      .orderBy("gid", "region_name", "segment")

  /** Leakage-safe GROUPED train/val/test split: the split key is the
    * GROUP (user), not the row — every event of a user lands in the same
    * split, the property that keeps eval honest when rows within a group
    * are correlated (the classic leakage bug a row-level split has).
    * Same md5 bucket arithmetic as [[trainEvalSplit]], applied to
    * user_id; emits the per-split audit row (users / events / value
    * mass / shares). One hash aggregation; the user count is exact
    * because user→split is functional. */
  def groupSplit(events: DataFrame): DataFrame = {
    val tagged = events
      .withColumn("bucket", hashBucket("user_id"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
    val perSplit = tagged.groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))
    val total = perSplit.agg(sum(col("n_events")).as("t_events"))
    perSplit.crossJoin(broadcast(total))
      .select(col("split"), col("n_users"), col("n_events"), col("sum_value"),
        r6(col("n_events").cast("double") / col("t_events")).as("event_share"))
      .orderBy("split")
  }

  /** Skew-safe salted join: the build side is replicated `salts` ways and
    * the probe side scatters across the replicas, so one hot key spreads
    * over `salts` tasks. Result is identical to the plain join (the
    * oracle runs the plain join). */
  def saltedJoin(orders: DataFrame, customer: DataFrame, salts: Int = 8): DataFrame = {
    val saltedCust = customer.select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val saltedOrders = orders.select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("salt", pmod(col("o_orderkey"), lit(salts)).cast("int"))
    saltedOrders.join(saltedCust,
        col("o_custkey") === col("c_custkey") && saltedOrders("salt") === saltedCust("salt"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("revenue"))
      .orderBy("segment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hash_sample" -> ((s, d) => hashSample(Tables.documents(s, d))),
    "q_train_eval_split" -> ((s, d) => trainEvalSplit(Tables.documents(s, d))),
    "q_stratified_sample" -> ((s, d) => stratifiedSample(Tables.documents(s, d))),
    "q_group_percentiles" -> ((s, d) => groupPercentiles(Tables.events(s, d))),
    "q_cube" -> ((s, d) => cubeRevenue(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q_salted_join" -> ((s, d) => saltedJoin(Tables.orders(s, d), Tables.customer(s, d))),
    "q_group_split" -> ((s, d) => groupSplit(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_hash_sample" ->
      s"""SELECT doc_id, CAST(${hashBucketSql("doc_id")} AS INT) AS bucket, lang, n_chars
         FROM documents WHERE ${hashBucketSql("doc_id")} < 10 ORDER BY doc_id""",
    "q_train_eval_split" ->
      s"""SELECT doc_id, CAST(${hashBucketSql("doc_id")} AS INT) AS bucket,
           CASE WHEN ${hashBucketSql("doc_id")} < 80 THEN 'train'
                WHEN ${hashBucketSql("doc_id")} < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q_stratified_sample" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN ${hashBucketSql("doc_id")} < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           FLOOR((CAST(SUM(CASE WHEN ${hashBucketSql("doc_id")} < 20 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS sample_ratio
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_group_percentiles" ->
      """SELECT event_type,
           FLOOR(quantile_cont(value, 0.25) * 1000000 + 0.5) / 1000000 AS p25,
           FLOOR(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
           FLOOR(quantile_cont(value, 0.75) * 1000000 + 0.5) / 1000000 AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_cube" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal,
           CAST(GROUPING(r_name, c_mktsegment) AS INT) AS gid
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE(r_name, c_mktsegment)
         ORDER BY gid, region_name, segment""",
    "q_salted_join" ->
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_group_split" ->
      s"""WITH t AS (
           SELECT user_id, value,
             CASE WHEN ${hashBucketSql("user_id")} < 80 THEN 'train'
                  WHEN ${hashBucketSql("user_id")} < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM events),
         g AS (SELECT split,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           FROM t GROUP BY split),
         tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t_events FROM g)
         SELECT split, n_users, n_events, sum_value,
           ${sqlR("CAST(n_events AS DOUBLE) / t_events", 6)} AS event_share
         FROM g, tot ORDER BY split"""
  )
}
