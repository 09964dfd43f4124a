package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Fns._

/** Warehouse core: staging cleanse, conformed dimensions, fact builds,
  * merge semantics, surrogate keys, CDC hashes.
  *
  * Re-expresses the dbt layer of the reference
  * (/root/reference/models/staging/staging_customers.sql,
  * /root/reference/models/marts/facts/fact_sales_daily.sql,
  * /root/reference/macros/generate_fact_tables.sql) as composable
  * DataFrame -> DataFrame transforms. All logic is declarative so Catalyst
  * handles pushdown/pruning; dimension joins are explicitly broadcast.
  */
object Warehouse {

  /** Staging cleanse — trim/case normalization, data-quality flag, tier
    * bucketing (staging_customers.sql:10-46,105-119). */
  def stagingClean(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      upper(trim(col("c_name"))).as("name_clean"),
      col("c_nationkey"),
      col("c_acctbal").as("acctbal"),
      upper(trim(col("c_mktsegment"))).as("segment"),
      when(col("c_name").isNull || trim(col("c_name")) === "", "MISSING_NAME")
        .when(col("c_acctbal").isNull, "MISSING_BALANCE")
        .otherwise("VALID").as("dq_flag"),
      when(col("c_acctbal") < 0, "NEGATIVE")
        .when(col("c_acctbal") < 1000, "LOW")
        .when(col("c_acctbal") < 5000, "MEDIUM")
        .otherwise("HIGH").as("balance_tier")
    ).orderBy("c_custkey")

  /** The reference's FULL staging cleanse surface
    * (staging_customers.sql:17,40,48-50,58-100): regexp email validation,
    * phone regexp scrubbing, test-record filtering, datediff age/tenure +
    * age-group bucketing, coalesce-concat address assembly, lifecycle
    * CASE. TPC-H customer lacks email/birth/address-part columns, so the
    * raw inputs are synthesized DETERMINISTICALLY from existing columns
    * (c_custkey residues pick the branch — same approach as
    * Multimodal.assets); the cleansing operators themselves are the
    * engine surface under test. Dates are measured against a fixed as-of
    * (1998-12-01, the TPC-H convention) instead of current_date so runs
    * are reproducible. All row-wise expressions — shuffle-free at any
    * scale. */
  def stagingEnhanced(customer: DataFrame): DataFrame = {
    val asof = to_date(lit("1998-12-01"))
    val raw = customer.select(
      col("c_custkey"),
      when(pmod(col("c_custkey"), lit(101)) === 0, concat(lit("TEST_"), col("c_name")))
        .otherwise(col("c_name")).as("raw_name"),
      when(pmod(col("c_custkey"), lit(7)) === 0, // dropped '@' -> fails validation
        concat(regexp_replace(lower(trim(col("c_name"))), "#", ""), lit(".example.com")))
        .otherwise(concat(regexp_replace(lower(trim(col("c_name"))), "#", "."),
          lit("@example.com"))).as("raw_email"),
      // testdata customer has no phone/address columns — synthesize both
      concat(lit("+"), pmod(col("c_custkey"), lit(90)) + 10, lit("-"),
        lpad(pmod(col("c_custkey") * 7, lit(10000000)).cast("string"), 7, "0"),
        lit(" x"), pmod(col("c_custkey"), lit(100))).as("raw_phone"),
      date_add(to_date(lit("1950-01-01")),
        pmod(col("c_custkey") * 13, lit(17000)).cast("int")).as("birth_date"),
      date_add(to_date(lit("1992-01-01")),
        pmod(col("c_custkey") * 37, lit(2500)).cast("int")).as("customer_since_date"),
      trim(concat(pmod(col("c_custkey"), lit(9999)) + 1, lit(" Main St  "))).as("address_line1"),
      when(pmod(col("c_custkey"), lit(3)) === 0,
        concat(lit("Suite "), pmod(col("c_custkey"), lit(90)))).as("address_line2"),
      concat(lit("CITY "), pmod(col("c_custkey"), lit(50))).as("city0"),
      when(pmod(col("c_custkey"), lit(5)) =!= 0,
        concat(lit("ST"), pmod(col("c_custkey"), lit(27)))).as("state0"),
      lpad(pmod(col("c_custkey"), lit(100000)).cast("string"), 5, "0").as("postal_code"),
      when(pmod(col("c_custkey"), lit(11)) === 0, "INACTIVE")
        .when(pmod(col("c_custkey"), lit(17)) === 0, "PENDING")
        .otherwise("ACTIVE").as("customer_status"))
    val cleaned = raw
      .filter(col("c_custkey").isNotNull &&
        !col("raw_name").like("TEST\\_%") &&
        !lower(col("raw_name")).like("%test%"))
      .select(
        col("c_custkey").as("customer_id"),
        trim(upper(col("raw_name"))).as("customer_name"),
        lower(trim(col("raw_email"))).as("email_address"),
        regexp_replace(col("raw_phone"), "[^0-9+()-]", "").as("phone_number"),
        col("birth_date"), col("customer_since_date"),
        col("address_line1"), col("address_line2"),
        upper(trim(col("city0"))).as("city"),
        upper(trim(col("state0"))).as("state_province"),
        col("postal_code"), col("customer_status"),
        when(col("raw_name").isNull || trim(col("raw_name")) === "", "MISSING_NAME")
          .when(col("raw_email").isNull ||
            !col("raw_email").rlike("^[^@]+@[^@]+\\.[^@]+$"), "INVALID_EMAIL")
          .otherwise("VALID").as("data_quality_flag"))
    val age = year(asof) - year(col("birth_date"))
    cleaned
      .withColumn("customer_age", age)
      .withColumn("customer_tenure_years", year(asof) - year(col("customer_since_date")))
      .withColumn("age_group",
        when(col("birth_date").isNull, "Unknown")
          .when(age < 25, "18-24").when(age < 35, "25-34")
          .when(age < 45, "35-44").when(age < 55, "45-54")
          .when(age < 65, "55-64").otherwise("65+"))
      .withColumn("full_address", concat(
        coalesce(col("address_line1"), lit("")),
        when(col("address_line2").isNotNull && trim(col("address_line2")) =!= "",
          concat(lit(", "), col("address_line2"))).otherwise(""),
        when(col("city").isNotNull, concat(lit(", "), col("city"))).otherwise(""),
        when(col("state_province").isNotNull,
          concat(lit(", "), col("state_province"))).otherwise(""),
        when(col("postal_code").isNotNull,
          concat(lit(" "), col("postal_code"))).otherwise("")))
      .withColumn("customer_lifecycle_stage",
        when(col("customer_status") === "ACTIVE" &&
          col("customer_since_date") >= date_sub(asof, 90), "NEW")
          .when(col("customer_status") === "ACTIVE" &&
            col("customer_since_date") < date_sub(asof, 365), "LOYAL")
          .when(col("customer_status") === "ACTIVE", "ESTABLISHED")
          .when(col("customer_status") === "INACTIVE", "CHURNED")
          .otherwise("UNKNOWN"))
      .orderBy("customer_id")
  }

  /** Conformed customer dimension: cleansed attributes + geography rollup.
    * nation/region are broadcast — at 100 TB these stay tiny dims.
    * (dim_customer.sql) */
  def dimCustomer(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    stagingClean(customer)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        surrogateKey(col("c_custkey")).as("dim_customer_key"),
        col("c_custkey"), col("name_clean"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        col("segment"), col("balance_tier"))
      .orderBy("c_custkey")

  /** Fact build: surrogate key, dimension FKs, measure casting, derived
    * measures, row hash, business-rule filter (fact_sales_daily.sql). */
  def factSales(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.filter(col("l_quantity") > 0 && col("l_extendedprice") >= 0)
    li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        surrogateKey(col("l_orderkey"), col("l_linenumber")).as("fact_key"),
        col("l_orderkey"), col("l_linenumber"),
        col("o_custkey").as("customer_key"),
        col("l_partkey").as("part_key"),
        col("l_suppkey").as("supplier_key"),
        to_date(col("l_shipdate")).as("date_key"),
        col("l_quantity").cast("int").as("quantity"),
        col("l_extendedprice").as("gross_revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_revenue"),
        col("l_discount").as("discount_rate"),
        r4(col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        rowHash(col("l_orderkey"), col("l_linenumber"),
          fmt2(col("l_quantity")), fmt2(col("l_extendedprice")),
          fmt2(col("l_discount"))).as("row_hash"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Daily/monthly grain rollup of the sales fact (TPC-H Q1 shape, the
    * grain of fact_sales_daily). Exact decimal sums — deterministic under
    * any partitioning. */
  def factDailyAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("ship_month"),
        col("l_returnflag"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        r4(sum(col("l_quantity").cast("decimal(18,4)")).cast("double") / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("ship_month", "l_returnflag")

  /** Star-schema rollup: fact ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * nation/region broadcast. The fact is pre-aggregated to ORDER grain
    * before any join: the groupBy shuffles on the same l_orderkey the
    * orders join needs anyway, so the join sees one row per order, the
    * customer-side shuffle moves ~4× fewer rows, and the former
    * countDistinct(o_orderkey) — a whole-fact Expand + second shuffle —
    * becomes a plain count of pre-deduped rows. Revenue partials are
    * exact DECIMAL sums, so two-level summation is bit-identical to the
    * single-level [[decSum]] at any scale. */
  def starJoin(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
               nation: DataFrame, region: DataFrame): DataFrame = {
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("rev"),
        count(lit(1)).as("nl"))
    perOrder
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        sum(col("nl")).as("n_lines"))
      .orderBy("region_name", "nation_name")
  }

  /** Merge/upsert semantics of incremental_strategy='merge': latest record
    * per business key wins (row_number over update time desc). One shuffle
    * on the merge key. */
  def incrementalMerge(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"),
        epochS(col("ts")).as("last_ts_s"))
      .orderBy("user_id")
  }

  /** Surrogate-key generation patterns (dbt_utils.generate_surrogate_key). */
  def surrogateKeys(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      surrogateKey(col("o_orderkey")).as("sk_single"),
      surrogateKey(col("o_orderkey"), col("o_custkey")).as("sk_composite"),
      surrogateKey(col("o_orderkey"), to_date(col("o_orderdate"))).as("sk_dated"))
      .orderBy("o_orderkey")

  /** Row-content hash for change detection (scd_type2_macro change_hash). */
  def rowHashCdc(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      rowHash(col("c_name"), col("c_nationkey"), fmt2(col("c_acctbal")),
        col("c_mktsegment")).as("row_hash"))
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_staging_clean" -> ((s, d) => stagingClean(Tables.customer(s, d))),
    "q_staging_enhanced" -> ((s, d) => stagingEnhanced(Tables.customer(s, d))),
    "q_dim_customer" -> ((s, d) =>
      dimCustomer(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q_fact_sales" -> ((s, d) => factSales(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q_fact_daily_agg" -> ((s, d) => factDailyAgg(Tables.lineitem(s, d))),
    "q_star_join" -> ((s, d) =>
      starJoin(Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q_incremental_merge" -> ((s, d) => incrementalMerge(Tables.events(s, d))),
    "q_surrogate_keys" -> ((s, d) => surrogateKeys(Tables.orders(s, d))),
    "q_row_hash_cdc" -> ((s, d) => rowHashCdc(Tables.customer(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "q_staging_clean" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_clean, c_nationkey,
         c_acctbal AS acctbal, upper(trim(c_mktsegment)) AS segment,
         CASE WHEN c_name IS NULL OR trim(c_name) = '' THEN 'MISSING_NAME'
              WHEN c_acctbal IS NULL THEN 'MISSING_BALANCE'
              ELSE 'VALID' END AS dq_flag,
         CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
              WHEN c_acctbal < 1000 THEN 'LOW'
              WHEN c_acctbal < 5000 THEN 'MEDIUM'
              ELSE 'HIGH' END AS balance_tier
         FROM customer ORDER BY c_custkey""",
    "q_staging_enhanced" ->
      """WITH raw AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 101 = 0 THEN 'TEST_' || c_name ELSE c_name END AS raw_name,
             CASE WHEN c_custkey % 7 = 0 THEN replace(lower(trim(c_name)), '#', '') || '.example.com'
                  ELSE replace(lower(trim(c_name)), '#', '.') || '@example.com' END AS raw_email,
             '+' || CAST(c_custkey % 90 + 10 AS VARCHAR) || '-'
               || lpad(CAST((c_custkey * 7) % 10000000 AS VARCHAR), 7, '0')
               || ' x' || CAST(c_custkey % 100 AS VARCHAR) AS raw_phone,
             DATE '1950-01-01' + CAST((c_custkey * 13) % 17000 AS INT) AS birth_date,
             DATE '1992-01-01' + CAST((c_custkey * 37) % 2500 AS INT) AS customer_since_date,
             trim(CAST(c_custkey % 9999 + 1 AS VARCHAR) || ' Main St  ') AS address_line1,
             CASE WHEN c_custkey % 3 = 0 THEN 'Suite ' || CAST(c_custkey % 90 AS VARCHAR) END AS address_line2,
             'CITY ' || CAST(c_custkey % 50 AS VARCHAR) AS city0,
             CASE WHEN c_custkey % 5 <> 0 THEN 'ST' || CAST(c_custkey % 27 AS VARCHAR) END AS state0,
             lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS postal_code,
             CASE WHEN c_custkey % 11 = 0 THEN 'INACTIVE'
                  WHEN c_custkey % 17 = 0 THEN 'PENDING'
                  ELSE 'ACTIVE' END AS customer_status
           FROM customer),
         src AS (
           SELECT c_custkey AS customer_id,
             trim(upper(raw_name)) AS customer_name,
             lower(trim(raw_email)) AS email_address,
             regexp_replace(raw_phone, '[^0-9+()-]', '', 'g') AS phone_number,
             birth_date, customer_since_date, address_line1, address_line2,
             upper(trim(city0)) AS city, upper(trim(state0)) AS state_province,
             postal_code, customer_status,
             CASE WHEN raw_name IS NULL OR trim(raw_name) = '' THEN 'MISSING_NAME'
                  WHEN raw_email IS NULL OR NOT regexp_matches(raw_email, '^[^@]+@[^@]+\.[^@]+$') THEN 'INVALID_EMAIL'
                  ELSE 'VALID' END AS data_quality_flag
           FROM raw
           WHERE c_custkey IS NOT NULL
             AND raw_name NOT LIKE 'TEST\_%' ESCAPE '\'
             AND NOT lower(raw_name) LIKE '%test%')
         SELECT *,
           year(DATE '1998-12-01') - year(birth_date) AS customer_age,
           year(DATE '1998-12-01') - year(customer_since_date) AS customer_tenure_years,
           CASE WHEN birth_date IS NULL THEN 'Unknown'
                WHEN year(DATE '1998-12-01') - year(birth_date) < 25 THEN '18-24'
                WHEN year(DATE '1998-12-01') - year(birth_date) < 35 THEN '25-34'
                WHEN year(DATE '1998-12-01') - year(birth_date) < 45 THEN '35-44'
                WHEN year(DATE '1998-12-01') - year(birth_date) < 55 THEN '45-54'
                WHEN year(DATE '1998-12-01') - year(birth_date) < 65 THEN '55-64'
                ELSE '65+' END AS age_group,
           coalesce(address_line1, '')
             || CASE WHEN address_line2 IS NOT NULL AND trim(address_line2) <> ''
                     THEN ', ' || address_line2 ELSE '' END
             || CASE WHEN city IS NOT NULL THEN ', ' || city ELSE '' END
             || CASE WHEN state_province IS NOT NULL THEN ', ' || state_province ELSE '' END
             || CASE WHEN postal_code IS NOT NULL THEN ' ' || postal_code ELSE '' END
             AS full_address,
           CASE WHEN customer_status = 'ACTIVE' AND customer_since_date >= DATE '1998-12-01' - 90 THEN 'NEW'
                WHEN customer_status = 'ACTIVE' AND customer_since_date < DATE '1998-12-01' - 365 THEN 'LOYAL'
                WHEN customer_status = 'ACTIVE' THEN 'ESTABLISHED'
                WHEN customer_status = 'INACTIVE' THEN 'CHURNED'
                ELSE 'UNKNOWN' END AS customer_lifecycle_stage
         FROM src ORDER BY customer_id""",
    "q_dim_customer" ->
      """SELECT md5(CAST(c_custkey AS VARCHAR)) AS dim_customer_key,
         c_custkey, upper(trim(c_name)) AS name_clean,
         n_name AS nation_name, r_name AS region_name,
         upper(trim(c_mktsegment)) AS segment,
         CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
              WHEN c_acctbal < 1000 THEN 'LOW'
              WHEN c_acctbal < 5000 THEN 'MEDIUM'
              ELSE 'HIGH' END AS balance_tier
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q_fact_sales" ->
      """SELECT md5(CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS fact_key,
         l_orderkey, l_linenumber, o_custkey AS customer_key,
         l_partkey AS part_key, l_suppkey AS supplier_key,
         CAST(l_shipdate AS DATE) AS date_key,
         CAST(l_quantity AS INT) AS quantity,
         l_extendedprice AS gross_revenue,
         l_extendedprice * (1 - l_discount) AS net_revenue,
         l_discount AS discount_rate,
         FLOOR((l_extendedprice / l_quantity) * 10000 + 0.5) / 10000 AS unit_price,
         md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
             || '|' || printf('%.2f', l_quantity) || '|' || printf('%.2f', l_extendedprice)
             || '|' || printf('%.2f', l_discount)) AS row_hash
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 0 AND l_extendedprice >= 0
         ORDER BY l_orderkey, l_linenumber""",
    "q_fact_daily_agg" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
         l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
         COUNT(*) AS n_lines
         FROM lineitem
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_star_join" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         COUNT(DISTINCT o_orderkey) AS n_orders,
         COUNT(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_incremental_merge" ->
      """SELECT user_id, event_type AS last_event_type, value AS last_value,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS last_ts_s
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q_surrogate_keys" ->
      """SELECT o_orderkey,
         md5(CAST(o_orderkey AS VARCHAR)) AS sk_single,
         md5(CAST(o_orderkey AS VARCHAR) || '||' || CAST(o_custkey AS VARCHAR)) AS sk_composite,
         md5(CAST(o_orderkey AS VARCHAR) || '||' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS sk_dated
         FROM orders ORDER BY o_orderkey""",
    "q_row_hash_cdc" ->
      """SELECT c_custkey,
         md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|'
             || printf('%.2f', c_acctbal) || '|' || c_mktsegment) AS row_hash
         FROM customer ORDER BY c_custkey"""
  )
}
