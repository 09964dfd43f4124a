package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Catalog.{ColumnRule, TablePolicy}

/** Catalog-policy masking — applies the `security:` section of the
  * bundled catalog (the engine twin of the reference's
  * governance/data_catalog.yml:706-717 `row_level_security` /
  * `column_masking` / `data_classification` declarations, which the
  * reference leaves as config with no executor). [[Quality.kAnonymity]]
  * and the PII scrub compute governance SIGNALS; this object is the
  * enforcement half: the policy file names columns and rules, and
  * [[maskTable]] produces the projection an analyst role is allowed to
  * see.
  *
  * Rules (all row-local, engine-reproducible):
  *   - `hash`: md5 of the string form — deterministic pseudonymization
  *     that preserves cardinality and joinability (two masked tables
  *     still join on the masked key).
  *   - `redact`: the '[REDACTED]' literal; NULL stays NULL so
  *     completeness metrics survive masking.
  *   - `band`: floor-to-1000 value band as a string label — coarse
  *     enough to kill re-identification, ordered enough for cohorting.
  *
  * Scale shape: masking is a SELECT of row-local expressions plus the
  * declared RLS filter — no shuffle, no aggregate, fully codegen'd, so
  * it composes with any downstream plan at 100 TB unchanged (the
  * events policy masks a fact-scale column to prove exactly that). The
  * audit is one aggregate scan per policy table emitting a bounded
  * |columns| frame; the masked-cardinality check (hash preserves NDV,
  * redact collapses it) is the property a governance review signs off.
  */
object Masking {

  /** The masked form of one policy column. Unknown rules fail at plan
    * build, not silently pass-through — a policy typo must not ship an
    * unmasked PII column. */
  def maskColumn(rule: ColumnRule): Column = rule.rule match {
    case "hash" => md5(col(rule.column).cast("string"))
    case "redact" => when(col(rule.column).isNotNull, lit("[REDACTED]"))
    case "band" => when(col(rule.column).isNotNull,
      concat(lit("band_"),
        (floor(col(rule.column).cast("double") / 1000d).cast("long") * 1000L)
          .cast("string")))
    case other => throw new IllegalArgumentException(
      s"unknown masking rule '$other' for column ${rule.column}")
  }

  /** Apply one table's policy: RLS row filter, then every declared
    * column replaced by its masked form IN PLACE (same name, same
    * position — downstream queries keep working against the masked
    * view). Columns the policy doesn't name pass through untouched. */
  def maskTable(df: DataFrame, policy: TablePolicy): DataFrame = {
    val ruleMap = policy.rules.map(r => r.column -> r).toMap
    val missing = ruleMap.keySet -- df.columns.toSet
    require(missing.isEmpty,
      s"policy for ${policy.table} names absent columns: ${missing.mkString(", ")}")
    val filtered = policy.rowFilter.map(df.filter).getOrElse(df)
    filtered.select(df.columns.toSeq.map(c =>
      ruleMap.get(c).map(r => maskColumn(r).as(c)).getOrElse(col(c))): _*)
  }

  /** The bundled policy for one logical source, by name. */
  def policy(table: String): TablePolicy =
    Catalog.default.policies.find(_.table == table)
      .getOrElse(throw new NoSuchElementException(s"no security policy for '$table'"))

  /** The analyst-facing masked customer table per the bundled catalog
    * policy — the user-visible entry point the oracle hash-verifies
    * end-to-end (RLS filter + hash + band applied). */
  def maskedCustomer(spark: SparkSession, dir: String): DataFrame =
    maskTable(Catalog.sources(spark, dir)("customer"), policy("customer"))
      .orderBy("c_custkey")

  /** Per-column masking audit over every policy table: row counts under
    * RLS, non-null counts, and distinct cardinality before vs after
    * masking — `hash` must preserve it, `redact` must collapse it to
    * ≤1, `band` must compress it. One aggregate scan per table. */
  def maskAudit(spark: SparkSession, dir: String): DataFrame = {
    val srcs = Catalog.sources(spark, dir)
    val rows = Catalog.default.policies.flatMap { p =>
      val filtered = p.rowFilter.map(srcs(p.table).filter).getOrElse(srcs(p.table))
      val aggs = count(lit(1)).as("n_rows") +: p.rules.flatMap { r => Seq(
        count(col(r.column)).as(s"nn_${r.column}"),
        countDistinct(col(r.column)).as(s"d0_${r.column}"),
        countDistinct(maskColumn(r)).as(s"d1_${r.column}")) }
      val agg = filtered.agg(aggs.head, aggs.tail: _*)
      p.rules.map { r =>
        agg.select(
          lit(p.table).as("table_name"),
          lit(r.column).as("column_name"),
          lit(r.classification).as("classification"),
          lit(r.rule).as("rule"),
          col("n_rows"),
          col(s"nn_${r.column}").as("n_nonnull"),
          col(s"d0_${r.column}").as("n_distinct_orig"),
          col(s"d1_${r.column}").as("n_distinct_masked"))
      }
    }
    rows.reduce(_.unionByName(_)).orderBy("table_name", "column_name")
  }

  /** Glob → anchored regex (the catalog's table patterns: `*` any run,
    * `?` any one char, everything else literal). */
  private def globRegex(pat: String): String =
    "^" + pat.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  /** Effective-permission matrix: every declared access_controls role
    * expanded against every catalog-declared table — the audit view a
    * governance review reads (and the grant script a deployment
    * generates its GRANTs from). Pure catalog metadata, bounded by
    * |roles|×|tables|; the frame is built driver-side like the date
    * dimension is built from its config. */
  def accessMatrix(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val tables =
      Catalog.default.facts.map(f => (f.config.name, "fact")) ++
        Catalog.default.dims.map(d => (d.config.name, "dim"))
    accessMatrixFor(Catalog.default.access, tables)
      .toDF("role", "table_name", "kind", "can_read", "can_write")
      .orderBy("role", "table_name")
  }

  /** The pure expansion behind [[accessMatrix]] (exposed for direct
    * testing of the glob semantics). */
  def accessMatrixFor(rules: Seq[Catalog.AccessRule],
                      tables: Seq[(String, String)])
      : Seq[(String, String, String, Boolean, Boolean)] =
    for {
      r <- rules
      (name, kind) <- tables
    } yield {
      val visible = r.tables.exists(p => name.matches(globRegex(p)))
      (r.role, name, kind,
        visible && r.permissions.contains("read"),
        visible && r.permissions.contains("write"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog_mask" -> ((s, d) => maskedCustomer(s, d)),
    "q_mask_audit" -> ((s, d) => maskAudit(s, d)),
    "q_access_matrix" -> ((s, _) => accessMatrix(s))
  )

  // Hand-written SQL twins of the bundled policy — independent of the
  // YAML parser and the rule engine, so a hash match proves the policy
  // file was read and applied exactly.
  val oracles: Map[String, String] = Map(
    "q_access_matrix" ->
      """WITH t AS (SELECT * FROM (VALUES
           ('fact_sales','fact'),('fact_orders','fact'),('fact_events','fact'),
           ('fact_shipping','fact'),('fact_part_pricing','fact'),
           ('fact_supplier_balance','fact'),('fact_customer_balance','fact'),
           ('fact_returns','fact'),('fact_discounted_sales','fact'),
           ('fact_taxed_lineitems','fact'),('fact_bulk_lineitems','fact'),
           ('fact_open_orders','fact'),('fact_finished_orders','fact'),
           ('fact_urgent_orders','fact'),('fact_purchase_events','fact'),
           ('fact_doc_volume','fact'),('fact_sales_daily','fact'),
           ('fact_user_daily','fact'),
           ('dim_customer','dim'),('dim_part','dim'),('dim_supplier','dim'),
           ('dim_document','dim'),('dim_nation','dim'),('dim_region','dim'),
           ('dim_order','dim'),('dim_event','dim'),('dim_embedding','dim'),
           ('dim_doc_source','dim'),('dim_part_size','dim'),
           ('dim_supplier_nation','dim'),('dim_date','dim'),
           ('dim_geography','dim')) AS v(table_name, kind))
         SELECT role, table_name, kind, can_read, can_write FROM (
           SELECT 'analyst' AS role, table_name, kind,
             (table_name LIKE 'fact!_%' ESCAPE '!'
               OR table_name LIKE 'dim!_%' ESCAPE '!') AS can_read,
             false AS can_write
           FROM t
           UNION ALL
           SELECT 'data_engineer', table_name, kind, true, true FROM t
         ) ORDER BY role, table_name""",
    "q_catalog_mask" ->
      """SELECT c_custkey,
           md5(CAST(c_name AS VARCHAR)) AS c_name,
           c_nationkey,
           CASE WHEN c_acctbal IS NOT NULL
             THEN 'band_' || CAST(CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) * 1000 AS VARCHAR)
             END AS c_acctbal,
           c_mktsegment
         FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey""",
    "q_mask_audit" ->
      """SELECT * FROM (
         SELECT 'customer' AS table_name, 'c_acctbal' AS column_name,
           'sensitive' AS classification, 'band' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(c_acctbal) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS n_distinct_orig,
           CAST(COUNT(DISTINCT CASE WHEN c_acctbal IS NOT NULL
             THEN 'band_' || CAST(CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) * 1000 AS VARCHAR) END) AS BIGINT) AS n_distinct_masked
         FROM customer WHERE c_acctbal >= 0
         UNION ALL
         SELECT 'customer', 'c_name', 'pii', 'hash',
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(c_name) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT),
           CAST(COUNT(DISTINCT md5(CAST(c_name AS VARCHAR))) AS BIGINT)
         FROM customer WHERE c_acctbal >= 0
         UNION ALL
         SELECT 'events', 'user_id', 'pii', 'hash',
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(COUNT(DISTINCT md5(CAST(user_id AS VARCHAR))) AS BIGINT)
         FROM events
         UNION ALL
         SELECT 'supplier', 's_acctbal', 'sensitive', 'band',
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(s_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT s_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN s_acctbal IS NOT NULL
             THEN 'band_' || CAST(CAST(FLOOR(CAST(s_acctbal AS DOUBLE) / 1000) AS BIGINT) * 1000 AS VARCHAR) END) AS BIGINT)
         FROM supplier
         UNION ALL
         SELECT 'supplier', 's_name', 'pii', 'redact',
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(s_name) AS BIGINT),
           CAST(COUNT(DISTINCT s_name) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN s_name IS NOT NULL THEN '[REDACTED]' END) AS BIGINT)
         FROM supplier
         ) ORDER BY table_name, column_name"""
  )
}
