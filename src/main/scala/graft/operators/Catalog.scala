package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

import graft.Tables
import graft.functions.Fns._

/** Catalog-FILE-driven table generation — the missing half of the
  * reference's governance loop: governance/data_catalog.yml declares the
  * full fact/dim surface ("32 fact / 128 dim") and
  * scripts/utilities/generate_fact_dimension_models.py stamps a model
  * per entry. [[ConfigFacts]] proved the generation mechanism equals the
  * hand-written tables; this object closes the loop by PARSING a
  * catalog file (src/main/resources/graft_catalog.yml, bundled with the
  * library) into [[FactConfig]]/[[DimConfig]] values and generating
  * every declared table from the file alone — adding table #5 is a YAML
  * edit, not code.
  *
  * `q_catalog_sweep` materializes one audit row per declared table
  * (row count, distinct-key count, exact decimal sum of the declared
  * summary measure) so the driver's DuckDB oracle hash-verifies the
  * whole catalog-generated surface against independently hand-written
  * SQL in one query. Scale shape: one fully-parallel aggregate scan per
  * source table, 32 one-row frames unioned — the nightly
  * reconciliation audit a 100 TB warehouse runs per table anyway. */
object Catalog {

  /** One catalog fact entry: logical source name + the measure whose
    * exact sum the sweep reports + the generation config. */
  case class CatalogFact(source: String, summaryMeasure: Option[String],
                         config: FactConfig)

  /** One catalog dimension entry. */
  case class CatalogDim(source: String, config: DimConfig)

  /** One column's masking rule from the catalog's security section:
    * classification is 'pii' or 'sensitive' (the reference's
    * pii_columns / sensitive_columns lists), rule is one of
    * hash | redact | band (see [[Masking.maskColumn]]). */
  case class ColumnRule(column: String, rule: String, classification: String)

  /** One table's security policy: optional row-level-security predicate
    * plus the declared column masking rules. */
  case class TablePolicy(table: String, rowFilter: Option[String],
                         rules: Seq[ColumnRule])

  /** One role's access declaration: permission verbs over glob patterns
    * of catalog table names (the reference's access_controls list). */
  case class AccessRule(role: String, permissions: Seq[String],
                        tables: Seq[String])

  case class ParsedCatalog(facts: Seq[CatalogFact], dims: Seq[CatalogDim],
                           policies: Seq[TablePolicy], access: Seq[AccessRule])

  private type JMap = java.util.Map[String, Object]

  private def str(m: JMap, k: String): String = m.get(k).asInstanceOf[String]
  private def strs(m: JMap, k: String): Seq[String] =
    Option(m.get(k))
      .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq).getOrElse(Nil)
  private def maps(m: JMap, k: String): Seq[JMap] =
    Option(m.get(k))
      .map(_.asInstanceOf[java.util.List[JMap]].asScala.toSeq).getOrElse(Nil)

  /** Parse a catalog document (the schema of graft_catalog.yml) into
    * generation configs. snakeyaml preserves document order, so facts
    * and dims generate in file order. */
  def parse(yamlText: String): ParsedCatalog = {
    val root = new org.yaml.snakeyaml.Yaml().load(yamlText).asInstanceOf[JMap]
    def entries(section: String): Seq[(String, JMap)] =
      Option(root.get(section))
        .map(_.asInstanceOf[JMap].asScala.toSeq.map { case (k, v) =>
          k -> v.asInstanceOf[JMap] })
        .getOrElse(Nil)
    val facts = entries("fact_tables").map { case (name, m) =>
      CatalogFact(
        source = str(m, "source"),
        summaryMeasure = Option(m.get("summary_measure")).map(_.asInstanceOf[String]),
        config = FactConfig(
          name = name,
          businessKeys = strs(m, "business_keys"),
          // Seq, not Map: 5+ entries in a Scala Map iterate in hash
          // order, which would silently reorder the generated fact's FK
          // columns the moment a fifth dimension_reference is declared
          dimensionKeys = maps(m, "dimension_references")
            .map(d => str(d, "column") -> str(d, "name")),
          measures = maps(m, "measures").map(mm =>
            MeasureSpec(str(mm, "column"), str(mm, "name"),
              Option(mm.get("cast")).map(_.asInstanceOf[String]))),
          derived = maps(m, "derived_measures").map(d =>
            DerivedSpec(str(d, "name"), str(d, "calculation"))),
          qualityRules = strs(m, "quality_rules")))
    }
    val dims = entries("dimension_tables").map { case (name, m) =>
      CatalogDim(
        source = str(m, "source"),
        config = DimConfig(
          name = name,
          naturalKeys = strs(m, "natural_keys"),
          attributes = maps(m, "attributes").map(a =>
            AttrSpec(str(a, "expr"), str(a, "name"))),
          qualityRules = strs(m, "quality_rules")))
    }
    val policies = Option(root.get("security"))
      .map(_.asInstanceOf[JMap])
      .flatMap(s => Option(s.get("data_classification")))
      .map(_.asInstanceOf[JMap].asScala.toSeq.map { case (table, v) =>
        val m = v.asInstanceOf[JMap]
        def ruleList(k: String, cls: String): Seq[ColumnRule] =
          maps(m, k).map(r => ColumnRule(str(r, "column"), str(r, "rule"), cls))
        TablePolicy(table,
          Option(m.get("row_filter")).map(_.asInstanceOf[String]),
          ruleList("pii_columns", "pii") ++ ruleList("sensitive_columns", "sensitive"))
      })
      .getOrElse(Nil)
    val access = Option(root.get("security"))
      .map(_.asInstanceOf[JMap])
      .map(s => maps(s, "access_controls").map(a =>
        AccessRule(str(a, "role"), strs(a, "permissions"), strs(a, "tables"))))
      .getOrElse(Nil)
    ParsedCatalog(facts, dims, policies, access)
  }

  /** The library's bundled catalog, parsed once. Fails with the resource
    * name if a repackaged/shaded jar dropped it — Source.fromInputStream
    * on the null stream would otherwise NPE with no file named. */
  lazy val default: ParsedCatalog = {
    val in = getClass.getResourceAsStream("/graft_catalog.yml")
    require(in != null,
      "graft_catalog.yml not found on the classpath — the bundled catalog " +
        "resource was dropped (shaded/repackaged jar?)")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Logical source registry: catalog `source` names to frames. Plain
    * test tables plus pre-joined composites (the reference's staging
    * models play this role — a fact's source is a staging view, not a
    * raw table). All values are lazy plans; nothing is read until a
    * generated table is consumed. */
  def sources(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "lineitem" -> Tables.lineitem(spark, dir),
    "orders" -> Tables.orders(spark, dir),
    "events" -> Tables.events(spark, dir),
    "part" -> Tables.part(spark, dir),
    "supplier" -> Tables.supplier(spark, dir),
    "customer" -> Tables.customer(spark, dir),
    "nation" -> Tables.nation(spark, dir),
    "region" -> Tables.region(spark, dir),
    "documents" -> Tables.documents(spark, dir),
    "embeddings" -> Tables.embeddings(spark, dir),
    "lineitem_orders" -> Tables.lineitem(spark, dir).join(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
      col("l_orderkey") === col("o_orderkey")),
    // Aggregated composites for the daily-grain facts. Measures stay
    // DECIMAL(18,4) (exact, order-independent sums) so the downstream
    // sweep's decSum and the DuckDB oracle agree bit-for-bit; counts keep
    // their natural integer type — generateFact casts every measure to
    // double at hash time, so no source-level cast is needed for the
    // %.2f row hash. One partial-aggregated shuffle each at any scale.
    // the per-day sums keep Spark's natural widened sum type
    // (decimal(28,4)) — narrowing back to (18,4) would silently NULL on
    // overflow in non-ANSI mode at the 100 TB daily volumes these
    // composites exist for, turning the reconciliation audit's measure
    // into a self-inflicted mismatch
    "daily_sales" -> Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("sale_date"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).as("daily_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).as("daily_revenue")),
    "user_daily_events" -> Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("activity_date"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("daily_value")),
    "order_dates" -> Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("order_date")).distinct(),
    "nation_region" -> Tables.nation(spark, dir).join(
      broadcast(Tables.region(spark, dir)),
      col("n_regionkey") === col("r_regionkey")))

  /** Generate one catalog fact by name (the user-facing entry point:
    * `catalogFact(spark, dir, "fact_sales")`). */
  def catalogFact(spark: SparkSession, dir: String, name: String): DataFrame = {
    val f = default.facts.find(_.config.name == name)
      .getOrElse(throw new NoSuchElementException(s"no catalog fact '$name'"))
    ConfigFacts.generateFact(sources(spark, dir)(f.source), f.config)
  }

  /** Generate one catalog dimension by name. */
  def catalogDim(spark: SparkSession, dir: String, name: String): DataFrame = {
    val d = default.dims.find(_.config.name == name)
      .getOrElse(throw new NoSuchElementException(s"no catalog dim '$name'"))
    ConfigFacts.generateDim(sources(spark, dir)(d.source), d.config)
  }

  /** One audit row per catalog table: rows, distinct surrogate keys,
    * exact decimal sum of the declared summary measure (facts only). */
  def sweep(spark: SparkSession, dir: String): DataFrame = {
    val srcs = sources(spark, dir)
    val factRows = default.facts.map { f =>
      ConfigFacts.generateFact(srcs(f.source), f.config)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("fact_key")).as("n_keys"),
          f.summaryMeasure.map(mn => decSum(col(mn)))
            .getOrElse(lit(null).cast("double")).as("m1_sum"))
        .select(lit(f.config.name).as("table_name"), lit("fact").as("kind"),
          col("n_rows"), col("n_keys"), col("m1_sum"))
    }
    val dimRows = default.dims.map { d =>
      ConfigFacts.generateDim(srcs(d.source), d.config)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("dim_key")).as("n_keys"))
        .select(lit(d.config.name).as("table_name"), lit("dim").as("kind"),
          col("n_rows"), col("n_keys"), lit(null).cast("double").as("m1_sum"))
    }
    (factRows ++ dimRows).reduce(_.unionByName(_)).orderBy("table_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog_sweep" -> ((s, d) => sweep(s, d))
  )

  // Hand-written per-table SQL — independent of the generator, so a
  // hash match proves every catalog-generated table end-to-end.
  val oracles: Map[String, String] = Map(
    "q_catalog_sweep" ->
      """SELECT * FROM (
         SELECT 'fact_sales' AS table_name, 'fact' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS m1_sum
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 0 AND l_extendedprice >= 0
         UNION ALL
         SELECT 'fact_orders', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM orders WHERE o_totalprice > 0
         UNION ALL
         SELECT 'fact_events', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         FROM events WHERE value IS NOT NULL
         UNION ALL
         SELECT 'fact_shipping', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM lineitem WHERE l_extendedprice >= 0
         UNION ALL
         SELECT 'fact_part_pricing', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(p_partkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM part WHERE p_retailprice > 0
         UNION ALL
         SELECT 'fact_supplier_balance', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(s_suppkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         FROM supplier
         UNION ALL
         SELECT 'fact_customer_balance', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(c_custkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         FROM customer
         UNION ALL
         SELECT 'fact_returns', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM lineitem WHERE l_returnflag = 'R'
         UNION ALL
         SELECT 'fact_discounted_sales', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM lineitem WHERE l_discount > 0
         UNION ALL
         SELECT 'fact_taxed_lineitems', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM lineitem WHERE l_tax > 0
         UNION ALL
         SELECT 'fact_bulk_lineitems', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM lineitem WHERE l_quantity >= 30
         UNION ALL
         SELECT 'fact_open_orders', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM orders WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT 'fact_finished_orders', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT 'fact_urgent_orders', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         UNION ALL
         SELECT 'fact_purchase_events', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
         UNION ALL
         SELECT 'fact_doc_volume', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT),
           CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE)
         FROM documents WHERE n_chars > 0
         UNION ALL
         SELECT 'fact_sales_daily', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(sale_date AS VARCHAR)) AS BIGINT),
           CAST(SUM(daily_revenue) AS DOUBLE)
         FROM (SELECT CAST(l_shipdate AS DATE) AS sale_date,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS daily_qty,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS daily_revenue
               FROM lineitem GROUP BY 1)
         WHERE daily_qty > 0
         UNION ALL
         SELECT 'fact_user_daily', 'fact', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(user_id AS VARCHAR) || '||' || CAST(activity_date AS VARCHAR)) AS BIGINT),
           CAST(SUM(daily_value) AS DOUBLE)
         FROM (SELECT user_id, CAST(ts AS DATE) AS activity_date,
                 COUNT(*) AS n_events,
                 SUM(CAST(value AS DECIMAL(18,4))) AS daily_value
               FROM events GROUP BY 1, 2)
         WHERE n_events > 0
         UNION ALL
         SELECT 'dim_customer', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(c_custkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM customer WHERE c_custkey IS NOT NULL
         UNION ALL
         SELECT 'dim_part', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(p_partkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM part
         UNION ALL
         SELECT 'dim_supplier', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(s_suppkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM supplier
         UNION ALL
         SELECT 'dim_document', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM documents
         UNION ALL
         SELECT 'dim_nation', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(n_nationkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM nation
         UNION ALL
         SELECT 'dim_region', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(r_regionkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM region
         UNION ALL
         SELECT 'dim_order', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(o_orderkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM orders
         UNION ALL
         SELECT 'dim_event', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(event_id AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM events
         UNION ALL
         SELECT 'dim_embedding', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(vec_id AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM embeddings
         UNION ALL
         SELECT 'dim_doc_source', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM documents
         UNION ALL
         SELECT 'dim_part_size', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(p_partkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM part
         UNION ALL
         SELECT 'dim_supplier_nation', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(s_suppkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM supplier
         UNION ALL
         SELECT 'dim_date', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(order_date AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)
         UNION ALL
         SELECT 'dim_geography', 'dim', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(n_nationkey AS VARCHAR)) AS BIGINT),
           CAST(NULL AS DOUBLE)
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ) ORDER BY table_name"""
  )
}
