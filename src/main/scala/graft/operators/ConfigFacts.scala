package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** One measure of a configured fact table. */
case class MeasureSpec(column: String, name: String, castTo: Option[String] = None)

/** A derived measure as a SQL expression over already-selected columns. */
case class DerivedSpec(name: String, sqlExpr: String)

/** Declarative fact-table config — the Spark twin of the reference's
  * YAML-driven model generation (governance/data_catalog.yml +
  * scripts/utilities/generate_fact_dimension_models.py +
  * macros/generate_fact_tables.sql): 32 facts / 128 dims are stamped out
  * of configs like this rather than hand-written. */
case class FactConfig(
    name: String,
    businessKeys: Seq[String],
    dimensionKeys: Seq[(String, String)], // source column -> fk name, declaration-ordered
    measures: Seq[MeasureSpec],
    derived: Seq[DerivedSpec] = Nil,
    qualityRules: Seq[String] = Nil, // SQL predicates that must hold
    hashFormatted: Map[String, Column] = Map.empty) // pre-formatted cols for row hash

/** One attribute of a configured dimension: SQL expression -> name. */
case class AttrSpec(sqlExpr: String, name: String)

/** Declarative dimension config — the dim half of the reference's 32
  * fact / 128 dim catalog stamping (data_catalog.yml +
  * generate_fact_dimension_models.py): surrogate key over natural keys,
  * cleansed attributes, and an SCD-ready change hash. */
case class DimConfig(
    name: String,
    naturalKeys: Seq[String],
    attributes: Seq[AttrSpec],
    qualityRules: Seq[String] = Nil)

/** Config-driven fact generation: surrogate key, FK mapping, measure
  * casting, derived measures, row hash, business-rule filtering — the
  * whole generate_fact_table macro as one function over a config value.
  */
object ConfigFacts {

  def generateFact(source: DataFrame, cfg: FactConfig): DataFrame = {
    val keyCols = cfg.businessKeys.map(col)
    val fkCols = cfg.dimensionKeys.map { case (src, fk) => expr(src).as(fk) }
    val measureCols = cfg.measures.map { m =>
      val c = col(m.column)
      m.castTo.fold(c)(t => c.cast(t)).as(m.name)
    }
    // measures hash through %.2f of their DOUBLE form: a no-op for the
    // double columns every oracle-compared fact uses, and the cast is
    // what lets DECIMAL/BIGINT measures (aggregated composite sources)
    // format at all — java.util.Formatter rejects %f on non-float types
    val hashCols = cfg.businessKeys.map(col) ++
      cfg.measures.map(m =>
        cfg.hashFormatted.getOrElse(m.column, fmt2(col(m.column).cast("double"))))
    val base = source
      .filter(cfg.qualityRules.map(expr).reduceOption(_ && _).getOrElse(lit(true)))
      .select(
        (surrogateKey(keyCols: _*).as("fact_key") +:
          (keyCols ++ fkCols ++ measureCols)) :+
          rowHash(hashCols: _*).as("row_hash"): _*)
    cfg.derived.foldLeft(base) { case (df, d) =>
      df.withColumn(d.name, expr(d.sqlExpr))
    }
  }

  /** Dim twin of [[generateFact]]: surrogate key, attribute expressions,
    * change-detection hash over every attribute (the scd_type2_macro
    * change_hash, so a generated dim drops straight into Scd2.build). */
  def generateDim(source: DataFrame, cfg: DimConfig): DataFrame = {
    val keyCols = cfg.naturalKeys.map(col)
    val attrCols = cfg.attributes.map(a => expr(a.sqlExpr).as(a.name))
    source
      .filter(cfg.qualityRules.map(expr).reduceOption(_ && _).getOrElse(lit(true)))
      .select(
        (surrogateKey(keyCols: _*).as("dim_key") +: (keyCols ++ attrCols)) :+
          rowHash(cfg.attributes.map(a => expr(a.sqlExpr)): _*).as("change_hash"): _*)
  }

  /** The sales fact from the catalog config — must produce exactly what
    * the hand-written Warehouse.factSales produces (and it shares that
    * query's oracle). */
  val salesFactConfig: FactConfig = FactConfig(
    name = "fact_sales",
    businessKeys = Seq("l_orderkey", "l_linenumber"),
    dimensionKeys = Seq(
      "o_custkey" -> "customer_key",
      "l_partkey" -> "part_key",
      "l_suppkey" -> "supplier_key",
      "to_date(l_shipdate)" -> "date_key"),
    measures = Seq(
      MeasureSpec("l_quantity", "quantity", castTo = Some("int")),
      MeasureSpec("l_extendedprice", "gross_revenue"),
      MeasureSpec("l_discount", "discount_rate")),
    derived = Seq(
      DerivedSpec("net_revenue", "gross_revenue * (1 - discount_rate)"),
      DerivedSpec("unit_price",
        "FLOOR((gross_revenue / CAST(quantity AS DOUBLE)) * 10000 + 0.5) / 10000")),
    qualityRules = Seq("l_quantity > 0", "l_extendedprice >= 0"))

  def configFactSales(lineitem: DataFrame, orders: DataFrame): DataFrame =
    generateFact(
      lineitem.join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey")),
      salesFactConfig)
      .orderBy("l_orderkey", "l_linenumber")

  /** Second fact config — different grain (order header), proves the
    * generator is not shaped around the lineitem fact. */
  val ordersFactConfig: FactConfig = FactConfig(
    name = "fact_orders",
    businessKeys = Seq("o_orderkey"),
    dimensionKeys = Seq(
      "o_custkey" -> "customer_key",
      "to_date(o_orderdate)" -> "date_key"),
    measures = Seq(MeasureSpec("o_totalprice", "total_price")),
    derived = Seq(DerivedSpec("price_band",
      "CASE WHEN total_price < 50000 THEN 'S' WHEN total_price < 150000 THEN 'M' ELSE 'L' END")),
    qualityRules = Seq("o_totalprice > 0"))

  /** Third fact config — event grain over a non-TPC-H source. */
  val eventsFactConfig: FactConfig = FactConfig(
    name = "fact_events",
    businessKeys = Seq("event_id"),
    dimensionKeys = Seq(
      "user_id" -> "user_key",
      "to_date(ts)" -> "date_key"),
    measures = Seq(MeasureSpec("value", "amount")),
    qualityRules = Seq("value IS NOT NULL"))

  /** Dimension config mirroring the hand-written customer staging tiers. */
  val customerDimConfig: DimConfig = DimConfig(
    name = "dim_customer_cfg",
    naturalKeys = Seq("c_custkey"),
    attributes = Seq(
      AttrSpec("upper(trim(c_name))", "name_clean"),
      AttrSpec("upper(trim(c_mktsegment))", "segment"),
      AttrSpec("CASE WHEN c_acctbal < 0 THEN 'NEGATIVE' WHEN c_acctbal < 1000 THEN 'LOW' " +
        "WHEN c_acctbal < 5000 THEN 'MEDIUM' ELSE 'HIGH' END", "balance_tier")),
    qualityRules = Seq("c_custkey IS NOT NULL"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_config_fact" -> ((s, d) =>
      configFactSales(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q_config_fact_orders" -> ((s, d) =>
      generateFact(Tables.orders(s, d), ordersFactConfig).orderBy("o_orderkey")),
    "q_config_fact_events" -> ((s, d) =>
      generateFact(Tables.events(s, d), eventsFactConfig).orderBy("event_id")),
    "q_config_dim" -> ((s, d) =>
      generateDim(Tables.customer(s, d), customerDimConfig).orderBy("c_custkey"))
  )

  val oracles: Map[String, String] = Map(
    "q_config_fact" ->
      """SELECT md5(CAST(l_orderkey AS VARCHAR) || '||' || CAST(l_linenumber AS VARCHAR)) AS fact_key,
         l_orderkey, l_linenumber, o_custkey AS customer_key,
         l_partkey AS part_key, l_suppkey AS supplier_key,
         CAST(l_shipdate AS DATE) AS date_key,
         CAST(l_quantity AS INT) AS quantity,
         l_extendedprice AS gross_revenue,
         l_discount AS discount_rate,
         l_extendedprice * (1 - l_discount) AS net_revenue,
         FLOOR((l_extendedprice / CAST(CAST(l_quantity AS INT) AS DOUBLE)) * 10000 + 0.5) / 10000 AS unit_price,
         md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
             || '|' || printf('%.2f', l_quantity) || '|' || printf('%.2f', l_extendedprice)
             || '|' || printf('%.2f', l_discount)) AS row_hash
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 0 AND l_extendedprice >= 0
         ORDER BY l_orderkey, l_linenumber""",
    "q_config_fact_orders" ->
      """SELECT md5(CAST(o_orderkey AS VARCHAR)) AS fact_key,
         o_orderkey, o_custkey AS customer_key,
         CAST(o_orderdate AS DATE) AS date_key,
         o_totalprice AS total_price,
         md5(CAST(o_orderkey AS VARCHAR) || '|' || printf('%.2f', o_totalprice)) AS row_hash,
         CASE WHEN o_totalprice < 50000 THEN 'S'
              WHEN o_totalprice < 150000 THEN 'M'
              ELSE 'L' END AS price_band
         FROM orders WHERE o_totalprice > 0 ORDER BY o_orderkey""",
    "q_config_fact_events" ->
      """SELECT md5(CAST(event_id AS VARCHAR)) AS fact_key,
         event_id, user_id AS user_key, CAST(ts AS DATE) AS date_key,
         value AS amount,
         md5(CAST(event_id AS VARCHAR) || '|' || printf('%.2f', value)) AS row_hash
         FROM events WHERE value IS NOT NULL ORDER BY event_id""",
    "q_config_dim" ->
      """SELECT md5(CAST(c_custkey AS VARCHAR)) AS dim_key, c_custkey,
         upper(trim(c_name)) AS name_clean,
         upper(trim(c_mktsegment)) AS segment,
         CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
              WHEN c_acctbal < 1000 THEN 'LOW'
              WHEN c_acctbal < 5000 THEN 'MEDIUM'
              ELSE 'HIGH' END AS balance_tier,
         md5(upper(trim(c_name)) || '|' || upper(trim(c_mktsegment)) || '|'
             || CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
                     WHEN c_acctbal < 1000 THEN 'LOW'
                     WHEN c_acctbal < 5000 THEN 'MEDIUM'
                     ELSE 'HIGH' END) AS change_hash
         FROM customer WHERE c_custkey IS NOT NULL ORDER BY c_custkey"""
  )
}
