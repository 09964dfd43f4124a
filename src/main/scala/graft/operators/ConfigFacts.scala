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
    dimensionKeys: Map[String, String], // source column -> fk name
    measures: Seq[MeasureSpec],
    derived: Seq[DerivedSpec] = Nil,
    qualityRules: Seq[String] = Nil, // SQL predicates that must hold
    hashFormatted: Map[String, Column] = Map.empty) // pre-formatted cols for row hash

/** Config-driven fact generation: surrogate key, FK mapping, measure
  * casting, derived measures, row hash, business-rule filtering — the
  * whole generate_fact_table macro as one function over a config value.
  */
object ConfigFacts {

  def generateFact(source: DataFrame, cfg: FactConfig): DataFrame = {
    val keyCols = cfg.businessKeys.map(col)
    val fkCols = cfg.dimensionKeys.map { case (src, fk) => expr(src).as(fk) }.toSeq
    val measureCols = cfg.measures.map { m =>
      val c = col(m.column)
      m.castTo.fold(c)(t => c.cast(t)).as(m.name)
    }
    val hashCols = cfg.businessKeys.map(col) ++
      cfg.measures.map(m => cfg.hashFormatted.getOrElse(m.column, fmt2(col(m.column))))
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

  /** The sales fact from the catalog config — must produce exactly what
    * the hand-written Warehouse.factSales produces (and it shares that
    * query's oracle). */
  val salesFactConfig: FactConfig = FactConfig(
    name = "fact_sales",
    businessKeys = Seq("l_orderkey", "l_linenumber"),
    dimensionKeys = Map(
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_config_fact" -> ((s, d) =>
      configFactSales(Tables.lineitem(s, d), Tables.orders(s, d)))
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
         ORDER BY l_orderkey, l_linenumber"""
  )
}
