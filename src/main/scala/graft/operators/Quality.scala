package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns._

/** Data-quality expectations runner — the Spark twin of dbt's generic
  * tests (unique / not_null / accepted_values / relationships; the
  * reference runs "500+ data quality tests" of exactly these shapes,
  * README "Quality Framework" + models/staging tests).
  *
  * Each expectation compiles to one aggregate; a whole suite is a union
  * of tiny per-rule aggregates over column-pruned scans, so a 100 TB
  * table pays one pass per rule (or fuse them per-table if needed).
  */
object Quality {

  sealed trait Expectation {
    def name: String
    def table: String
    /** Aggregate expression counting violations — fusible rules share one
      * scan per table. None → the rule needs its own plan (joins). */
    def aggExpr: Option[Column] = None
    def violations(tables: String => DataFrame): DataFrame =
      sys.error(s"$name has no standalone plan")
  }

  case class NotNull(table: String, column: String) extends Expectation {
    val name = s"not_null:$table.$column"
    override def aggExpr: Option[Column] =
      Some((count(lit(1)) - count(col(column))).cast("long"))
  }

  case class Unique(table: String, column: String) extends Expectation {
    val name = s"unique:$table.$column"
    override def aggExpr: Option[Column] =
      Some((count(col(column)) - countDistinct(col(column))).cast("long"))
  }

  case class AcceptedValues(table: String, column: String, values: Seq[String])
      extends Expectation {
    val name = s"accepted_values:$table.$column"
    override def aggExpr: Option[Column] =
      Some(coalesce(sum(when(!col(column).isin(values: _*), 1L).otherwise(0L)), lit(0L)).cast("long"))
  }

  case class InRange(table: String, column: String, lo: Double, hi: Double)
      extends Expectation {
    val name = s"in_range:$table.$column"
    override def aggExpr: Option[Column] =
      Some(coalesce(sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L)), lit(0L)).cast("long"))
  }

  /** FK integrity: every value of table.column exists in refTable.refCol. */
  case class Relationship(table: String, column: String,
                          refTable: String, refCol: String) extends Expectation {
    val name = s"relationships:$table.$column->$refTable.$refCol"
    override def violations(t: String => DataFrame): DataFrame =
      t(table).select(col(column))
        .join(t(refTable).select(col(refCol)), col(column) === col(refCol), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
  }

  /** Run a suite: one row per expectation with violation count + verdict.
    * Scan-fusion: all aggregate-expressible rules on the same table run
    * in ONE pass over that table (at 100 TB this is the difference
    * between one scan and one scan per rule); join-based rules keep
    * their own plans. */
  def run(suite: Seq[Expectation], tables: String => DataFrame): DataFrame = {
    val (fusible, standalone) = suite.partition(_.aggExpr.isDefined)
    val fused = fusible.groupBy(_.table).toSeq.map { case (table, rules) =>
      val aggs = rules.zipWithIndex.map { case (r, i) => r.aggExpr.get.as(s"v$i") }
      val wide = tables(table).agg(aggs.head, aggs.tail: _*)
      wide.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule_name"), lit(r.table).as("table_name"),
          col(s"v$i").as("n_violations"))
      }: _*)).as("e"))
        .select(col("e.rule_name"), col("e.table_name"),
          col("e.n_violations").cast("long").as("n_violations"))
    }
    val single = standalone.map { e =>
      e.violations(tables).select(
        lit(e.name).as("rule_name"),
        lit(e.table).as("table_name"),
        col("n_violations").cast("long"))
    }
    (fused ++ single).reduce(_ unionAll _)
      .withColumn("passed", col("n_violations") === 0)
      .orderBy("rule_name")
  }

  /** Composite feature-quality score over one table
    * (calculate_feature_quality_metrics,
    * feature_store_manager.py:587-629): completeness = mean per-column
    * non-null ratio over ALL columns; uniqueness = mean distinct ratio
    * over categorical columns; consistency = mean within-3-sigma
    * fraction over numeric columns; overall = 0.4·completeness +
    * 0.3·uniqueness + 0.3·consistency. One stats pass + one broadcast
    * z-pass (same shape as featureStats); exact countDistinct — swap for
    * approx_count_distinct if a profiled column is high-cardinality.
    * Profiled numeric columns are assumed non-constant (the reference's
    * std>0 guard). */
  def featureQuality(df: DataFrame, numericCols: Seq[String],
                     categoricalCols: Seq[String]): DataFrame = {
    val allCols = df.columns.toSeq
    val aggs: Seq[Column] =
      (count(lit(1)).as("n_rows") +:
        allCols.map(c => count(col(c)).as(s"nn_$c"))) ++
        categoricalCols.map(c => countDistinct(col(c)).as(s"nd_$c")) ++
        numericCols.flatMap(c => Seq(
          sum(col(c).cast("decimal(18,4)")).cast("double").as(s"s1_$c"),
          sum((col(c) * col(c)).cast("decimal(38,8)")).cast("double").as(s"s2_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    def mean(c: String) = col(s"s1_$c") / col(s"nn_$c")
    // population variance clamped at 0: decimal-exact sums cast to double
    // can leave a CONSTANT column's variance fractionally negative, where
    // Spark's sqrt is NaN but the oracle's DuckDB sqrt raises; identical
    // CASE on both sides, bit-identical whenever variance >= 0
    def pvar(c: String) = col(s"s2_$c") / col(s"nn_$c") - mean(c) * mean(c)
    def pstd(c: String) = sqrt(when(pvar(c) < 0, lit(0d)).otherwise(pvar(c)))
    val carried = (max(col("n_rows")).as("n_rows") +:
      allCols.map(c => max(col(s"nn_$c")).as(s"nn_$c"))) ++
      categoricalCols.map(c => max(col(s"nd_$c")).as(s"nd_$c"))
    val okAggs = numericCols.map(c =>
      sum(when(abs(col(c) - mean(c)) <= lit(3) * pstd(c), 1L).otherwise(0L)).as(s"ok_$c"))
    val agg2 = df.crossJoin(broadcast(stats))
      .agg((carried ++ okAggs).head, (carried ++ okAggs).tail: _*)
    val completeness = allCols.map(c => col(s"nn_$c") / col("n_rows")).reduce(_ + _) / allCols.size
    val uniqueness = categoricalCols.map(c =>
      least(col(s"nd_$c") / col("n_rows"), lit(1.0))).reduce(_ + _) / categoricalCols.size
    val consistency = numericCols.map(c => col(s"ok_$c") / col(s"nn_$c")).reduce(_ + _) / numericCols.size
    agg2.select(
      col("n_rows"),
      r6(completeness).as("completeness"),
      r6(uniqueness).as("uniqueness"),
      r6(consistency).as("consistency"),
      r6(completeness * 0.4 + uniqueness * 0.3 + consistency * 0.3).as("overall_quality"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002) — the
    * governance check beside the PII scrub ([[graft.text.Filters]]): a row
    * is k-anonymous when at least k-1 OTHER rows share its full
    * quasi-identifier combination, so the table's privacy floor is the
    * smallest anonymity set. Emits one row per QI combination with its
    * set size, population share, re-identification risk 1/|set|, the
    * violates-k flag, and the table-wide k_anonymity so the sweep
    * consumer reads the headline without a second query.
    *
    * Scale shape: one partial-aggregated shuffle to QI grain (bounded by
    * the QI domain product — |nations|·|segments| here, and a release
    * audit always picks low-cardinality QIs or the report itself is a
    * disclosure); the rollup row is a broadcast. Nothing else scales with
    * the table. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int = 5): DataFrame = {
    val grp = df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val tot = grp.agg(sum(col("n_rows")).as("n_total"),
      min(col("n_rows")).as("k_anonymity"))
    grp.crossJoin(broadcast(tot))
      .select(quasiIds.map(col) ++ Seq(
        col("n_rows"),
        r6(col("n_rows").cast("double") / col("n_total")).as("share"),
        r6(lit(1.0) / col("n_rows")).as("reident_risk"),
        (col("n_rows") < k).as("violates_k"),
        col("k_anonymity")): _*)
      // NULLS LAST: a nullable QI (plausible in a governance audit) sorts
      // NULLS FIRST under Spark's default ASC but last in the DuckDB
      // oracle's ORDER BY — the same cross-engine reorder fixed in
      // Features.topCategories
      .orderBy(quasiIds.map(q => col(q).asc_nulls_last): _*)
  }

  /** The default suite over the star schema (mirrors the dbt schema.yml
    * tests the reference generates per model). */
  def defaultSuite: Seq[Expectation] = Seq(
    NotNull("orders", "o_orderkey"),
    Unique("orders", "o_orderkey"),
    NotNull("customer", "c_custkey"),
    Unique("customer", "c_custkey"),
    AcceptedValues("orders", "o_orderstatus", Seq("O", "F", "P")),
    AcceptedValues("customer", "c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    InRange("lineitem", "l_discount", 0.0, 1.0),
    InRange("lineitem", "l_quantity", 0.0, 100.0),
    Relationship("orders", "o_custkey", "customer", "c_custkey"),
    Relationship("lineitem", "l_orderkey", "orders", "o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_expectations" -> ((s, d) =>
      run(defaultSuite, name => Tables.load(s, d, name))),
    "q_feature_quality" -> ((s, d) =>
      featureQuality(Tables.orders(s, d),
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        categoricalCols = Seq("o_orderstatus", "o_orderpriority"))),
    "q_k_anonymity" -> ((s, d) =>
      kAnonymity(Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment")))
  )

  val oracles: Map[String, String] = Map(
    "q_dq_expectations" -> Seq(
      """SELECT 'accepted_values:customer.c_mktsegment' AS rule_name, 'customer' AS table_name,
         CAST(SUM(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         SUM(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) = 0 AS passed
         FROM customer""",
      """SELECT 'accepted_values:orders.o_orderstatus', 'orders',
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) = 0
         FROM orders""",
      """SELECT 'in_range:lineitem.l_discount', 'lineitem',
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT),
         SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) = 0
         FROM lineitem""",
      """SELECT 'in_range:lineitem.l_quantity', 'lineitem',
         CAST(SUM(CASE WHEN l_quantity < 0 OR l_quantity > 100 THEN 1 ELSE 0 END) AS BIGINT),
         SUM(CASE WHEN l_quantity < 0 OR l_quantity > 100 THEN 1 ELSE 0 END) = 0
         FROM lineitem""",
      """SELECT 'not_null:customer.c_custkey', 'customer',
         CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT),
         COUNT(*) - COUNT(c_custkey) = 0 FROM customer""",
      """SELECT 'not_null:orders.o_orderkey', 'orders',
         CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
         COUNT(*) - COUNT(o_orderkey) = 0 FROM orders""",
      """SELECT 'relationships:lineitem.l_orderkey->orders.o_orderkey', 'lineitem',
         CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
         FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)""",
      """SELECT 'relationships:orders.o_custkey->customer.c_custkey', 'orders',
         CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
         FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""",
      """SELECT 'unique:customer.c_custkey', 'customer',
         CAST(COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS BIGINT),
         COUNT(c_custkey) - COUNT(DISTINCT c_custkey) = 0 FROM customer""",
      """SELECT 'unique:orders.o_orderkey', 'orders',
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0 FROM orders"""
    ).mkString("", " UNION ALL ", " ORDER BY rule_name"),
    "q_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM customer GROUP BY 1, 2),
         t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total,
             CAST(MIN(n_rows) AS BIGINT) AS k_anonymity FROM g)
         SELECT c_nationkey, c_mktsegment, n_rows,
           FLOOR(CAST(n_rows AS DOUBLE) / n_total * 1000000 + 0.5) / 1000000 AS share,
           FLOOR(CAST(1 AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000 AS reident_risk,
           n_rows < 5 AS violates_k,
           k_anonymity
         FROM g, t ORDER BY c_nationkey, c_mktsegment""",
    "q_feature_quality" -> {
      val all = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val nums = Seq("o_orderkey", "o_custkey", "o_totalprice")
      val cats = Seq("o_orderstatus", "o_orderpriority")
      val nnCols = all.map(c => s"CAST(COUNT($c) AS BIGINT) nn_$c").mkString(", ")
      val ndCols = cats.map(c => s"CAST(COUNT(DISTINCT $c) AS BIGINT) nd_$c").mkString(", ")
      val sCols = nums.map(c =>
        s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) s1_$c, " +
          s"CAST(SUM(CAST($c * $c AS DECIMAL(38,8))) AS DOUBLE) s2_$c").mkString(", ")
      def pvar(c: String) =
        s"s2_$c / nn_$c - (s1_$c / nn_$c) * (s1_$c / nn_$c)"
      val okCols = nums.map(c =>
        s"CAST(SUM(CASE WHEN ABS($c - s1_$c / nn_$c) <= " +
          s"3 * sqrt(CASE WHEN ${pvar(c)} < 0 THEN CAST(0 AS DOUBLE) ELSE ${pvar(c)} END) " +
          s"THEN 1 ELSE 0 END) AS BIGINT) ok_$c").mkString(", ")
      val comp = s"(${all.map(c => s"nn_$c / n_rows").mkString(" + ")}) / ${all.size}"
      val uniq = s"(${cats.map(c => s"LEAST(nd_$c / n_rows, 1.0)").mkString(" + ")}) / ${cats.size}"
      val cons = s"(${nums.map(c => s"ok_$c / nn_$c").mkString(" + ")}) / ${nums.size}"
      s"""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) n_rows, $nnCols, $ndCols, $sCols FROM orders),
         o AS (SELECT $okCols FROM orders, m)
         SELECT n_rows,
           FLOOR(($comp) * 1000000 + 0.5) / 1000000 AS completeness,
           FLOOR(($uniq) * 1000000 + 0.5) / 1000000 AS uniqueness,
           FLOOR(($cons) * 1000000 + 0.5) / 1000000 AS consistency,
           FLOOR((($comp) * 0.4 + ($uniq) * 0.3 + ($cons) * 0.3) * 1000000 + 0.5) / 1000000 AS overall_quality
         FROM m, o"""
    }
  )
}
