package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Catalog, ConfigFacts}

/** Catalog-file-driven generation: the bundled graft_catalog.yml must
  * parse into the SAME configs the hand-written code declares, and the
  * generated frames must be identical — proving "add table #5" is a
  * YAML edit, not new code. */
class CatalogSpec extends AnyFunSuite {
  import TestSession._

  test("bundled catalog parses: 18 facts, 14 dims, every source resolvable") {
    val cat = Catalog.default
    assert(cat.facts.size == 18 && cat.dims.size == 14)
    val srcs = Catalog.sources(spark, sf).keySet
    cat.facts.foreach(f => assert(srcs.contains(f.source), s"unknown source ${f.source}"))
    cat.dims.foreach(d => assert(srcs.contains(d.source), s"unknown source ${d.source}"))
    // every summary measure names a declared measure output
    cat.facts.foreach { f =>
      f.summaryMeasure.foreach(m =>
        assert(f.config.measures.exists(_.name == m), s"${f.config.name}: bad summary $m"))
    }
  }

  test("parsed configs equal the hand-written in-code configs") {
    val byName = Catalog.default.facts.map(f => f.config.name -> f.config).toMap
    assert(byName("fact_sales") == ConfigFacts.salesFactConfig.copy(name = "fact_sales"))
    assert(byName("fact_orders") == ConfigFacts.ordersFactConfig.copy(name = "fact_orders"))
    assert(byName("fact_events") == ConfigFacts.eventsFactConfig.copy(name = "fact_events"))
    val dimByName = Catalog.default.dims.map(d => d.config.name -> d.config).toMap
    assert(dimByName("dim_customer") ==
      ConfigFacts.customerDimConfig.copy(name = "dim_customer"))
  }

  test("catalog-generated fact equals the hand-written generation row-for-row") {
    val fromCatalog = Catalog.catalogFact(spark, sf, "fact_sales")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toString).toSeq
    val handWritten = ConfigFacts
      .configFactSales(Tables.lineitem(spark, sf), Tables.orders(spark, sf))
      .collect().map(_.toString).toSeq
    assert(fromCatalog.nonEmpty && fromCatalog == handWritten)
  }

  test("aggregated-source facts and calendar/geography dims materialize fully") {
    // full collect() so row_hash/change_hash (pruned away by the sweep's
    // aggregates) actually evaluate — including %.2f over DECIMAL measures
    val daily = Catalog.catalogFact(spark, sf, "fact_sales_daily").collect()
    assert(daily.nonEmpty && daily.map(_.getAs[String]("fact_key")).distinct.length == daily.length)
    assert(daily.forall(r => r.getAs[String]("row_hash").length == 32))
    val user = Catalog.catalogFact(spark, sf, "fact_user_daily").collect()
    assert(user.nonEmpty && user.map(_.getAs[String]("fact_key")).distinct.length == user.length)
    val dates = Catalog.catalogDim(spark, sf, "dim_date").collect()
    assert(dates.nonEmpty)
    assert(dates.forall { r =>
      val (y, m, q) = (r.getAs[Int]("year_num"), r.getAs[Int]("month_num"), r.getAs[Int]("quarter_num"))
      y > 1990 && m >= 1 && m <= 12 && q == (m - 1) / 3 + 1
    })
    val geo = Catalog.catalogDim(spark, sf, "dim_geography").collect()
    assert(geo.length == Tables.nation(spark, sf).count())
    assert(geo.forall(r => r.getAs[String]("region_name").nonEmpty))
  }

  test("sweep audits every catalog table: one row each, sane counts") {
    val rows = Catalog.sweep(spark, sf).collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      val (name, kind) = (r.getAs[String]("table_name"), r.getAs[String]("kind"))
      assert(r.getAs[Long]("n_rows") > 0, s"$name empty")
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"), s"$name keys > rows")
      if (kind == "fact") assert(!r.isNullAt(r.fieldIndex("m1_sum")), s"$name missing sum")
      else assert(r.isNullAt(r.fieldIndex("m1_sum")), s"$name dim should have null sum")
    }
    // surrogate keys unique where the business key is the full grain
    val byName = rows.map(r => r.getAs[String]("table_name") -> r).toMap
    // full-grain tables only: the synthetic lineitem carries duplicate
    // (orderkey, linenumber) pairs, so lineitem-grain facts are excluded
    Seq("fact_orders", "fact_part_pricing", "fact_supplier_balance",
      "fact_customer_balance", "fact_open_orders", "fact_finished_orders",
      "fact_urgent_orders", "fact_purchase_events", "fact_doc_volume",
      "fact_sales_daily", "fact_user_daily", "dim_date", "dim_geography",
      "dim_customer", "dim_part", "dim_supplier", "dim_document",
      "dim_nation", "dim_region", "dim_order", "dim_event", "dim_embedding",
      "dim_doc_source", "dim_part_size", "dim_supplier_nation").foreach { t =>
      assert(byName(t).getAs[Long]("n_keys") == byName(t).getAs[Long]("n_rows"),
        s"$t surrogate keys not unique")
    }
    // the quality-rule fact is a strict subset of its source
    assert(byName("fact_returns").getAs[Long]("n_rows") <
      Tables.lineitem(spark, sf).count())
  }
}
