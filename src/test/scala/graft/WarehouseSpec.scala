package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs (one JVM-wide session, local[4]). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class WarehouseSpec extends AnyFunSuite {
  import TestSession._

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query key has deterministic output across two runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$name nondeterministic")
    }
  }

  test("staging clean flags and tiers are consistent") {
    val df = operators.Warehouse.stagingClean(Tables.customer(spark, sf))
    val rows = df.collect()
    assert(rows.forall(r => Set("VALID", "MISSING_NAME", "MISSING_BALANCE")
      .contains(r.getAs[String]("dq_flag"))))
    assert(rows.forall(r => Set("NEGATIVE", "LOW", "MEDIUM", "HIGH")
      .contains(r.getAs[String]("balance_tier"))))
  }

  test("incremental merge keeps exactly one row per key") {
    val df = operators.Warehouse.incrementalMerge(Tables.events(spark, sf))
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("fact sales derived measures honor business rules") {
    val df = operators.Warehouse.factSales(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf))
    val bad = df.filter("quantity <= 0 OR gross_revenue < 0 OR net_revenue > gross_revenue").count()
    assert(bad == 0)
  }

  test("staging enhanced exercises every cleansing branch") {
    val df = operators.Warehouse.stagingEnhanced(Tables.customer(spark, sf))
    val flags = df.select("data_quality_flag").distinct().collect().map(_.getString(0)).toSet
    assert(flags.contains("VALID") && flags.contains("INVALID_EMAIL"))
    val stages = df.select("customer_lifecycle_stage").distinct().collect().map(_.getString(0)).toSet
    assert(Set("LOYAL", "CHURNED", "UNKNOWN").subsetOf(stages), s"stages: $stages")
    // test records synthesized at custkey % 101 == 0 must be filtered out
    assert(df.filter("customer_id % 101 = 0").count() == 0)
    // phone scrub keeps only dial characters
    assert(df.filter("phone_number RLIKE '[^0-9+()-]'").count() == 0)
    // address assembly never yields null
    assert(df.filter("full_address IS NULL").count() == 0)
  }

  test("oracle map keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
