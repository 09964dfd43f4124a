package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{FeatureViews, Features}
import graft.operators.Warehouse

class FeatureViewsSpec extends AnyFunSuite {
  import TestSession._

  test("feature version matches the reference's md5-of-sorted-features prefix") {
    // order-insensitive, content-sensitive
    val a = FeatureViews.featureVersion(Seq("recency_days", "frequency", "monetary"))
    val b = FeatureViews.featureVersion(Seq("monetary", "recency_days", "frequency"))
    assert(a == b && a.length == 8 && a.matches("[0-9a-f]{8}"))
    assert(FeatureViews.featureVersion(Seq("frequency")) != a)
    // known digest: md5("frequency,monetary,recency_days").take(8)
    assert(a == "f77faf14")
  }

  test("create_feature_view registers a catalog temp view serving the projected features") {
    val rfm = Features.rfm(Tables.events(spark, sf))
    val fv = FeatureViews.createFeatureView(
      "customer_rfm", "user_id", Seq("recency_days", "frequency", "monetary"), rfm)
    assert(fv.version.matches("[0-9a-f]{8}"))
    val served = spark.table("fv_customer_rfm")
    assert(served.columns.toSeq == Seq("user_id", "recency_days", "frequency", "monetary"))
    assert(served.count() == rfm.count())
    // unknown features must fail at registration, not at serve time
    intercept[org.apache.spark.sql.AnalysisException] {
      FeatureViews.createFeatureView("bad", "user_id", Seq("no_such_col"), rfm)
    }
  }

  test("lineage is derived from the logical plan: real source tables and transformation kinds") {
    val star = Warehouse.starJoin(Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf))
    FeatureViews.createFeatureView("sales_by_region", "region_name",
      star.columns.filterNot(_ == "region_name").toSeq, star)
    val lin = FeatureViews.featureLineage("sales_by_region", spark)
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      assert(lin.sourceTables.contains(t), s"missing source $t in ${lin.sourceTables}")
    }
    assert(lin.transformations.contains("join"))
    assert(lin.transformations.contains("aggregation"))
  }
}
