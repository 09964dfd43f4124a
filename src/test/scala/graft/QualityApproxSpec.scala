package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Approx
import graft.operators.Quality

class QualityApproxSpec extends AnyFunSuite {
  import TestSession._

  test("expectation suite passes on clean data and catches injected violations") {
    import spark.implicits._
    val clean = Quality.run(Quality.defaultSuite, name => Tables.load(spark, sf, name))
      .collect()
    assert(clean.nonEmpty)
    assert(clean.forall(_.getAs[Boolean]("passed")), "clean data should pass the suite")

    // corrupt a table: duplicate + null keys, bad status
    val bad = Seq(
      (Some(1L), 10L, "O", 1.0),
      (Some(1L), 11L, "X", 1.0), // duplicate key + invalid status
      (None, 12L, "F", 1.0))     // null key
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val suite = Seq(
      Quality.NotNull("orders", "o_orderkey"),
      Quality.Unique("orders", "o_orderkey"),
      Quality.AcceptedValues("orders", "o_orderstatus", Seq("O", "F", "P")))
    val res = Quality.run(suite, _ => bad).collect()
      .map(r => r.getAs[String]("rule_name") -> r.getAs[Long]("n_violations")).toMap
    assert(res("not_null:orders.o_orderkey") == 1L)
    assert(res("unique:orders.o_orderkey") == 1L)
    assert(res("accepted_values:orders.o_orderstatus") == 1L)
  }

  test("approx sketches land within tolerance of exact answers") {
    val row = Approx.approxProfile(Tables.events(spark, sf)).collect()(0)
    assert(row.getAs[Long]("exact_users") > 0)
    assert(row.getAs[Long]("exact_values") > 0)
    assert(!row.isNullAt(row.fieldIndex("exact_p50")))
    for (c <- Seq("users_hll_ok", "values_hll_ok", "p50_rank_ok", "p90_rank_ok"))
      assert(row.getAs[Boolean](c), s"sketch bound violated: $c")
  }

  test("time-range window counts only events within the preceding hour") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 7L, "view", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 7L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Approx.rollingTimeWindow(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_last_1h")).toMap
    assert(out(1L) == 1L && out(2L) == 2L && out(3L) == 1L)
  }
}
