package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming serving == batch scoring: the stateless ensemble-inference
  * stream must emit exactly the rows the batch q_ensemble_score path
  * computes (same scaler artifact, same row-local math). */
class InferStreamSpec extends AnyFunSuite {
  import TestSession._

  test("streaming ensemble scoring equals the batch path row-for-row") {
    val orders = Tables.orders(spark, sf)
    val moments = ml.Inference.fitMoments(orders)
    val streamed = streaming.InferStream.scoreStream(spark, sf, moments)
    val batch = ml.Inference.ensembleScore(orders)
    val a = streamed.collect().map(_.toString).sorted.toSeq
    val b = batch.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("the serving query plans stateless (no state store operators)") {
    val orders = Tables.orders(spark, sf)
    val scored = ml.Inference.scoreWith(
      ml.Inference.features(orders), ml.Inference.fitMoments(orders))
    // the only aggregate lives in the broadcast one-row moments subtree;
    // the scored side itself must add no shuffle (hash exchange) — that
    // statelessness is what makes the same code streamable as-is
    val physical = scored.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).size
    assert(exchanges == 0, s"row-local scoring must not hash-shuffle:\n$physical")
  }
}
