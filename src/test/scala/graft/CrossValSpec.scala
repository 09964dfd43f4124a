package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.CrossVal

/** CV-metrics and robustness marts: structural and statistical
  * properties the DuckDB oracle can't see (fold exhaustiveness, rollup
  * consistency, clean-baseline invariance across noise levels). */
class CrossValSpec extends AnyFunSuite {
  import TestSession._

  test("cv metrics: 5 exhaustive folds, fold sizes sum to the order count, rollup matches the folds") {
    val orders = Tables.orders(spark, sf)
    val r = CrossVal.cvMetrics(orders).collect()
    assert(r.length == 5)
    assert(r.map(_.getAs[Int]("fold")).toSeq == Seq(0, 1, 2, 3, 4))
    assert(r.map(_.getAs[Long]("n_test")).sum == orders.count())
    val accs = r.map(_.getAs[Double]("accuracy"))
    accs.foreach(a => assert(a >= 0d && a <= 1d))
    // every row carries the same rollup, and it matches the fold accuracies
    val mean = accs.sum / accs.length
    assert(r.map(_.getAs[Double]("cv_mean_accuracy")).distinct.length == 1)
    assert(math.abs(r.head.getAs[Double]("cv_mean_accuracy") - mean) < 1e-6)
    val std = math.sqrt(accs.map(a => a * a).sum / accs.length - mean * mean)
    assert(math.abs(r.head.getAs[Double]("cv_std_accuracy") - std) < 1e-6)
  }

  test("cv metrics: per-fold scaler excludes the fold (differs from the leaked global scaler)") {
    val orders = Tables.orders(spark, sf)
    val cv = CrossVal.cvMetrics(orders).collect()
      .map(r => r.getAs[Int]("fold") -> r.getAs[Double]("accuracy")).toMap
    // leaked twin: score with the GLOBAL scaler (ensembleScore), same
    // folds and label — if cvMetrics leaked the fold into its scaler,
    // every fold accuracy would equal this
    val leaked = graft.ml.Inference.ensembleScore(orders)
      .join(orders.select(col("o_orderkey"),
        (substring(col("o_orderpriority"), 1, 1).cast("double") <= 2.0d).as("actual")),
        "o_orderkey")
      .withColumn("fold", expr(
        "cast((instr('0123456789abcdef', substr(md5(cast(o_orderkey as string)), 1, 1)) - 1) % 5 as int)"))
      .groupBy("fold")
      .agg((sum(when(col("prediction") === col("actual"), 1L).otherwise(0L)).cast("double")
        / count(lit(1))).as("acc"))
      .collect().map(r => r.getAs[Int]("fold") -> r.getAs[Double]("acc")).toMap
    assert(cv.keySet == leaked.keySet)
    val diffs = cv.keys.count(f => math.abs(cv(f) - leaked(f)) > 1e-9)
    assert(diffs > 0,
      s"every fold scored identically to the leaked global scaler — fold exclusion not live\ncv=$cv\nleaked=$leaked")
  }

  test("missing-feature impact: 12 rows, replacement is live, drop reconciles") {
    val r = CrossVal.missingFeatureImpact(Tables.orders(spark, sf)).collect()
    assert(r.length == 12)
    r.foreach { row =>
      val base = row.getAs[Double]("baseline_accuracy")
      val acc = row.getAs[Double]("accuracy")
      assert(math.abs((base - acc) - row.getAs[Double]("accuracy_drop")) < 2e-6)
      assert(acc >= 0d && acc <= 1d)
    }
    // the median replacement must actually move at least one model's
    // accuracy per feature (the twins all read every feature). NOTE:
    // drops can be NEGATIVE here — the mock models are fixed formulas,
    // not fitted to the label, so blanking a feature can align the
    // scores with the majority class and IMPROVE raw accuracy; the mart
    // reports the signed profile exactly as the reference records it.
    Seq("f1", "f2", "f3").foreach { f =>
      val drops = r.filter(_.getAs[String]("missing_feature") == f)
        .map(_.getAs[Double]("accuracy_drop"))
      assert(drops.exists(d => math.abs(d) > 0d),
        s"median replacement of $f moved no model — replacement not wired?")
    }
  }

  test("model robustness: 12 rows, stable baseline per model, drop = baseline - accuracy") {
    val r = CrossVal.modelRobustness(Tables.orders(spark, sf)).collect()
    assert(r.length == 12)
    val models = r.map(_.getAs[String]("model")).distinct.sorted
    assert(models.toSeq == Seq("ens", "nn", "rf", "xgb"))
    r.groupBy(_.getAs[String]("model")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("baseline_accuracy")).distinct.length == 1,
        "baseline accuracy must not vary with noise level")
    }
    r.foreach { row =>
      val base = row.getAs[Double]("baseline_accuracy")
      val acc = row.getAs[Double]("accuracy")
      val drop = row.getAs[Double]("accuracy_drop")
      assert(math.abs((base - acc) - drop) < 2e-6, "drop must be baseline - accuracy")
      assert(acc >= 0d && acc <= 1d)
    }
  }
}
