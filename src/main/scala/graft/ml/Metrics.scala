package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE weighted confusion-metric arithmetic — sklearn's
  * `average='weighted'` over the two classes, from four confusion
  * counters. A single definition shared by Monitoring.modelPerf,
  * Monitoring.modelConsistency and CrossVal (and mirrored
  * expression-for-expression by their DuckDB oracle fragments): a fix
  * to the zero-denominator convention or a metric formula applied
  * anywhere else would silently desync the other marts and their
  * oracles. */
private[ml] object ConfusionMetrics {

  def safeDiv(num: Column, den: Column): Column =
    when(den > 0d, num / den).otherwise(lit(0d))

  /** (accuracy, weighted precision, weighted recall, weighted F1). */
  def weighted(tp0: Column, fp0: Column, tn0: Column, fn0: Column)
      : (Column, Column, Column, Column) = {
    val (tp, fp, tn, fn) =
      (tp0.cast("double"), fp0.cast("double"), tn0.cast("double"), fn0.cast("double"))
    val n = tp + fp + tn + fn
    val nPos = tp + fn
    val nNeg = tn + fp
    val pPos = safeDiv(tp, tp + fp)
    val pNeg = safeDiv(tn, tn + fn)
    val rPos = safeDiv(tp, nPos)
    val rNeg = safeDiv(tn, nNeg)
    val f1Pos = safeDiv(lit(2d) * pPos * rPos, pPos + rPos)
    val f1Neg = safeDiv(lit(2d) * pNeg * rNeg, pNeg + rNeg)
    ((tp + tn) / n,
      (nPos * pPos + nNeg * pNeg) / n,
      (nPos * rPos + nNeg * rNeg) / n,
      (nPos * f1Pos + nNeg * f1Neg) / n)
  }
}
