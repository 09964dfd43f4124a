package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact scaled-integer dot product of two float-array columns.
  *
  * Each term x*y is an EXACT double (24-bit × 24-bit mantissas fit in 53),
  * scaled by 2^40 and floored to a long; the long sum is exact integer
  * arithmetic. Result: bit-deterministic under any partitioning or
  * evaluation order, and reproducible in any engine as
  * `SUM(CAST(FLOOR(x*y * 2^40) AS BIGINT))` — unlike a double fold, whose
  * value depends on summation order. Precision: 2^-40 per term (~1e-12),
  * far below any similarity threshold.
  *
  * A native Catalyst expression with codegen (a tight Java loop inside
  * whole-stage codegen) rather than a UDF or a higher-order `aggregate`
  * fold: the fold is interpreted per element (~2 ms per 64-dim dot);
  * this runs at memory speed.
  */
case class DotScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      s += math.floor(p * DotScaled.Scale).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graft_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long graft_s = 0L;
         |for (int graft_i = 0; graft_i < graft_n; graft_i++) {
         |  double graft_p = ((double) $a.getFloat(graft_i)) * ((double) $b.getFloat(graft_i));
         |  graft_s += (long) java.lang.Math.floor(graft_p * ${DotScaled.Scale}D);
         |}
         |${ev.value} = graft_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotScaled {
  /** 2^40 — scale factor for the fixed-point terms. */
  val Scale: Double = 1099511627776.0

  /** Register `graft_dot(arr, arr) -> bigint` in the session's function
    * registry so it is usable from `expr(...)` and SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotScaled(exprs(0), exprs(1)), "built-in")
}
