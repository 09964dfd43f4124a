package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two bigint-array columns — bit-identical
  * to the row-local fold
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, t) -> s + t)`
  * (exact long multiply-add, order-free), which the DuckDB oracles
  * mirror as a positional SUM.
  *
  * A native Catalyst expression with codegen (a tight Java loop inside
  * whole-stage codegen) rather than the higher-order fold: HOFs are
  * CodegenFallback, so a fold inside a JOIN CONDITION is interpreted
  * per candidate pair — measured ~10 µs per 16-dim dot vs ~50 ns here,
  * which turned the multiprobe dedup candidate join into a 170 s
  * single-core stage at sf0.1 (jstack: 100% in ArrayAggregate.eval).
  * The chunk-grain embeddings are exact integer vectors, so unlike
  * [[DotScaled]] no fixed-point scaling is needed.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType

  // analysis-time type check: array<int> or array<double> inputs would
  // otherwise pass analysis and codegen would read 8-byte long slots
  // out of mis-sized storage — silently wrong values
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // fail loud on a length mismatch: every caller dots fixed-dim
    // embeddings from one builder, so unequal lengths mean an upstream
    // dim bug — a silent min()-truncated dot would return a plausible
    // wrong number where the fold this replaced null-propagated
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot_long: length mismatch ($n vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed names: two calls compiled into one
      // whole-stage-codegen method must not collide (the DotScaled lesson)
      val n = ctx.freshName("dlN")
      val s = ctx.freshName("dlS")
      val i = ctx.freshName("dlI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot_long: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Arity-checked constructor shared by both registration paths. */
  def fromArgs(exprs: Seq[Expression]): DotLong = {
    require(exprs.length == 2,
      s"graft_dot_long(array<bigint>, array<bigint>) takes exactly 2 arguments, got ${exprs.length}")
    DotLong(exprs(0), exprs(1))
  }

  /** Register `graft_dot_long(arr, arr) -> bigint` in the session's
    * function registry so it is usable from `expr(...)`. Idempotent, and
    * a no-op when already registered (re-registration per call flooded
    * the log with SimpleFunctionRegistry WARNs). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_long")))
      reg.createOrReplaceTempFunction(
        "graft_dot_long", exprs => fromArgs(exprs), "built-in")
  }
}
