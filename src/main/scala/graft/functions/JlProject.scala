package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}

/** Sparse JL sign projection of a feature-hashed bucket list — the
  * row-local kernel of the chunk-embedding build, bit-identical to the
  * higher-order fold it replaces:
  *
  *   transform(signs, row -> aggregate(bvs, 0L,
  *     (a, e) -> a + e.sv * element_at(row, e.bucket + 1)))
  *
  * (exact long multiply-adds; integer addition is order-free, so the
  * loop order cannot move the result). HOFs are CodegenFallback and the
  * nOut×|buckets| fold interpreted per CHUNK cost ~410 µs at the 96-dim
  * band width — a 3.3 s single-task stage at sf0.1 and the dominant
  * per-row cost of every band/dedup/serving query; this expression is a
  * tight Java loop inside whole-stage codegen (~µs per chunk).
  *
  * Arguments: `bvs` array<struct<bucket:int, sv:bigint>> (the sparse
  * signed bucket counts), `signs` array<array<bigint>> (the nOut×dims
  * sign matrix, a foldable literal). Returns array<bigint> of length
  * nOut. */
case class JlProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(st: StructType, _), ArrayType(ArrayType(LongType, _), _)) =>
        st.fields.length == 2 &&
          st.fields(0).dataType == IntegerType &&
          st.fields(1).dataType == LongType
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_jl_project expects (array<struct<bucket:int,sv:bigint>>, " +
        s"array<array<bigint>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val bvs = l.asInstanceOf[ArrayData]
    val signs = r.asInstanceOf[ArrayData]
    val n = bvs.numElements()
    val m = signs.numElements()
    val bk = new Array[Int](n)
    val sv = new Array[Long](n)
    var e = 0
    while (e < n) {
      val row = bvs.getStruct(e, 2)
      bk(e) = row.getInt(0)
      sv(e) = row.getLong(1)
      e += 1
    }
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val srow = signs.getArray(j)
      var s = 0L
      var i = 0
      while (i < n) {
        s += sv(i) * srow.getLong(bk(i))
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bvs, signs) => {
      val n = ctx.freshName("jlN")
      val m = ctx.freshName("jlM")
      val bk = ctx.freshName("jlBk")
      val sv = ctx.freshName("jlSv")
      val out = ctx.freshName("jlOut")
      val e = ctx.freshName("jlE")
      val j = ctx.freshName("jlJ")
      val i = ctx.freshName("jlI")
      val row = ctx.freshName("jlRow")
      val srow = ctx.freshName("jlSRow")
      val acc = ctx.freshName("jlAcc")
      s"""
         |final int $n = $bvs.numElements();
         |final int $m = $signs.numElements();
         |final int[] $bk = new int[$n];
         |final long[] $sv = new long[$n];
         |for (int $e = 0; $e < $n; $e++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $bvs.getStruct($e, 2);
         |  $bk[$e] = $row.getInt(0);
         |  $sv[$e] = $row.getLong(1);
         |}
         |final long[] $out = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $srow = $signs.getArray($j);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $sv[$i] * $srow.getLong($bk[$i]);
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JlProject {
  def fromArgs(exprs: Seq[Expression]): JlProject = {
    require(exprs.length == 2,
      s"graft_jl_project(bvs, signs) takes exactly 2 arguments, got ${exprs.length}")
    JlProject(exprs(0), exprs(1))
  }

  /** Register `graft_jl_project(bvs, signs) -> array<bigint>` for use
    * from `expr(...)`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jl_project")))
      reg.createOrReplaceTempFunction(
        "graft_jl_project", exprs => fromArgs(exprs), "built-in")
  }
}
