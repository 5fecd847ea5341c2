package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd squared-L2 distance `‖a−b‖²` over two same-typed arrays
  * (`array<bigint>` → bigint, `array<double>` → double) — the hot inner loop
  * of the k-means assignment scan (SURVEY §2C kmeans_train), which evaluates
  * it vector × K-centroids times per Lloyd round.
  *
  * Why a Catalyst Expression and not `aggregate(zip_with(...))`: the builtin
  * higher-order functions allocate the zipped intermediate array and box the
  * lambda accumulator per element (the same reason [[DotProduct]] exists);
  * this compiles to a tight primitive loop inside WholeStageCodegen.
  *
  * The bigint variant is exact integer math (order-independent, bit-identical
  * to the DuckDB oracle); with 1e-6-grid unit vectors the accumulator peaks
  * at ~4e12·dims, far inside Long range.
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val types = Seq(left, right).map(_.dataType)
    val ok = types.forall {
      case ArrayType(LongType, _) => true
      case ArrayType(DoubleType, _) => true
      case _ => false
    } && types.map { case ArrayType(et, _) => et }.distinct.size == 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects two arrays of the same element type (bigint or double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = elemType

  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    elemType match {
      case LongType =>
        var acc = 0L
        var i = 0
        while (i < n) {
          val d = x.getLong(i) - y.getLong(i)
          acc += d * d
          i += 1
        }
        acc
      case DoubleType =>
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = x.getDouble(i) - y.getDouble(i)
          acc += d * d
          i += 1
        }
        acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (jt, getter) = elemType match {
      case LongType => ("long", "getLong")
      case DoubleType => ("double", "getDouble")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$jt $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $jt $d = $a.$getter($i) - $b.$getter($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
