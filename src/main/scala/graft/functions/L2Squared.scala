package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * Null semantics match the `aggregate(zip_with(...))` formulation this
  * replaces: a length mismatch or a null element yields NULL (never a
  * silently-truncated "plausible" distance), and the per-element null check
  * compiles away entirely when the array type's `containsNull` is false —
  * the engine-built embedding columns — so the hot loop stays tight.
  *
  * The bigint variant is exact integer math (order-independent, bit-identical
  * to the DuckDB oracle); with 1e-6-grid unit vectors the accumulator peaks
  * at ~4e12·dims, far inside Long range.
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  private def anyContainsNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _                => true
    }
  }

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

  override def nullable: Boolean = true

  override def prettyName: String = "graft_l2sq"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = anyContainsNull
    elemType match {
      case LongType =>
        var acc = 0L
        var i = 0
        while (i < n) {
          if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
          val d = x.getLong(i) - y.getLong(i)
          acc += d * d
          i += 1
        }
        acc
      case DoubleType =>
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
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
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val elemNullCheck =
      if (anyContainsNull)
        s"""if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
           |  ${ev.isNull} = true; break;
           |}""".stripMargin
      else ""
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n == ${rightGen.value}.numElements()) {
            ${ev.isNull} = false;
            $jt $acc = 0;
            for (int $i = 0; $i < $n; $i++) {
              $elemNullCheck
              $jt $d = ${leftGen.value}.$getter($i) - ${rightGen.value}.$getter($i);
              $acc += $d * $d;
            }
            if (!${ev.isNull}) {
              ${ev.value} = $acc;
            }
          }
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
