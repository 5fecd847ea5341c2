package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_max_run(sorted_string_array)`: length of the longest run of
  * EQUAL ADJACENT elements — over a sorted array, the maximum element
  * multiplicity (r18). Replaces the interpreted
  * `aggregate(array_sort(xs), named_struct(prev, run, best), ...)` chain,
  * which allocated a 3-field struct per element per row on the
  * quality-filter hot path. Null elements compare equal to each other
  * (`<=>` semantics, matching the lambda it replaces); an empty or null
  * array yields 0 / null respectively.
  */
object MaxRun {
  def maxRun(arr: ArrayData): Long = {
    val n = arr.numElements()
    var best = 0L
    var run = 0L
    var prev: UTF8String = null
    var prevNull = false
    var started = false
    var i = 0
    while (i < n) {
      val isNull = arr.isNullAt(i)
      val v = if (isNull) null else arr.getUTF8String(i)
      val same = started &&
        ((isNull && prevNull) || (!isNull && !prevNull && v.equals(prev)))
      run = if (same) run + 1 else 1
      if (run > best) best = run
      prev = v; prevNull = isNull; started = true
      i += 1
    }
    best
  }
}

case class MaxRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_max_run expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_run"

  override protected def nullSafeEval(input: Any): Any =
    MaxRun.maxRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MaxRun.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.maxRun($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
