package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BottomK, DotProduct, SimhashAgg}

/** Session extensions: registers graft's native expressions so they're
  * callable from SQL / `expr(...)` in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[BottomK].getName, "graft_bottomk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_bottomk(col, k) takes exactly 2 arguments")
        require(exprs(1).foldable, "graft_bottomk's k must be a literal integer")
        val k = exprs(1).eval().asInstanceOf[Number].intValue()
        BottomK(exprs.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_simhash(hi, lo) takes exactly 2 arguments")
        SimhashAgg(exprs.head, exprs(1)).toAggregateExpression()
      }))
  }
}
