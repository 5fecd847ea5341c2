package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Operator-package helpers shared across all query implementations. */
package object operators {

  /** Conf flag: keep the terminal ORDER BY the driver/oracle contract needs
    * (deterministic row order for result hashing). Default true. Production
    * callers writing billion-row outputs set it to `false` and skip the
    * global range-shuffle + sort that would otherwise be the last (and at
    * 100 TB, dominant) stage of every per-document query.
    */
  val OrderedOutputKey = "spark.graft.orderedOutput"

  /** `contractOrderBy` = `orderBy` that exists only for the contract layer.
    * Used ONLY where ordering is presentation (stable output for hashing) —
    * never where it is semantic (top-k `orderBy(...).limit(n)` keeps plain
    * `orderBy`).
    */
  implicit class ContractOrderOps(private val df: DataFrame) extends AnyVal {
    private def ordered: Boolean =
      df.sparkSession.conf.get(OrderedOutputKey, "true").toBoolean
    def contractOrderBy(sortCol: String, sortCols: String*): DataFrame =
      if (ordered) df.orderBy(sortCol, sortCols: _*) else df
    def contractOrderBy(sortExprs: Column*): DataFrame =
      if (ordered) df.orderBy(sortExprs: _*) else df
  }
}
