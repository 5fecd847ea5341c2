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

  /** Tunable scale knobs, read from the active session's `spark.graft.*`
    * confs at plan-build time with the test-scale values as defaults. The
    * oracle SQL generators read the SAME accessors, so a non-default knob
    * flows into both engines and parity holds at any setting. At 100 TB
    * these are the numbers a deployment sizes to its cluster (shards =
    * O(executors), k = O(√corpus) cells, …) — they must never require a
    * recompile.
    */
  object GraftConf {
    private def get(key: String, default: String): String =
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.conf.get(key, default)).getOrElse(default)

    /** Independent packing shards (`spark.graft.pack.shards`). */
    def packShards: Int = get("spark.graft.pack.shards", "8").toInt
    /** Packed-sequence token budget (`spark.graft.pack.seqTokens`). */
    def packSeqTokens: Int = get("spark.graft.pack.seqTokens", "512").toInt
    /** BM25 query terms, comma-separated (`spark.graft.bm25.terms`). */
    def bm25Terms: Seq[String] =
      get("spark.graft.bm25.terms", "vector,merge,stream").split(",").toSeq
    /** k-means cluster count (`spark.graft.kmeans.k`). */
    def kmeansK: Int = get("spark.graft.kmeans.k", "10").toInt
    /** k-means assignment rounds, ≥ 1 (`spark.graft.kmeans.iters`). */
    def kmeansIters: Int = get("spark.graft.kmeans.iters", "2").toInt
  }

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
