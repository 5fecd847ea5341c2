package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-handling join utility (SURVEY §3/§4): salted equi-join for when a
  * few hot keys would otherwise overwhelm single reducers and the build
  * side is too large to broadcast.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is the
  * explicit pre-partitioning form — the left (skewed) side gets a
  * deterministic salt in [0, salts), the right side is replicated `salts`
  * times, and the join key becomes (key, salt). Reducer fan-out for a hot
  * key goes from 1 to `salts`.
  *
  * Wired consumer: the dedup verify re-joins
  * ([[Dedup]]'s `verifySideJoin`, conf `spark.graft.dedup.verifySalts`) —
  * a boilerplate template near-duplicated 10⁴× lands in ~10⁴ candidate
  * pairs whose doc_id key would otherwise hash to one reducer.
  */
object Skew {

  /** Inner equi-join `left.key == right.key` with `salts`-way salting.
    * The salt on the left is deterministic (hash of a row-identifying
    * column) so results are reproducible.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: String, salts: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(col(saltBy)), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key)).drop("__salt")
  }
}
