package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Incremental SimHash dedup (`dedup_simhash_delta`): the
  * delta-vs-stored-signature-index lane must reproduce the full-corpus
  * `dedup_simhash_pairs` restricted to delta-touching pairs — at the
  * operator's default carving AND under an alternate split through the
  * `dedupSimhashDeltaFrom` seam (split invariance), the contract matrix
  * every other incremental lane already carries (DedupDeltaSpec /
  * SrpDeltaSpec / WinnowDeltaSpec equivalents).
  */
class SimhashDeltaSpec extends SparkSpec {

  private def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
    (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSet

  private lazy val fullPairs: Set[(Long, Long, Long)] = {
    val full = toSet(Dedup.dedupSimhashPairs(spark, sf).collect())
    Dedup.releaseIntermediates()
    full
  }

  test("dedup_simhash_delta ≡ full-corpus pairs restricted to delta-touching (default carving)") {
    val got = toSet(Dedup.dedupSimhashDelta(spark, sf).collect())
    Dedup.releaseIntermediates()
    val want = fullPairs.filter(p =>
      p._1 % Dedup.DeltaIdMod == 0 || p._2 % Dedup.DeltaIdMod == 0)
    assert(want.nonEmpty, "the corpus must carry delta-touching simhash pairs")
    assert(got == want,
      s"delta-only: ${(got -- want).take(5)}; full-only: ${(want -- got).take(5)}")
  }

  test("split invariance: an alternate mod-7 carving through the From seam matches the same restriction") {
    val docs = Tables.documents(spark, sf)
    val isDelta = col("doc_id") % 7 === 0
    val got = toSet(Dedup.dedupSimhashDeltaFrom(
      Dedup.simhashIndexOf(docs.filter(!isDelta)), docs.filter(isDelta)).collect())
    Dedup.releaseIntermediates()
    val want = fullPairs.filter(p => p._1 % 7 == 0 || p._2 % 7 == 0)
    assert(want.nonEmpty)
    assert(got == want,
      s"delta-only: ${(got -- want).take(5)}; full-only: ${(want -- got).take(5)}")
  }
}
