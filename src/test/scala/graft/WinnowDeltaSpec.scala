package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Incremental winnow-containment dedup (`winnowContainDeltaFrom`): the
  * delta-vs-persisted-fingerprint-index lane must reproduce the full
  * containment operator restricted to delta-touching pairs, survive a
  * parquet round-trip of the stored index, and fail fast on winnow conf
  * drift — the contract matrix the MinHash band index and SRP index
  * already carry.
  */
class WinnowDeltaSpec extends SparkSpec {

  private def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
    (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("n_shared"), r.getAs[Long]("c_pct"))).toSet

  test("winnowContainDeltaFrom ≡ full containment restricted to delta-touching pairs") {
    val got = toSet(TextAnalysis.dedupWinnowContainDelta(spark, sf).collect())
    Dedup.releaseIntermediates()
    val full = toSet(TextAnalysis.dedupWinnowContain(spark, sf).collect())
      .filter(p => p._1 % Dedup.DeltaIdMod == 0 || p._2 % Dedup.DeltaIdMod == 0)
    Dedup.releaseIntermediates()
    assert(got.nonEmpty, "planted dup phrases must straddle the delta split")
    assert(got == full,
      s"delta-only: ${got -- full}; full-only: ${full -- got}")
  }

  test("the stored index round-trips through parquet: stamp survives, pairs identical") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % Dedup.DeltaIdMod =!= 0)
    val delta = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-winnow-idx").toString
    TextAnalysis.winnowFpIndexOf(base).write.mode("overwrite").parquet(path)
    Dedup.releaseIntermediates()
    val stored = spark.read.parquet(path)
    val got = toSet(TextAnalysis.winnowContainDeltaFrom(stored, delta).collect())
    Dedup.releaseIntermediates()
    val inMem = toSet(
      TextAnalysis.winnowContainDeltaFrom(TextAnalysis.winnowFpIndexOf(base), delta).collect())
    Dedup.releaseIntermediates()
    assert(got.nonEmpty && got == inMem,
      s"stored-only: ${got -- inMem}; mem-only: ${inMem -- got}")
  }

  test("winnow conf drift between index build and delta query fails fast") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % Dedup.DeltaIdMod =!= 0)
    val delta = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
    val idx = TextAnalysis.winnowFpIndexOf(base)
    idx.write.mode("overwrite").parquet(
      java.nio.file.Files.createTempDirectory("graft-winnow-drift").toString + "/i")
    Dedup.releaseIntermediates()
    spark.conf.set("spark.graft.winnow.k", "3")
    try {
      val e = intercept[IllegalStateException] {
        TextAnalysis.winnowContainDeltaFrom(idx, delta).collect()
      }
      assert(e.getMessage.contains("k=4") && e.getMessage.contains("k=3"))
    } finally spark.conf.unset("spark.graft.winnow.k")
    Dedup.releaseIntermediates()
  }
}
