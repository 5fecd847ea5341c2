package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Dedup, Similarity}
import graft.sources.Tables

/** Stored IVF-PQ index: the ANN "index once, query many" seam must be
  * bit-equivalent to the in-memory query, fail fast on conf drift, and
  * actually prune its reads to the probed cells.
  */
class AnnIndexSpec extends SparkSpec {

  private def freshIndex(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-annindex").toString
    AnnIndex.writeIvfPq(spark, sf, path)
    path
  }

  test("stored-index query ≡ in-memory ann_topk_ivfpq, bit for bit") {
    val path = freshIndex()
    val stored = AnnIndex.ivfPqTopK(spark, path, sf).collect().map(_.toSeq).toSeq
    val mem = Similarity.annTopKIvfPq(spark, sf).collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    assert(stored.nonEmpty && stored == mem,
      s"stored ${stored.take(3)}... vs mem ${mem.take(3)}...")
  }

  test("stored residual-index query ≡ in-memory ann_topk_ivfpq_r, bit for bit") {
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-r").toString
    AnnIndex.writeIvfPqR(spark, sf, path)
    val stored = AnnIndex.ivfPqRTopK(spark, path, sf).collect().map(_.toSeq).toSeq
    val mem = Similarity.annTopKIvfPqR(spark, sf).collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    assert(stored.nonEmpty && stored == mem,
      s"stored ${stored.take(3)}... vs mem ${mem.take(3)}...")
  }

  test("a residual store can never be read by the plain query path (or vice versa)") {
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-x").toString
    AnnIndex.writeIvfPqR(spark, sf, path)
    val e = intercept[IllegalStateException] {
      AnnIndex.ivfPqTopK(spark, path, sf).collect()
    }
    assert(e.getMessage.contains("residual=true") && e.getMessage.contains("residual=false"))
    val plain = freshIndex()
    val e2 = intercept[IllegalStateException] {
      AnnIndex.ivfPqRTopK(spark, plain, sf).collect()
    }
    assert(e2.getMessage.contains("residual=false") && e2.getMessage.contains("residual=true"))
    Dedup.releaseIntermediates()
  }

  test("conf drift between index build and query fails fast") {
    val path = freshIndex()
    spark.conf.set("spark.graft.ann.pqK", "16")
    try {
      val e = intercept[IllegalStateException] {
        AnnIndex.ivfPqTopK(spark, path, sf).collect()
      }
      assert(e.getMessage.contains("pqK=16") && e.getMessage.contains("pqK=32"))
    } finally spark.conf.unset("spark.graft.ann.pqK")
    Dedup.releaseIntermediates()
  }

  test("probe reads prune to probed cell directories (PartitionFilters, not data filters)") {
    val path = freshIndex()
    val df = AnnIndex.ivfPqTopK(spark, path, sf)
    val plan = df.queryExecution.executedPlan.toString
    Dedup.releaseIntermediates()
    val pf = plan.split('\n').find(l =>
      l.contains("PartitionFilters") && l.contains("cell")).getOrElse(
      fail(s"no cell PartitionFilters in stored-index scan:\n$plan"))
    // the literal isin must be a partition filter (directory pruning)
    assert(pf.contains("cell#") && (pf.contains("IN") || pf.contains("in(")), pf)
  }
}
