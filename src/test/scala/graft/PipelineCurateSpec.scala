package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** `pipeline_curate` is the shared-lanes composition of three independent
  * queries — these specs pin that sharing the persisted tagged pair table
  * changes the COST shape only, never a single output value.
  */
class PipelineCurateSpec extends SparkSpec {

  private def pipeline = Curation.pipelineCurate(spark, sf)

  test("funnel columns are row-identical to corpus_curate") {
    val funnelCols = Seq("doc_id", "q_keep", "contam_exact", "contam_fuzzy",
      "dedup_keep", "kept", "stage")
    val got = pipeline.select(funnelCols.map(col): _*).collect().map(_.toSeq)
    val want = Curation.corpusCurate(spark, sf)
      .select(funnelCols.map(col): _*).collect().map(_.toSeq)
    Dedup.releaseIntermediates()
    assert(got.length == want.length && got.sameElements(want),
      s"pipeline funnel diverges from corpus_curate (${got.length} vs ${want.length} rows)")
  }

  test("dedup_keep column reproduces the unified keep-list membership") {
    val evalMod = Curation.FuzzyEvalMod
    val keptByPipeline = pipeline.filter(col("dedup_keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepList = Dedup.dedupKeepUnified(spark, sf)
      .filter(col("doc_id") % evalMod =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Dedup.releaseIntermediates()
    assert(keptByPipeline == keepList,
      s"diff: ${(keptByPipeline -- keepList) ++ (keepList -- keptByPipeline)}")
  }

  test("per-doc lanes equal the tagged edge set dedup_lanes_report aggregates") {
    val tagged = Dedup.taggedPairsOf(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf))
    val want = tagged
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"), col("lane"))
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_set(col("lane"))), "+").as("lanes"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = pipeline.select("doc_id", "lanes").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.releaseIntermediates()
    val evalMod = Curation.FuzzyEvalMod
    got.foreach { case (id, lanes) =>
      assert(lanes == want.getOrElse(id, "none"), s"doc $id: $lanes")
    }
    // and every non-eval doc the lanes touch is visible in the pipeline
    want.keys.filter(_ % evalMod != 0).foreach { id =>
      assert(got.contains(id), s"doc $id touched by a lane but absent")
    }
  }

  test("cluster_size matches dedup_keep_unified for surviving canonicals") {
    val evalMod = Curation.FuzzyEvalMod
    val sizes = Dedup.dedupKeepUnified(spark, sf)
      .filter(col("doc_id") % evalMod =!= 0)
      .select("doc_id", "cluster_size").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = pipeline.filter(col("dedup_keep"))
      .select("doc_id", "cluster_size").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseIntermediates()
    assert(got == sizes)
  }
}
