package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Dedup, PostingsIndex, Similarity}
import graft.sources.Tables

/** `hybrid_search_rrf_stored` and `dedup_media_delta` (r12): the stored
  * retrieval stack's lexical list must be BIT-EQUAL to the scan hybrid's
  * (same integers through the shared arithmetic), the fused output must
  * follow the stored dense list, and the media delta must reproduce the
  * full-corpus grouping restricted to delta rows.
  */
class HybridStoredSpec extends SparkSpec {

  test("stored hybrid: lexical ranks bit-equal to the scan hybrid; fusion follows the stored dense list") {
    val docs = Tables.documents(spark, sf)
    val embs = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-hybrid-spec").toString
    AnnIndex.writeIvfPq(spark, sf, s"$path/ivfpq")
    PostingsIndex.writePostingsFrom(docs, s"$path/lex")
    val stored = Similarity.hybridSearchRrfStoredFrom(spark, path, docs, embs).collect()
    Dedup.releaseIntermediates()
    val scan = Similarity.hybridSearchRrf(spark, sf).collect()
    Dedup.releaseIntermediates()
    def lexRanks(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(r => !r.isNullAt(r.fieldIndex("r_lex")))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("r_lex")).toMap
    // the lexical side reads different bytes (postings store vs corpus
    // scan) but the SAME integers — identical ranked list
    assert(lexRanks(stored) == lexRanks(scan),
      "stored lexical list must be bit-equal to the scan hybrid's")
    // dense side comes from the IVF-PQ store at rrf.depth: every stored
    // r_dense row appears in that list with the same rank
    val densePairs = AnnIndex.ivfPqTopKFrom(spark, s"$path/ivfpq", embs,
        topK = graft.operators.GraftConf.rrfDepth).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("rank")).toMap
    Dedup.releaseIntermediates()
    val storedDense = stored.filter(r => !r.isNullAt(r.fieldIndex("r_dense")))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("r_dense")).toMap
    assert(storedDense.nonEmpty && storedDense.forall { case (k, v) =>
      densePairs.get(k).contains(v) },
      "stored hybrid's dense ranks must be exactly the stored-index list")
    // the postings read carries the query vocabulary as a PUSHED literal
    // filter (static pruning over the range-partitioned layout)
    val postPlan = Similarity.hybridSearchRrfStoredFrom(spark, path, docs, embs)
      .queryExecution.executedPlan.toString
    Dedup.releaseIntermediates()
    assert(postPlan.contains("PushedFilters: [In(word"), postPlan.take(1500))
    // fusion arithmetic: rrf_s recomputed from the rank columns
    val k = graft.operators.GraftConf.rrfK.toLong
    val scale = 1000000000000000L
    stored.foreach { r =>
      val rd = if (r.isNullAt(r.fieldIndex("r_dense"))) 0L
        else scale / (k + r.getAs[Long]("r_dense"))
      val rl = if (r.isNullAt(r.fieldIndex("r_lex"))) 0L
        else scale / (k + r.getAs[Long]("r_lex"))
      assert(r.getAs[Long]("rrf_s") == rd + rl, s"fusion arithmetic drift at $r")
    }
  }

  test("vocab pushdown cap: above the cap the postings read falls back to a broadcast semi-join, results identical") {
    val docs = Tables.documents(spark, sf)
    val embs = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft-hybrid-cap").toString
    AnnIndex.writeIvfPq(spark, sf, s"$path/ivfpq")
    PostingsIndex.writePostingsFrom(docs, s"$path/lex")
    val pushed = Similarity.hybridSearchRrfStoredFrom(spark, path, docs, embs)
      .collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    spark.conf.set("spark.graft.rrf.vocabPushdownMax", "1")
    try {
      val fb = Similarity.hybridSearchRrfStoredFrom(spark, path, docs, embs)
      val plan = fb.queryExecution.executedPlan.toString
      assert(!plan.contains("PushedFilters: [In(word"),
        "above the cap no literal IN-list may reach the postings scan")
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"the fallback must be a broadcast left-semi join: ${plan.take(1500)}")
      val viaFallback = fb.collect().map(_.toSeq).toSeq
      Dedup.releaseIntermediates()
      assert(viaFallback == pushed,
        "the broadcast fallback must be result-identical to the pushed IN-list")
    } finally spark.conf.unset("spark.graft.rrf.vocabPushdownMax")
  }

  test("dedup_media_delta ≡ full-corpus (modality, hash) grouping restricted to delta; modality partitions byte-twins") {
    import spark.implicits._
    val inc = Dedup.dedupMediaDelta(spark, sf).collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    val docs = Tables.documents(spark, sf)
    val all = Dedup.mediaHashIndexOf(docs)
    val g = all.groupBy("mod3", "h").agg(
      count(lit(1)).as("group_size"),
      min(when(col("doc_id") % Dedup.DeltaIdMod =!= 0, col("doc_id"))).as("bm"),
      min(when(col("doc_id") % Dedup.DeltaIdMod === 0, col("doc_id"))).as("dm"))
    val full = all.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
      .join(g, Seq("mod3", "h"))
      .withColumn("canonical_doc",
        when(col("bm").isNull, col("dm")).otherwise(least(col("bm"), col("dm"))))
      .withColumn("status",
        when(col("group_size") === 1, "new")
          .when(col("bm").isNotNull, "dup_of_base")
          .when(col("canonical_doc") === col("doc_id"), "first_copy")
          .otherwise("dup_in_delta"))
      .select(col("doc_id"), col("mod3").as("modality"), col("h").as("media_hash"),
        col("canonical_doc"), col("group_size"), col("status"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == full)
    // parquet round-trip of the stored index is verdict-identical
    val dir = java.nio.file.Files.createTempDirectory("graft-mediaidx").toString
    val isDelta = col("doc_id") % Dedup.DeltaIdMod === 0
    Dedup.mediaHashIndexOf(docs.filter(!isDelta))
      .write.mode("overwrite").parquet(s"$dir/media_idx")
    val viaParquet = Dedup.dedupMediaDeltaFrom(
        spark.read.parquet(s"$dir/media_idx"), docs.filter(isDelta))
      .collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    assert(viaParquet == inc)
    // byte-identical payloads of DIFFERENT modalities never group: ids
    // 30 (delta, mod3=0) and 31/32 (base, mod3 1/2) share text, so the
    // delta doc's group holds only same-modality members
    val planted = Seq((30L, "omega psi chi"), (31L, "omega psi chi"),
        (32L, "omega psi chi"), (60L, "omega psi chi"))
      .toDF("doc_id", "text")
    val pd = planted.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
    val verdicts = Dedup.dedupMediaDeltaFrom(
        Dedup.mediaHashIndexOf(planted.filter(col("doc_id") % Dedup.DeltaIdMod =!= 0)), pd)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_doc"), r.getAs[Long]("group_size"),
          r.getAs[String]("status"))).toMap
    Dedup.releaseIntermediates()
    // 30 and 60 are both delta, both mod3=0, same text → one group of 2;
    // base docs 31/32 (other modalities) never join it
    assert(verdicts(30L) == ((30L, 2L, "first_copy")))
    assert(verdicts(60L) == ((30L, 2L, "dup_in_delta")))
  }
}
