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

  test("compactIvfPq: appends fragment cell dirs; compaction yields one file per cell, answers bit-equal, stamp survives") {
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-c").toString
    val embs = Tables.embeddings(spark, sf)
    AnnIndex.writeIvfPqFrom(embs.filter(col("vec_id") % 3 =!= 2), path)
    AnnIndex.appendToIvfPq(spark, path, embs.filter(col("vec_id") % 3 === 2))
    val before = AnnIndex.ivfPqTopKFrom(spark, path, embs).collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    def filesPerCell(): Map[String, Int] = {
      val dirs = Option(new java.io.File(s"$path/codes").listFiles()).getOrElse(Array.empty)
      dirs.filter(d => d.isDirectory && d.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    }
    val frag = filesPerCell()
    assert(frag.values.exists(_ > 1),
      s"an append should fragment at least one cell directory, got $frag")
    AnnIndex.compactIvfPq(spark, path)
    val compacted = filesPerCell()
    assert(compacted.nonEmpty && compacted.values.forall(_ == 1),
      s"compaction must leave exactly one file per cell: $compacted")
    // the read path re-validates the stamp — a lost stamp would throw here
    val after = AnnIndex.ivfPqTopKFrom(spark, path, embs).collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    assert(after == before, "compaction changed stored-index answers")
  }

  test("retractFromIvfPq: append ∘ retract = identity; retracted vectors never return") {
    val embs = Tables.embeddings(spark, sf)
    val isD = col("vec_id") % 3 === 2
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-retract").toString
    AnnIndex.writeIvfPqFrom(embs.filter(!isD), path)
    val baseline = AnnIndex.ivfPqTopKFrom(spark, path, embs.filter(!isD))
      .collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    // a crawl appended then taken down leaves the store's answers bit-equal
    AnnIndex.appendToIvfPq(spark, path, embs.filter(isD))
    val withCrawl = AnnIndex.ivfPqTopKFrom(spark, path, embs)
      .collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    AnnIndex.retractFromIvfPq(spark, path,
      embs.filter(isD).select(col("vec_id").as("doc_id")))
    val roundTrip = AnnIndex.ivfPqTopKFrom(spark, path, embs.filter(!isD))
      .collect().map(_.toSeq).toSeq
    Dedup.releaseIntermediates()
    assert(roundTrip.nonEmpty && roundTrip == baseline,
      "append then retract must be the identity")
    assert(withCrawl != baseline,
      "vacuous: the appended crawl must have changed some answer for the identity to mean anything")
    // the stamp survives the rewrite and retracted ids are unreturnable
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.filter(col("vec_id") % 3 === 2).count() == 0,
      "retracted vectors must leave the code table")
    assert(!roundTrip.exists(r => r(2).asInstanceOf[Long] % 3 == 2))
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

  test("appendToIvfPq: encode-only append ≡ one-shot encode of the union under the stored quantizer") {
    import graft.operators.Clustering
    val embs = Tables.embeddings(spark, sf)
    // delta = a new crawl: vec_id remapped high (disjoint by contract),
    // including an exact copy of query 0's vector — after append the
    // query path must surface the new arrival as query 0's top hit
    val isDelta = col("vec_id") % 5 === 3 && col("vec_id") >= Similarity.NumQueries
    val base = embs.filter(!isDelta)
    val q0dup = embs.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"), col("label"))
    val delta = embs.filter(isDelta)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"), col("label"))
      .unionByName(q0dup)
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-app").toString
    AnnIndex.writeIvfPqFrom(base, path)
    AnnIndex.appendToIvfPq(spark, path, delta)
    // 1. stored codes after append == the shared encode over base ∪ delta
    //    under the STORED artifacts (bit-equal: same arithmetic, one path)
    val cents = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val expected = AnnIndex.encodeWithArtifacts(
        Clustering.scaledEmbOf(base.unionByName(delta)), cents, cb, residual = false)
      .select(col("vec_id"), col("codes"), col("cell").cast("long"))
      .collect().map(_.toSeq).toSet
    val stored = spark.read.parquet(s"$path/codes")
      .select(col("vec_id"), col("codes"), col("cell").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(stored == expected,
      s"stored ${stored.size} codes != expected ${expected.size}")
    // 2. the appended exact-duplicate is discoverable end to end: query 0's
    //    top stored-index hit is the new arrival (same cell, ADC + exact
    //    re-rank both maximal at cos ≈ 1)
    val top = AnnIndex.ivfPqTopKFrom(spark, path, base.unionByName(delta))
      .filter(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").collect()
    Dedup.releaseIntermediates()
    assert(top.nonEmpty && top.head.getLong(0) == 1000000L,
      s"appended duplicate of query 0 not its top hit: ${top.toSeq}")
  }

  test("appendToIvfPq auto-detects a residual store and encodes residuals") {
    import graft.operators.Clustering
    val embs = Tables.embeddings(spark, sf)
    val isDelta = col("vec_id") % 5 === 3 && col("vec_id") >= Similarity.NumQueries
    val base = embs.filter(!isDelta)
    val delta = embs.filter(isDelta)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"), col("label"))
    val path = java.nio.file.Files.createTempDirectory("graft-annindex-appr").toString
    AnnIndex.writeIvfPqRFrom(base, path)
    AnnIndex.appendToIvfPq(spark, path, delta)
    val cents = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val expected = AnnIndex.encodeWithArtifacts(
        Clustering.scaledEmbOf(base.unionByName(delta)), cents, cb, residual = true)
      .select(col("vec_id"), col("codes"), col("cell").cast("long"))
      .collect().map(_.toSeq).toSet
    val stored = spark.read.parquet(s"$path/codes")
      .select(col("vec_id"), col("codes"), col("cell").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(stored == expected, s"stored ${stored.size} != expected ${expected.size}")
    // residual query path reads the appended store without drift errors
    val n = AnnIndex.ivfPqRTopKFrom(spark, path, base.unionByName(delta)).count()
    Dedup.releaseIntermediates()
    assert(n > 0)
  }

  test("appendToIvfPq fails fast on conf drift and on an unstamped store") {
    val path = freshIndex()
    val delta = Tables.embeddings(spark, sf).limit(5)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"), col("label"))
    spark.conf.set("spark.graft.ann.pqK", "16")
    try {
      val e = intercept[IllegalStateException] {
        AnnIndex.appendToIvfPq(spark, path, delta)
      }
      assert(e.getMessage.contains("pqK=16") && e.getMessage.contains("pqK=32"))
    } finally spark.conf.unset("spark.graft.ann.pqK")
    // a foreign (unstamped) codebook table must be refused, not decoded blind
    val foreign = java.nio.file.Files.createTempDirectory("graft-annindex-f").toString
    val cbRaw = spark.read.parquet(s"$path/codebooks")
    cbRaw.select(cbRaw.columns.map(c =>
        col(c).as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
      .write.mode("overwrite").parquet(s"$foreign/codebooks")
    spark.read.parquet(s"$path/centroids").write.mode("overwrite").parquet(s"$foreign/centroids")
    val e2 = intercept[IllegalStateException] {
      AnnIndex.appendToIvfPq(spark, foreign, delta)
    }
    assert(e2.getMessage.contains("no graft.ann.ivfpq conf stamp"), e2.getMessage)
    // valid codebooks but FOREIGN (unstamped) centroids must also be
    // refused (r11 advice): an append encodes against the centroids and
    // persists the codes, so drifted centroids would durably mis-assign
    // cells — the codebook check alone cannot catch a swapped centroid table
    val foreign2 = java.nio.file.Files.createTempDirectory("graft-annindex-f2").toString
    spark.read.parquet(s"$path/codebooks").write.mode("overwrite")
      .parquet(s"$foreign2/codebooks")
    val ctRaw = spark.read.parquet(s"$path/centroids")
    ctRaw.select(ctRaw.columns.map(c =>
        col(c).as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
      .write.mode("overwrite").parquet(s"$foreign2/centroids")
    val e3 = intercept[IllegalStateException] {
      AnnIndex.appendToIvfPq(spark, foreign2, delta)
    }
    assert(e3.getMessage.contains("centroids") &&
      e3.getMessage.contains("no graft.ann.ivfpq conf stamp"), e3.getMessage)
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
