package graft

import org.apache.spark.sql.functions._

/** Regression: documents shorter than the shingle width must not crash
  * under Spark 4's default ANSI mode (element_at past the array end throws)
  * — they get empty/degenerate shingle sets instead.
  */
class ShortDocSpec extends SparkSpec {

  private def shortDocsDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_short").toString
    Seq(
      (0L, "one", "en", "src0", 3L),
      (1L, "two words", "en", "src0", 9L),
      (2L, "three tiny words here now plus a few more to pass five", "en", "src1", 54L),
      (3L, "", "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ANSI mode is actually on (the guard is load-bearing)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("dedup shingle ops survive 1-2 word documents") {
    val dir = shortDocsDir()
    // empty candidate sets, but no INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    assert(operators.Dedup.dedupNgramJaccard(spark, dir).count() == 0)
    assert(operators.Dedup.dedupMinhashLsh(spark, dir).count() == 0)
  }

  test("doc_fingerprint survives short documents and stays total") {
    val dir = shortDocsDir()
    val f = operators.TextAnalysis.docFingerprint(spark, dir).collect()
    assert(f.length == 4)
    assert(f.forall(r => r.getAs[String]("winnow_fp") != null))
  }

  test("token_count survives empty text (no ANSI divide-by-zero)") {
    val dir = shortDocsDir()
    val t = operators.TextAnalysis.tokenCount(spark, dir).collect()
    assert(t.length == 4)
    val empty = t.find(_.getAs[Long]("doc_id") == 3L).get
    assert(empty.getAs[Long]("bpe_tokens") == 0)
    assert(empty.isNullAt(empty.fieldIndex("chars_per_token")))
  }

  test("curation ops survive short/empty documents") {
    val dir = shortDocsDir()
    val qf = operators.Curation.qualityFilter(spark, dir).collect()
    assert(qf.length == 4 && qf.forall(!_.getAs[Boolean]("keep"))) // all too_short
    // doc 0 is the eval set (0 % 97 == 0); 1-2 word train docs have 0 ngrams
    val dc = operators.Curation.decontaminate(spark, dir).collect()
    assert(dc.length == 3)
    assert(dc.filter(_.getAs[Long]("n_ngrams") == 0L).map(_.getAs[Long]("doc_id")).sorted
      .sameElements(Array(1L, 3L)))
    assert(operators.Curation.packSequences(spark, dir).count() == 4)
    assert(operators.Curation.domainMixSample(spark, dir).collect()
      .forall(_.getAs[Double]("rate") == 1.0)) // tiny sources -> rate clamps
    // no query term appears anywhere -> empty result, not a crash
    assert(operators.Similarity.bm25Search(spark, dir).count() == 0)
    // no near-dup pairs -> empty cluster set, not an NPE on the empty sum
    assert(operators.Dedup.dedupClusters(spark, dir).count() == 0)
    operators.Dedup.releaseIntermediates()
    spark.catalog.clearCache()
  }

  test("winnow ops survive short/empty documents") {
    val dir = shortDocsDir()
    // docs 0/1/3 are under winnow.k words: zero fingerprints, zero
    // windows — totals stay total; doc 2 (12 words) fingerprints alone,
    // so nothing pairs, nothing cuts, nothing spans anywhere
    val dw = operators.TextAnalysis.docWinnow(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_fps")).toMap
    assert(dw.keySet == Set(0L, 1L, 2L, 3L))
    assert(Seq(0L, 1L, 3L).forall(dw(_) == 0L) && dw(2L) > 0L)
    assert(operators.TextAnalysis.winnowMatches(spark, dir).count() == 0)
    assert(operators.TextAnalysis.winnowSpans(spark, dir).count() == 0)
    assert(operators.TextAnalysis.dedupWinnowContain(spark, dir).count() == 0)
    assert(operators.TextAnalysis.dedupWinnowContainDelta(spark, dir).count() == 0)
    // the cut is the identity on an un-matched corpus: texts pass through
    val cut = operators.TextAnalysis.winnowCut(spark, dir).collect()
    assert(cut.length == 4 && cut.forall(_.getAs[Long]("n_words_cut") == 0L))
    operators.Dedup.releaseIntermediates()
    spark.catalog.clearCache()
  }

  test("line-dedup, entropy, KN, and BPE ops survive short/empty documents") {
    val dir = shortDocsDir()
    // dedup_lines: every doc is one (sub-width) unit, all distinct -> identity
    val dl = operators.TextAnalysis.dedupLines(spark, dir).collect()
    assert(dl.length == 4 && dl.forall(_.getAs[Long]("n_chunks_cut") == 0L))
    assert(operators.TextAnalysis.dedupLinesReport(spark, dir).collect()
      .forall(_.getAs[Long]("n_units_cut") == 0L))
    // doc_entropy: the empty doc's single "" token gives ln(1) = 0, not NaN
    val ent = operators.TextAnalysis.docEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(ent.size == 4 && ent(3L) == 0.0 && ent(0L) == 0.0 && ent(2L) > 0.0)
    // KN: 0/1-word docs score by the unigram head alone; all rows total
    val kn = operators.TextAnalysis.docPerplexityKn(spark, dir).collect()
    assert(kn.length == 4 && kn.forall(!_.getAs[Double]("nll").isNaN))
    // BPE: the empty doc's "" word has zero symbols -> zero pairs, zero
    // tokens; training still learns from the real words
    val enc = operators.Bpe.bpeEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    operators.Dedup.releaseIntermediates()
    assert(enc.keySet == Set(0L, 1L, 2L, 3L) && enc(3L) == 0L && enc(0L) >= 1L)
    // BPE-priced packing: the 0-token doc occupies no sequence (the
    // negative-dividend div/floor guard), everyone else packs normally
    val pk = operators.Curation.packSequencesBpe(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_seqs")).toMap
    operators.Dedup.releaseIntermediates()
    assert(pk(3L) == 0L && Seq(0L, 1L, 2L).forall(pk(_) >= 1L))
    spark.catalog.clearCache()
  }
}
