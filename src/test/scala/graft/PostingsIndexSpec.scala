package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PostingsIndex, Similarity}
import graft.sources.Tables

/** The persisted BM25 postings index: stored-path results must be
  * bit-equal to the corpus-scan `bm25_search` (the claim PostingsIndex's
  * Scaladoc makes), the term filter must PUSH to the postings scan, and
  * the range-partitioned/sorted layout must leave disjoint per-file word
  * ranges — the property that makes the pushed filter actually prune at
  * 100 TB instead of reading the whole index.
  */
class PostingsIndexSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("bm25_search_stored ≡ bm25_search bit-equal (shared bm25RankOf tail, same exact integers)") {
    val stored = PostingsIndex.bm25SearchStored(spark, sf).collect().toSeq
    Dedup.releaseIntermediates()
    val scan = Similarity.bm25Search(spark, sf).collect().toSeq
    assert(stored.nonEmpty, "stored path returned no hits")
    assert(stored == scan,
      s"stored-only: ${stored.diff(scan).take(3)}; scan-only: ${scan.diff(stored).take(3)}")
  }

  test("appendToPostings: base + appended crawl answers bit-equal to the one-shot full index") {
    val docs = Tables.documents(spark, sf)
    val isDelta = org.apache.spark.sql.functions.col("doc_id") % 10 === 0
    val incr = tmp("graft-postings-incr")
    PostingsIndex.writePostingsFrom(docs.filter(!isDelta), incr)
    PostingsIndex.appendToPostings(spark, incr, docs.filter(isDelta))
    val full = tmp("graft-postings-full")
    PostingsIndex.writePostingsFrom(docs, full)
    val viaAppend = PostingsIndex.bm25From(spark, incr).collect().toSeq
    Dedup.releaseIntermediates()
    val oneShot = PostingsIndex.bm25From(spark, full).collect().toSeq
    Dedup.releaseIntermediates()
    assert(viaAppend.nonEmpty && viaAppend == oneShot,
      s"append-only: ${viaAppend.diff(oneShot).take(3)}; full-only: ${oneShot.diff(viaAppend).take(3)}")
    // the read-time-derived stats are the exact sum of the two crawls'
    val st = PostingsIndex.statsFromDoclens(
      spark.read.parquet(s"$incr/doclens")).collect()
    assert(st.length == 1 && st.head.getAs[Long]("n_docs") == docs.count())
  }

  test("retractFromPostings: append ∘ retract = identity; retract ≡ fresh rebuild over the remaining corpus") {
    val docs = Tables.documents(spark, sf)
    val isS = col("doc_id") % 10 === 0
    val path = tmp("graft-postings-retract")
    PostingsIndex.writePostingsFrom(docs.filter(!isS), path)
    val baseline = PostingsIndex.bm25From(spark, path).collect().toSeq
    Dedup.releaseIntermediates()
    // a crawl appended then taken down leaves the store bit-identical
    PostingsIndex.appendToPostings(spark, path, docs.filter(isS))
    PostingsIndex.retractFromPostings(spark, path, docs.filter(isS).select("doc_id"))
    val roundTrip = PostingsIndex.bm25From(spark, path).collect().toSeq
    Dedup.releaseIntermediates()
    assert(roundTrip == baseline, "append then retract must be the identity")
    // retracting a slice of the ORIGINAL corpus ≡ a fresh rebuild without it
    val isT = col("doc_id") % 7 === 0
    PostingsIndex.retractFromPostings(spark, path, docs.filter(isT).select("doc_id"))
    val got = PostingsIndex.bm25From(spark, path).collect().toSeq
    Dedup.releaseIntermediates()
    val fresh = tmp("graft-postings-fresh-rebuild")
    PostingsIndex.writePostingsFrom(docs.filter(!isS && !isT), fresh)
    val want = PostingsIndex.bm25From(spark, fresh).collect().toSeq
    Dedup.releaseIntermediates()
    assert(got.nonEmpty && got == want,
      s"retract-only: ${got.diff(want).take(3)}; rebuild-only: ${want.diff(got).take(3)}")
    assert(!got.exists(r => r.getAs[Long]("doc_id") % 7 == 0),
      "a retracted doc must never be returned")
    // derived stats track the scrub exactly
    val st = PostingsIndex.statsFromDoclens(
      spark.read.parquet(s"$path/doclens")).collect().head
    assert(st.getAs[Long]("n_docs") == docs.filter(!isS && !isT).count())
  }

  test("stats are derived, not stored: a planted torn stats table cannot mis-score BM25") {
    // the legacy failure mode: postings/doclens appended but a 1-row
    // stats table left stale (crash between appends and the stats
    // overwrite, or a concurrent reader during it) — BM25 idf/avgdl
    // silently wrong. Plant exactly that state and assert the read path
    // never consults it.
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-postings-torn")
    PostingsIndex.writePostingsFrom(docs, path)
    // a wildly-wrong stats table at the legacy location
    spark.range(1).selectExpr("CAST(1 AS BIGINT) AS n_docs",
        "CAST(1 AS BIGINT) AS sum_dl")
      .write.mode("overwrite").parquet(s"$path/stats")
    val viaTorn = PostingsIndex.bm25From(spark, path).collect().toSeq
    Dedup.releaseIntermediates()
    val scan = Similarity.bm25Search(spark, sf).collect().toSeq
    assert(viaTorn.nonEmpty && viaTorn == scan,
      "bm25From consulted a stored stats table — torn-state regression")
  }

  test("compactPostings: appends decay pruning; compaction restores globally disjoint ranges, bit-equal answers, bounded files") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-postings-c")
    // pin the multi-file layout (see the layout spec below)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      PostingsIndex.writePostingsFrom(docs.filter(col("doc_id") % 3 === 0), path)
      PostingsIndex.appendToPostings(spark, path, docs.filter(col("doc_id") % 3 === 1))
      PostingsIndex.appendToPostings(spark, path, docs.filter(col("doc_id") % 3 === 2))
      val before = PostingsIndex.bm25From(spark, path).collect().toSeq
      Dedup.releaseIntermediates()
      def ranges(): Array[(String, String)] = spark.read.parquet(s"$path/postings")
        .groupBy(input_file_name().as("f"))
        .agg(min("word").as("lo"), max("word").as("hi"))
        .collect()
        .map(r => (r.getAs[String]("lo"), r.getAs[String]("hi")))
        .sortBy(_._1)
      def properOverlap(rs: Array[(String, String)]): Boolean =
        rs.sliding(2).exists {
          case Array((_, hiA), (loB, _)) => hiA > loB
          case _ => false
        }
      assert(properOverlap(ranges()),
        "three appended layouts should overlap — otherwise compaction is vacuous here")
      PostingsIndex.compactPostings(spark, path)
      val rAfter = ranges()
      assert(!properOverlap(rAfter),
        s"post-compaction file ranges must be globally disjoint: ${rAfter.take(6).mkString(",")}")
      val maxFiles = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(rAfter.length <= maxFiles,
        s"file count must be bounded by the shuffle partitioning: ${rAfter.length} > $maxFiles")
      val after = PostingsIndex.bm25From(spark, path).collect().toSeq
      Dedup.releaseIntermediates()
      assert(after == before, "compaction changed BM25 answers")
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("postings layout: disjoint per-file word ranges; term filter pushes to the parquet scan") {
    val path = tmp("graft-postings-spec")
    // at sf0.001 AQE rightly coalesces the range shuffle to one (tiny)
    // file; pin the partition count here so the multi-file layout the
    // 100 TB write produces is observable
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PostingsIndex.writePostingsFrom(Tables.documents(spark, sf), path)
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val post = spark.read.parquet(s"$path/postings")

    // range-partitioned + sorted within files ⇒ per-file [min,max] word
    // ranges may touch at a boundary word but never properly overlap
    val ranges = post.groupBy(input_file_name().as("f"))
      .agg(min("word").as("lo"), max("word").as("hi"))
      .collect()
      .map(r => (r.getAs[String]("lo"), r.getAs[String]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1, "need multiple files to observe the range layout")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file word ranges overlap: ..$hiA vs $loB..")
      case _ =>
    }

    // the conf'd term filter lands on the scan as a pushed parquet filter
    val filtered = post.filter(col("word").isin(Similarity.QueryTerms: _*))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(word"), plan.take(2000))

    // and the pruned read touches fewer files than the index holds: every
    // file whose [lo,hi] range excludes all query terms is skippable
    val terms = Similarity.QueryTerms.toSet
    val matching = ranges.count { case (lo, hi) => terms.exists(t => lo <= t && t <= hi) }
    assert(matching < ranges.length,
      s"every file's range covers a query term — sorted layout buys no file pruning " +
        s"($matching of ${ranges.length})")
  }
}
