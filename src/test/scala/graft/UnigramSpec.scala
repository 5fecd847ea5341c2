package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftConf, Unigram}

/** `unigram_segment` vs a from-scratch brute-force reference: enumerate
  * EVERY segmentation of every word, score with the engine's own frozen
  * piece model, and apply the documented tie rule (max score, then
  * longest-last-piece cascading from the end) — a third independent
  * implementation next to the DuckDB unrolled-DP oracle.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `word` into pieces of length ≤ P. */
  private def allSegs(word: String, P: Int): List[List[String]] =
    if (word.isEmpty) List(Nil)
    else (1 to math.min(P, word.length)).toList.flatMap { j =>
      allSegs(word.substring(j), P).map(word.substring(0, j) :: _)
    }

  /** The engine's tie rule as a total order: higher score first, then the
    * segmentation whose reversed piece-length sequence is lexicographically
    * LARGER (the DP picks the longest last piece at every position).
    */
  private def better(a: (java.math.BigDecimal, List[String]),
      b: (java.math.BigDecimal, List[String])): Boolean = {
    val c = a._1.compareTo(b._1)
    if (c != 0) c > 0
    else {
      val la = a._2.reverse.map(_.length)
      val lb = b._2.reverse.map(_.length)
      la.zip(lb).find { case (x, y) => x != y } match {
        case Some((x, y)) => x > y
        case None => la.length < lb.length
      }
    }
  }

  private def bruteforce(docs: org.apache.spark.sql.DataFrame)
      : Map[String, (List[String], Double)] = {
    val P = GraftConf.unigramMaxPiece
    val lp = Unigram.unigramModelOf(docs).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[java.math.BigDecimal]("lp")).toMap
    graft.operators.Dedup.releaseIntermediates()
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" &&
        length(col("w")) <= GraftConf.unigramMaxWordLen)
      .distinct().as[String].collect()
    words.map { w =>
      val cands = allSegs(w, P).filter(_.forall(lp.contains))
        .map(s => (s.map(lp).reduce(_.add(_)), s))
      val best = cands.reduce((a, b) => if (better(a, b)) a else b)
      w -> (best._2,
        java.math.BigDecimal.valueOf(best._1.doubleValue)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
    }.toMap
  }

  test("every corpus word segments exactly as the brute-force optimum under the same model") {
    val docs = sources.Tables.documents(spark, sf)
    val expected = bruteforce(docs)
    val got = Unigram.unigramSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[String]("segmentation").split("\\|").toList,
          r.getAs[Double]("score"), r.getAs[Long]("n_pieces"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(got.keySet == expected.keySet, "one verdict per bounded-length corpus word")
    got.foreach { case (w, (seg, score, np)) =>
      assert(seg == expected(w)._1, s"word '$w': $seg vs ${expected(w)._1}")
      assert(score == expected(w)._2, s"word '$w' score: $score vs ${expected(w)._2}")
      assert(np == seg.length && seg.mkString("") == w,
        s"word '$w': pieces must tile the word exactly")
    }
  }

  test("unigram_fertility ≡ the per-word piece table rolled up over the corpus by language") {
    val docs = sources.Tables.documents(spark, sf)
    val np = Unigram.unigramSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("n_pieces")).toMap
    graft.operators.Dedup.releaseIntermediates()
    val L = GraftConf.unigramMaxWordLen
    val toks = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= L).collect()
    val expected = toks.groupBy(_.getAs[String]("lang")).map { case (lang, rows) =>
      lang -> (rows.map(_.getAs[Long]("doc_id")).distinct.length.toLong,
        rows.length.toLong, rows.map(r => np(r.getAs[String]("w"))).sum)
    }
    val got = Unigram.unigramFertility(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(got == expected)
  }

  test("stored model segments bit-equal to the in-plan path; drift and missing stamps fail fast") {
    val path = java.nio.file.Files.createTempDirectory("graft-uni").toString + "/model"
    Unigram.writeModel(spark, sf, path)
    val docs = sources.Tables.documents(spark, sf)
    val stored = Unigram.unigramSegmentFrom(spark, path, docs).collect().map(_.toString).toSeq
    graft.operators.Dedup.releaseIntermediates()
    val inPlan = Unigram.unigramSegment(spark, sf).collect().map(_.toString).toSeq
    graft.operators.Dedup.releaseIntermediates()
    assert(stored.nonEmpty && stored == inPlan)
    // conf drift → refused
    spark.conf.set("spark.graft.unigram.seedK", "48")
    try {
      val e = intercept[IllegalStateException] {
        Unigram.unigramSegmentFrom(spark, path, docs)
      }
      assert(e.getMessage.contains("seedK=48") && e.getMessage.contains("seedK=64"))
    } finally spark.conf.unset("spark.graft.unigram.seedK")
    // unstamped copy → refused
    val foreign = java.nio.file.Files.createTempDirectory("graft-unif").toString + "/model"
    val df = spark.read.parquet(path)
    df.select(df.columns.map(c =>
        col(c).as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
      .write.mode("overwrite").parquet(foreign)
    val e2 = intercept[IllegalStateException] {
      Unigram.unigramSegmentFrom(spark, foreign, docs)
    }
    assert(e2.getMessage.contains("no graft.unigram conf stamp"))
    // the artifact catalog sees the store and flags drift
    val root = path.stripSuffix("/model")
    val clean = graft.operators.ArtifactCatalog.scan(spark, root)
      .filter(col("kind") === "graft.unigram").collect()
    assert(clean.nonEmpty && clean.forall(!_.getAs[Boolean]("drifted")))
    spark.conf.set("spark.graft.unigram.maxPiece", "3")
    try {
      val drifted = graft.operators.ArtifactCatalog.scan(spark, root)
        .filter(col("kind") === "graft.unigram").collect()
      assert(drifted.nonEmpty && drifted.forall(_.getAs[Boolean]("drifted")))
    } finally spark.conf.unset("spark.graft.unigram.maxPiece")
  }

  test("tokenizer_drift_report: a drifted-vocabulary crawl source flags retrain, a stable one does not") {
    // base corpus (doc_id % 10 != 0): both sources speak the aa/bb/cc
    // vocabulary; crawl (doc_id % 10 == 0): 'stable' re-serves it,
    // 'shift' arrives with words whose CHARACTERS the stored inventory
    // has never seen — zero stored coverage, the retrain alarm's job
    val base = (1 to 9).filter(_ % 10 != 0).flatMap(i => Seq(
      (i.toLong, "aa bb cc aa", "stable"),
      (i.toLong + 100, "aa bb cc bb", "shift")))
    val crawl = Seq(
      (10L, "aa bb cc", "stable"), (20L, "aa aa bb", "stable"),
      (110L, "zzz www qqq", "shift"), (120L, "zzz qqq", "shift"))
    val docs = (base ++ crawl).toDF("doc_id", "text", "source")
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val stored = Unigram.unigramSegmentOf(baseDocs)
    val full = Unigram.unigramSegmentOf(docs)
    val got = Unigram.tokenizerDriftReportFrom(docs, stored, full)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    graft.operators.Dedup.releaseIntermediates()
    val st = got("stable")
    assert(!st.getAs[Boolean]("retrain"), st.toString)
    assert(st.getAs[Long]("coverage_bp") == 10000L, st.toString)
    assert(st.getAs[Long]("drift_bp") == 0L, st.toString)
    val sh = got("shift")
    assert(sh.getAs[Boolean]("retrain"), sh.toString)
    assert(sh.getAs[Long]("n_covered") == 0L && sh.getAs[Long]("coverage_bp") == 0L,
      sh.toString)
    // the fertility compare is same-population: with nothing covered the
    // fert columns are NULL and drift reports 0 — the flag came from the
    // coverage axis, honestly
    assert(sh.isNullAt(sh.fieldIndex("fert_stored_bp")), sh.toString)
  }

  test("empty vocabulary degrades to the empty contract frame, not an NPE (r11 advice)") {
    // empty corpus AND every-word-over-the-length-bound both leave the
    // vocabulary empty; the DP's maxLen aggregate is NULL there
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val tooLong = Seq((1L, "a".repeat(GraftConf.unigramMaxWordLen + 1)))
      .toDF("doc_id", "text")
    for (docs <- Seq(empty, tooLong)) {
      val u = Unigram.unigramSegmentOf(docs)
      assert(u.columns.toSeq == Seq("word", "w", "n_chars", "n_pieces",
        "segmentation", "score") && u.count() == 0)
      val wp = graft.operators.WordPiece.greedyWithModel(docs,
        Unigram.unigramModelOf(docs))
      assert(wp.columns.toSeq == u.columns.toSeq && wp.count() == 0)
      graft.operators.Dedup.releaseIntermediates()
    }
  }

  test("a corpus word containing '|' cannot inflate n_pieces: the DP's own step count is emitted, never a path re-split") {
    // 'a|b' is frequent enough that the whole word survives pruning as a
    // single piece — the optimal segmentation is 1 piece, while
    // re-splitting the joined path on '|' would misread it as 2
    val docs = Seq((1L, "a|b a|b a|b cd")).toDF("doc_id", "text")
    val out = Unigram.unigramSegmentOf(docs).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("n_pieces")).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(out("a|b") == 1L, s"DP picks the whole-word piece: $out")
    val wp = graft.operators.WordPiece.greedyWithModel(docs,
        Unigram.unigramModelOf(docs)).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("n_pieces")).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(wp("a|b") == 1L, s"greedy MaxMatch takes the longest piece: $wp")
  }

  test("a frequent pair is learned as one piece: 'abab' segments as ab|ab, not chars") {
    val docs = Seq((1L, "ab ab ab ab abab")).toDF("doc_id", "text")
    val out = Unigram.unigramSegmentOf(docs).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("segmentation")).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(out("abab") == "ab|ab", s"got ${out("abab")}")
    assert(out("ab") == "ab")
    // and the brute-force reference agrees on the planted corpus too
    val expected = bruteforce(docs)
    out.foreach { case (w, s) => assert(s.split("\\|").toList == expected(w)._1) }
  }
}
