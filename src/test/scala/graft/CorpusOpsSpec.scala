package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSpec {

  test("split_assign: every doc assigned once, split matches bucket, ~80/10/10") {
    val s = CorpusOps.splitAssign(spark, sf)
    val total = sources.Tables.documents(spark, sf).count()
    assert(s.count() == total)
    assert(s.filter(col("split") === "train" && col("bucket") >= 80).count() == 0)
    assert(s.filter(col("split") === "test" && col("bucket") < 90).count() == 0)
    val train = s.filter(col("split") === "train").count().toDouble / total
    assert(train > 0.7 && train < 0.9, s"train frac $train")
    // deterministic: second run identical
    val again = CorpusOps.splitAssign(spark, sf).collect().map(_.toString)
    assert(s.collect().map(_.toString).sameElements(again))
  }

  test("stratified_sample: subset of corpus, every stratum represented") {
    val sample = CorpusOps.stratifiedSample(spark, sf)
    val langs = sources.Tables.documents(spark, sf).select("lang").distinct().count()
    assert(sample.select("lang").distinct().count() == langs)
    val frac = sample.count().toDouble / sources.Tables.documents(spark, sf).count()
    assert(frac > 0.1 && frac < 0.3, s"sample frac $frac")
  }

  test("text_normalize: entity tokens redacted, idempotent on normalized text") {
    val n = CorpusOps.textNormalize(spark, sf)
    assert(n.filter(col("norm_text").contains("customer")).count() == 0)
    assert(n.filter(col("n_entities") > 0 && !col("changed")).count() == 0)
    // docs that had the entity token now carry the placeholder
    assert(n.filter(col("n_entities") > 0 &&
      !col("norm_text").contains("<ENTITY>")).count() == 0)
  }

  test("vocab_top_tokens: counts agree with a direct recount, coverage ≤ 1") {
    val v = CorpusOps.vocabTopTokens(spark, sf).collect()
    assert(v.nonEmpty && v.length <= CorpusOps.VocabK)
    val ns = v.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // each coverage is rounded half-up to 6 places, so the sum can overshoot
    // 1.0 by up to 5e-7 per token
    assert(v.map(_.getAs[Double]("coverage")).sum <= 1.0 + v.length * 5e-7)
    // top token count agrees with a direct filter count
    val top = v.head
    val direct = sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === top.getAs[String]("token")).count()
    assert(top.getAs[Long]("n") == direct)
  }

  test("tfidf_topk: planted characteristic term ranks first; ubiquitous terms score zero") {
    import spark.implicits._
    // "common" appears in every doc (idf = ln(1) = 0); each doc also
    // carries its own marker term repeated twice plus a once-shared term
    val docs = Seq(
      (1L, "common quark quark boson common"),
      (2L, "common boson gluon gluon common"),
      (3L, "common lepton lepton quark common"))
      .toDF("doc_id", "text")
    val out = CorpusOps.tfidfTopkOf(docs).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // rank 1 must be the doc-unique doubled marker, not the everywhere-term
    val top = byDoc.map { case (id, rows) =>
      id -> rows.find(_.getAs[Long]("rank") == 1L).get.getAs[String]("word") }
    assert(top == Map(1L -> "quark", 2L -> "gluon", 3L -> "lepton"), s"got $top")
    out.foreach { r =>
      if (r.getAs[String]("word") == "common")
        assert(r.getAs[Double]("score") == 0.0, "df=N term must carry zero tf-idf")
    }
    // ranks are 1..k dense per doc and scores non-increasing within a doc
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sortBy(-(_: Double)), s"scores not monotone: $scores")
    }
    // real corpus: every doc emits at most k rows, exactly k when vocab allows
    val k = graft.operators.GraftConf.tfidfTopK
    val corpus = CorpusOps.tfidfTopk(spark, sf).collect()
    val perDoc = corpus.groupBy(_.getAs[Long]("doc_id")).values.map(_.length)
    assert(perDoc.forall(_ <= k) && perDoc.exists(_ == k))
  }

  test("vocab_top_tokens_approx: Misra-Gries bounds hold against exact counts") {
    import spark.implicits._
    val k = 64
    val docs = sources.Tables.documents(spark, sf)
    // exact counts from the same tokenization the sketch sees
    val exact = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("c")).toMap
    val n = exact.values.sum
    val err = n / (k + 1)
    val sketch = CorpusOps.vocabTopTokensApprox(spark, sf, k).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est")).toMap
    assert(sketch.size <= k, s"summary exceeded k: ${sketch.size}")
    // guarantee 1: every true heavy hitter survives
    for ((t, c) <- exact if c > err)
      assert(sketch.contains(t), s"heavy hitter '$t' (count $c > $err) missing")
    // guarantee 2: estimates never exceed truth and undercount by <= N/(k+1)
    for ((t, est) <- sketch) {
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"'$t' overestimated: $est > $truth")
      assert(truth - est <= err, s"'$t' undercounted beyond bound: $truth - $est > $err")
    }
    // adversarial skew: one token at ~2/3 frequency survives even k=2
    val skewed = (1L to 300L).map(i => (i, if (i % 3 != 0L) "hot" else s"cold_$i"))
      .toDF("doc_id", "text")
    val tiny = skewed.select(explode(split(col("text"), " ")).as("token"))
      .agg(call_function("graft_mgtopk", col("token"), lit(2)).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.token"), col("e.est"))
      .collect().map(_.getAs[String]("token"))
    assert(tiny.contains("hot"), s"majority token lost at k=2: ${tiny.toSeq}")
  }

  test("corpus_stats: totals agree with direct aggregation") {
    val st = CorpusOps.corpusStats(spark, sf).collect()(0)
    val docs = sources.Tables.documents(spark, sf)
    assert(st.getAs[Long]("n_docs") == docs.count())
    assert(st.getAs[Long]("total_chars") ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    assert(st.getAs[Long]("n_dup_marked") ==
      docs.filter(col("text").rlike("\\bdup\\b")).count())
  }

  test("corpusStatsApprox: HLL sketch within its rsd bound of the exact distinct counts") {
    val rsd = 0.02
    val a = CorpusOps.corpusStatsApprox(spark, sf, rsd).collect()(0)
    val docs = sources.Tables.documents(spark, sf)
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    assert(a.getAs[Long]("n_tokens") == toks.count())
    // token grain is where cardinality is high enough for the error
    // statistics to mean something; 4·rsd leaves slack over the 1-sigma rsd
    val exactToks = toks.distinct().count().toDouble
    val approxToks = a.getAs[Long]("approx_distinct_tokens").toDouble
    assert(math.abs(approxToks - exactToks) / exactToks <= 4 * rsd,
      s"approx $approxToks vs exact $exactToks")
    // tiny cardinalities are exact in HLL's small-range regime
    assert(a.getAs[Long]("approx_langs") == docs.select("lang").distinct().count())
    assert(a.getAs[Long]("approx_sources") == docs.select("source").distinct().count())
  }

  test("corpus_diff: planted snapshots classify added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val a = Seq((1L, "same text"), (2L, "old version"), (3L, "to be removed"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "same text"), (2L, "new version"), (4L, "brand new doc"))
      .toDF("doc_id", "text")
    val got = CorpusOps.corpusDiffOf(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // corpus-level query covers all four statuses with the carved snapshots
    val statuses = CorpusOps.corpusDiff(spark, sf)
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"))
  }

  test("vocab_growth: one-new-word-per-doc prefix makes the Heaps curve exact by construction") {
    import spark.implicits._
    // docs 0..49 each introduce one fresh word; 50..99 repeat w0 → the
    // vocab curve rises 1:1 with docs then goes exactly flat
    val docs = (0L until 100L).map(i =>
      (i, if (i < 50) s"w$i" else "w0")).toDF("doc_id", "text")
    val out = CorpusOps.vocabGrowthOf(spark, docs).collect()
      .map(r => r.getAs[Int]("pct") ->
        (r.getAs[Long]("cut"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"))).toMap
    CorpusOps.GrowthPcts.foreach { pct =>
      val cut = 99L * pct / 100
      val expectVocab = math.min(cut + 1, 50L)
      assert(out(pct) == ((cut, cut + 1, cut + 1, expectVocab)),
        s"pct $pct: ${out(pct)} vs ($cut, ${cut + 1}, ${cut + 1}, $expectVocab)")
    }
    // flat-while-tokens-grow is visible: vocab(100%) == vocab(50%)
    assert(out(100)._4 == out(50)._4 && out(100)._3 > out(50)._3)
  }

  test("vocab_coverage: planted counts land exactly on both sides of every threshold") {
    import spark.implicits._
    // word counts: a=128, b=16, c=3, d=1 → total 148
    val text = (Seq.fill(128)("a") ++ Seq.fill(16)("b") ++ Seq.fill(3)("c") :+ "d")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val out = CorpusOps.vocabCoverageOf(spark, docs).collect()
      .map(r => r.getAs[Long]("threshold") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("mass"), r.getAs[Long]("coverage_bp"))).toMap
    val counts = Map("a" -> 128L, "b" -> 16L, "c" -> 3L, "d" -> 1L)
    val total = counts.values.sum
    CorpusOps.CoverageThresholds.foreach { t =>
      val kept = counts.filter(_._2 >= t)
      val mass = kept.values.sum
      val expected = (kept.size.toLong, mass, 10000L * mass / total)
      assert(out(t) == expected, s"threshold $t: ${out(t)} vs $expected")
    }
    assert(out(1L)._3 == 10000L, "threshold 1 covers everything")
  }
}
