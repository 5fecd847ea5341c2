package graft

import org.apache.spark.sql.functions._
import graft.operators.{ArtifactCatalog, Classify, NbIndex}
import graft.sources.Tables

/** Stored NB classifier: the train-once/score-many seam must be bit-equal
  * to the in-plan operators, resolve its tokenizer from the STAMP (never
  * an argument), and fail fast on drift or a foreign table.
  */
class NbIndexSpec extends SparkSpec {

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-nbindex-$tag").toString

  test("stored word model scores the eval slice bit-equal to nb_classify's predictions") {
    val path = fresh("w")
    NbIndex.writeNb(spark, sf, path, "words")
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % Classify.NbEvalMod === 0)
    val stored = NbIndex.nbScoreFrom(spark, path, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inPlan = Classify.nbClassify(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(stored.nonEmpty && stored == inPlan)
  }

  test("stored char-trigram model reproduces lang_id_nb's per-doc predictions") {
    val path = fresh("t")
    NbIndex.writeNb(spark, sf, path, "chartri")
    val docs = Tables.documents(spark, sf)
    val m = Classify.LangIdEvalMod
    val evalDocs = docs.filter(col("doc_id") % m === 0)
    val stored = NbIndex.nbScoreFrom(spark, path, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inPlan = Classify.nbPredictionsOf(docs, m, Classify.tokArrFor("chartri"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(stored.nonEmpty && stored == inPlan)
  }

  test("the tokenizer comes from the stamp: a trigram store scores trigram features") {
    // a doc whose WORDS are all out-of-vocab but whose trigrams are not:
    // under the word model it predicts '' — the trigram store must not
    val path = fresh("x")
    NbIndex.writeNb(spark, sf, path, "chartri")
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val sample = docs.limit(1).select(col("text")).collect().head.getString(0)
    // glue two real words together: a novel "word", familiar trigrams
    val glued = sample.split(" ").take(3).mkString("")
    val probe = Seq((999999L, glued)).toDF("doc_id", "text")
    val pred = NbIndex.nbScoreFrom(spark, path, probe).collect().head.getString(1)
    assert(pred.nonEmpty, "trigram store must score via trigram features")
  }

  test("stored quality model reproduces quality_classifier_nb's held-out predictions; τ drift fails fast") {
    val path = fresh("q")
    NbIndex.writeQualityNb(spark, sf, path)
    val docs = Tables.documents(spark, sf)
    // score the PLANTED text — the corpus the in-plan operator tokenizes
    val evalDocs = Classify.plantQualityLexicon(Classify.qualityLabeledOf(docs))
      .filter(col("doc_id") % Classify.QnbEvalMod === 0)
      .select("doc_id", "text")
    val stored = NbIndex.nbScoreFrom(spark, path, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val inPlan = Classify.qualityClassifierNb(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(stored.nonEmpty && stored == inPlan)
    assert(stored.values.toSet == Set("hi", "lo"))
    // the teacher's bar is part of the model identity: a different τ is a
    // DIFFERENT model, not a re-parameterization of this one
    spark.conf.set("spark.graft.qnb.tauQint", "50000")
    try {
      val e = intercept[IllegalStateException] {
        NbIndex.nbScoreFrom(spark, path, evalDocs)
      }
      assert(e.getMessage.contains("tau=50000") && e.getMessage.contains("tau=64000"))
    } finally spark.conf.unset("spark.graft.qnb.tauQint")
  }

  test("fails fast on conf drift and on an unstamped store") {
    val path = fresh("d")
    NbIndex.writeNb(spark, sf, path, "words")
    val probe = Tables.documents(spark, sf).limit(3).select("doc_id", "text")
    spark.conf.set("spark.graft.nb.evalMod", "9")
    try {
      val e = intercept[IllegalStateException] {
        NbIndex.nbScoreFrom(spark, path, probe)
      }
      assert(e.getMessage.contains("evalMod=9") && e.getMessage.contains("evalMod=4"))
    } finally spark.conf.unset("spark.graft.nb.evalMod")
    // unstamped copy → refused
    val foreign = fresh("f")
    for (t <- Seq("cw", "cdc")) {
      val df = spark.read.parquet(s"$path/$t")
      df.select(df.columns.map(c =>
          col(c).as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
        .write.mode("overwrite").parquet(s"$foreign/$t")
    }
    val e2 = intercept[IllegalStateException] {
      NbIndex.nbScoreFrom(spark, foreign, probe)
    }
    assert(e2.getMessage.contains("no graft.nb conf stamp"), e2.getMessage)
  }

  test("retract ≡ rebuild over corpus ∖ S, and append ∘ retract = identity") {
    val path = fresh("r")
    NbIndex.writeNb(spark, sf, path, "words")
    val docs = Tables.documents(spark, sf)
    // S spans the eval slice too — eval members contribute nothing and a
    // no-op retraction must be harmless
    val s = docs.filter(col("doc_id") % 7 === 0)
    val rest = docs.filter(col("doc_id") % 7 =!= 0)
    def storedCounts(): Seq[Set[Seq[Any]]] =
      Seq("cw", "cdc").map(t =>
        spark.read.parquet(s"$path/$t").collect().map(_.toSeq).toSet)
    def freshCounts(d: org.apache.spark.sql.DataFrame): Seq[Set[Seq[Any]]] = {
      val (cw, cdc) = Classify.nbCountsOf(
        d.filter(col("doc_id") % Classify.NbEvalMod =!= 0),
        Classify.tokArrFor("words"))
      Seq(cw, cdc).map(_.collect().map(_.toSeq).toSet)
    }
    val original = storedCounts()
    NbIndex.retractFromNb(spark, path, s)
    val retracted = storedCounts()
    assert(retracted != original, "vacuous: S must actually change the counts")
    assert(retracted == freshCounts(rest),
      "retract must leave exactly the store a fresh train over corpus ∖ S writes")
    // predictions from the retracted store ≡ predictions of a model
    // trained fresh on corpus ∖ S
    val evalDocs = docs.filter(col("doc_id") % Classify.NbEvalMod === 0)
      .select("doc_id", "text")
    val viaStore = NbIndex.nbScoreFrom(spark, path, evalDocs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaRebuild = Classify.nbScoreAllOf(evalDocs, Classify.tokArrFor("words"),
        Classify.nbTrainOf(rest.filter(col("doc_id") % Classify.NbEvalMod =!= 0),
          Classify.tokArrFor("words")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaStore.nonEmpty && viaStore == viaRebuild)
    // append S back: bit-equal to the original full-corpus store
    NbIndex.appendToNb(spark, path, s)
    assert(storedCounts() == original, "append ∘ retract must be identity")
  }

  test("NULL lang is a mergeable class: append/retract with NULL labels ≡ rebuild") {
    // Classify.nbModelFromCounts keeps the NULL-lang group as its own
    // class; the count merge must treat it like any other key (a plain
    // equality join silently duplicates NULL rows on append and skips
    // their decrement on retract — regression for the <=> merge join)
    import spark.implicits._
    val base = Seq(
      (1L, "alpha beta gamma", "en"), (2L, "delta epsilon", null),
      (3L, "alpha delta", "fr"), (5L, "beta beta", null))
      .toDF("doc_id", "text", "lang")
    val delta = Seq(
      (6L, "gamma gamma alpha", null), (7L, "epsilon beta", "en"))
      .toDF("doc_id", "text", "lang")
    val merged = fresh("nm")
    NbIndex.writeNbDocs(base, merged, "words")
    NbIndex.appendToNb(spark, merged, delta)
    val rebuilt = fresh("nr")
    NbIndex.writeNbDocs(base.unionByName(delta), rebuilt, "words")
    def counts(p: String): Seq[Set[Seq[Any]]] =
      Seq("cw", "cdc").map(t =>
        spark.read.parquet(s"$p/$t").collect().map(_.toSeq).toSet)
    val full = counts(rebuilt)
    assert(counts(merged) == full,
      "append with NULL-lang rows must merge the NULL class, not duplicate it")
    assert(full.exists(_.exists(_.contains(null))),
      "vacuous: the planted frame must actually produce NULL-key count rows")
    NbIndex.retractFromNb(spark, merged, delta)
    val baseOnly = fresh("nb")
    NbIndex.writeNbDocs(base, baseOnly, "words")
    assert(counts(merged) == counts(baseOnly),
      "retract must decrement the NULL class back to the base store")
  }

  test("the artifact catalog sees the NB store and flags drift") {
    val root = fresh("c")
    NbIndex.writeNb(spark, sf, s"$root/nb-words", "words")
    val clean = ArtifactCatalog.scan(spark, root)
      .filter(col("kind") === "graft.nb").collect()
    assert(clean.nonEmpty && clean.forall(!_.getAs[Boolean]("drifted")))
    spark.conf.set("spark.graft.nb.evalMod", "9")
    try {
      val drifted = ArtifactCatalog.scan(spark, root)
        .filter(col("kind") === "graft.nb").collect()
      assert(drifted.nonEmpty && drifted.forall(_.getAs[Boolean]("drifted")))
    } finally spark.conf.unset("spark.graft.nb.evalMod")
  }
}
