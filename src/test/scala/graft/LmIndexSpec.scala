package graft

import graft.operators.{ArtifactCatalog, LmIndex, TextAnalysis}
import graft.sources.Tables

/** Stored SBO language model: the "train once, score many" seam must be
  * bit-equivalent to the in-plan operator, fail fast on train-knob drift,
  * serve a DIFFERENT α without retraining (α is score-time), and appear in
  * the artifact catalog's fleet view.
  */
class LmIndexSpec extends SparkSpec {

  private def freshModel(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-lmindex").toString
    LmIndex.writeSbo(spark, sf, path)
    path
  }

  test("stored-model scoring ≡ in-plan doc_perplexity_sbo, bit for bit") {
    val path = freshModel()
    val stored = LmIndex.sboNllFrom(spark, path, Tables.documents(spark, sf))
      .collect().map(_.toSeq).toSeq
    val mem = TextAnalysis.docPerplexitySbo(spark, sf).collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored == mem,
      s"stored ${stored.take(3)}... vs mem ${mem.take(3)}...")
  }

  test("one stored model serves a different α — score-time knob, not retrain") {
    val path = freshModel()
    spark.conf.set("spark.graft.ppl.sboAlphaPct", "25")
    try {
      val stored = LmIndex.sboNllFrom(spark, path, Tables.documents(spark, sf))
        .collect().map(_.toSeq).toSeq
      val mem = TextAnalysis.docPerplexitySbo(spark, sf).collect().map(_.toSeq).toSeq
      assert(stored.nonEmpty && stored == mem)
      // α actually changed something vs the default run
      spark.conf.unset("spark.graft.ppl.sboAlphaPct")
      val dflt = TextAnalysis.docPerplexitySbo(spark, sf).collect().map(_.toSeq).toSeq
      assert(mem != dflt, "α=25 must differ from the default scoring")
    } finally spark.conf.unset("spark.graft.ppl.sboAlphaPct")
  }

  test("train-knob drift between model build and scoring fails fast") {
    val path = freshModel()
    spark.conf.set("spark.graft.ppl.sboTrainMod", "3")
    try {
      val e = intercept[IllegalStateException] {
        LmIndex.sboNllFrom(spark, path, Tables.documents(spark, sf)).collect()
      }
      assert(e.getMessage.contains("trainMod=3") && e.getMessage.contains("trainMod=2"))
    } finally spark.conf.unset("spark.graft.ppl.sboTrainMod")
  }

  test("retract ≡ rebuild over corpus ∖ S, and append ∘ retract = identity") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    // S spans BOTH train parities: eval-slice members contribute nothing,
    // proving a no-op retraction is harmless
    val s = docs.filter(col("doc_id") % 7 === 0)
    val rest = docs.filter(col("doc_id") % 7 =!= 0)
    def storedCounts(path: String): Seq[Set[Seq[Any]]] =
      Seq("c1", "c2", "c3").map(t =>
        spark.read.parquet(s"$path/$t").collect().map(_.toSeq).toSet)
    def freshCounts(d: org.apache.spark.sql.DataFrame): Seq[Set[Seq[Any]]] = {
      val (c1, c2, c3) = TextAnalysis.sboCountsOf(
        d.select(col("doc_id"), split(col("text"), " ").as("ws")))
      Seq(c1, c2, c3).map(_.collect().map(_.toSeq).toSet)
    }
    val path = freshModel()
    val original = storedCounts(path)
    LmIndex.retractFromSbo(spark, path, s)
    val retracted = storedCounts(path)
    assert(retracted != original, "vacuous: S must actually change the counts")
    assert(retracted == freshCounts(rest),
      "retract must leave exactly the store a fresh train over corpus ∖ S writes")
    // scoring from the retracted store ≡ scoring from the rebuilt model
    val viaStore = LmIndex.sboNllFrom(spark, path, docs).collect().map(_.toSeq).toSeq
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val (r1, r2, r3) = TextAnalysis.sboCountsOf(
      rest.select(col("doc_id"), split(col("text"), " ").as("ws")))
    val viaRebuild = TextAnalysis.sboScoreOf(d,
      TextAnalysis.sboModelFromCounts(r1, r2, r3)).collect().map(_.toSeq).toSeq
    assert(viaStore.nonEmpty && viaStore == viaRebuild)
    // append S back: bit-equal to the original full-corpus store
    LmIndex.appendToSbo(spark, path, s)
    assert(storedCounts(path) == original, "append ∘ retract must be identity")
  }

  test("retract under drifted train knobs fails fast instead of corrupting the store") {
    val path = freshModel()
    spark.conf.set("spark.graft.ppl.sboTrainMod", "3")
    try {
      val e = intercept[IllegalStateException] {
        LmIndex.retractFromSbo(spark, path, Tables.documents(spark, sf).limit(1))
      }
      assert(e.getMessage.contains("trainMod=3") && e.getMessage.contains("trainMod=2"))
    } finally spark.conf.unset("spark.graft.ppl.sboTrainMod")
  }

  test("the artifact catalog sees the stored LM and reports drift") {
    val path = freshModel()
    val clean = ArtifactCatalog.scan(spark, path)
      .collect().map(r => (r.getString(2), r.getBoolean(5)))
    assert(clean.nonEmpty && clean.forall(_._1 == "graft.lm.sbo"))
    assert(clean.forall(!_._2), "freshly built model must not be drifted")
    spark.conf.set("spark.graft.ppl.sboTrainMod", "5")
    try {
      val drifted = ArtifactCatalog.scan(spark, path)
        .collect().map(_.getBoolean(5))
      assert(drifted.forall(identity), "all stamps drift together")
    } finally spark.conf.unset("spark.graft.ppl.sboTrainMod")
  }
}
