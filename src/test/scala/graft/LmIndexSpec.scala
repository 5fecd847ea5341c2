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
