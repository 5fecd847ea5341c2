package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** nb_classify: the in-engine-trained Naive Bayes classifier actually
  * LEARNS — on a corpus whose vocabulary correlates with the label, the
  * held-out docs classify correctly; plus structural invariants on the
  * real corpus (totality, determinism, tie direction).
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: two "languages" with disjoint-ish vocabularies plus
    * shared filler words. 40 docs; the %4 held-out slice must classify
    * perfectly because class-specific words dominate every doc.
    */
  private def planted = {
    val mk = (id: Long, lang: String, core: String) =>
      (id, s"$core $core filler common shared $core", lang)
    val rows = (0L until 40L).map { i =>
      if (i % 3 == 0) mk(i, "aa", "alpha apple anchor")
      else mk(i, "bb", "bravo berry basket")
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("learns a class-correlated vocabulary: held-out accuracy = 100%") {
    val out = Classify.nbClassifyOf(planted).collect()
    assert(out.length == 10) // 40 docs, %4 == 0 held out
    assert(out.forall(r => r.getAs[Int]("correct") == 1),
      s"misclassified: ${out.filter(_.getAs[Int]("correct") == 0).mkString(", ")}")
  }

  test("total over the held-out slice and deterministic across runs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val m = Classify.NbEvalMod
    val expected = docs.filter(col("doc_id") % m === 0).count()
    val a = Classify.nbClassify(spark, sf).collect()
    val b = Classify.nbClassify(spark, sf).collect()
    assert(a.length == expected, "every held-out doc gets a verdict row")
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // every prediction is a real training-set class (never '' here: the
    // shared synthetic vocabulary means no doc is fully out-of-vocab)
    val classes = docs.filter(col("doc_id") % m =!= 0)
      .select("lang").distinct().as[String].collect().toSet
    assert(a.forall(r => classes(r.getAs[String]("pred_lang"))))
  }

  test("doc with only out-of-vocab tokens gets pred_lang = ''") {
    val rows = (1L to 9L).map(i => (i, "alpha apple anchor", "aa")) :+
      ((12L, "zz yy xx", "aa")) // 12 % 4 == 0: held out, fully OOV
    val out = Classify.nbClassifyOf(rows.toDF("doc_id", "text", "lang"))
      .filter(col("doc_id") === 12L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("pred_lang") == "")
    assert(out.head.getAs[Int]("correct") == 0)
  }

  test("exact score tie breaks to the lexicographically first class") {
    // Two classes with MIRRORED statistics: same doc counts, same token
    // counts, and an eval doc whose words are equally (un)known to both —
    // scores are exactly equal decimals, so the argmax must pick 'aa'.
    val rows = Seq(
      (1L, "alpha alpha", "aa"), (2L, "alpha alpha", "aa"),
      (3L, "bravo bravo", "bb"), (5L, "bravo bravo", "bb"),
      (4L, "alpha bravo", "aa") // held out (4 % 4 == 0); symmetric evidence
    )
    val out = Classify.nbClassifyOf(rows.toDF("doc_id", "text", "lang"))
      .filter(col("doc_id") === 4L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("pred_lang") == "aa")
  }

  /** Same-SCRIPT lookalike corpus the stopword heuristic cannot separate:
    * both "languages" are Latin-script, contain zero English stopwords
    * (heuristic ratio 0 for every doc → pred_heur 'unknown' across the
    * board, a total tie), but carry distinct characteristic trigram mass
    * ('sch/ung/eit' vs 'tio/ing/the' word shapes).
    */
  private def lookalikes = {
    val mk = (id: Long, lang: String, core: String) =>
      (id, s"$core $core $core", lang)
    val rows = (0L until 40L).map { i =>
      if (i % 3 == 0) mk(i, "de", "verwaltung eigenschaft freundlichkeit")
      else mk(i, "en", "nation wondering weathering motivation")
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("lang_id_nb separates same-script lookalikes where the stopword heuristic ties") {
    val out = Classify.langIdNbOf(lookalikes).collect()
    // the heuristic ties: every held-out doc lands in pred_heur 'unknown'
    assert(out.forall(_.getAs[String]("pred_heur") == "unknown"),
      s"heuristic should tie on stopword-free text: ${out.mkString(", ")}")
    // the trained trigram model splits them perfectly: every agreement
    // cell is on the diagonal (pred_nb == lang)
    assert(out.nonEmpty && out.forall(r =>
        r.getAs[String]("pred_nb") == r.getAs[String]("lang")),
      s"off-diagonal cells: ${out.filterNot(r =>
        r.getAs[String]("pred_nb") == r.getAs[String]("lang")).mkString(", ")}")
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == 10L, s"held-out slice should be 10 docs, got $total")
  }

  /** Quality-correlated corpus: `hi` docs are 30 distinct rich words
    * (qint = 30000 + 30000 + 12000 = 72000 ≥ 64000), `lo` docs are 30
    * stopwords over a 2-word vocabulary (qint = 2000 + 0 + 12000 =
    * 14000). Vocabularies are disjoint, so the student must match the
    * teacher on every held-out doc.
    */
  private def qualityPlanted = {
    val rich = (0 until 30).map(i => s"rich$i").mkString(" ")
    val junk = Seq.fill(15)("the a").mkString(" ")
    (0L until 40L).map { i =>
      if (i % 3 == 0) (i, rich) else (i, junk)
    }.toDF("doc_id", "text")
  }

  test("quality_classifier_nb: the NB student reproduces the integer-composite teacher on held-out docs") {
    val out = Classify.qualityClassifierNbOf(qualityPlanted).collect()
    assert(out.length == 8) // 40 docs, %5 == 0 held out
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = if (id % 3 == 0) "hi" else "lo"
      assert(r.getAs[String]("label") == expected,
        s"teacher label for doc $id should be $expected: $r")
      assert(r.getAs[Int]("correct") == 1, s"student disagreed on doc $id: $r")
    }
  }

  test("quality_classifier_nb is total, deterministic, and non-vacuous on the real corpus") {
    val a = Classify.qualityClassifierNb(spark, sf).collect()
    val b = Classify.qualityClassifierNb(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val docs = graft.sources.Tables.documents(spark, sf)
    val expected = docs.filter(col("doc_id") % Classify.QnbEvalMod === 0).count()
    assert(a.length == expected, "every held-out doc gets a verdict row")
    val labels = a.map(_.getAs[String]("label")).toSet
    assert(labels == Set("hi", "lo"),
      s"the 64000 bar must populate both classes on the shipped corpus, got $labels")
  }

  test("lang_id_nb is total over the held-out slice and deterministic") {
    val a = Classify.langIdNb(spark, sf).collect()
    val b = Classify.langIdNb(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val docs = graft.sources.Tables.documents(spark, sf)
    val expected = docs.filter(col("doc_id") % Classify.LangIdEvalMod === 0).count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == expected,
      "agreement cube covers every held-out doc exactly once")
  }
}
