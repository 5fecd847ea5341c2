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

  test("qnb_calibration_report: confident planted corpus lands high-bucket at 10000 bp; accounting holds") {
    // the separable plant: disjoint vocabularies, so every held-out doc's
    // per-token margin is large and every prediction matches the teacher —
    // a calibrated student shows full accuracy in its (high) buckets
    val rep = Classify.qnbCalibrationReportOf(qualityPlanted).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("accuracy_bp"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(rep.values.map(_._1).sum == 8L, s"8 held-out docs, got $rep")
    rep.foreach { case (b, (n, c, bp)) =>
      assert(b >= -1L && b <= 9L)
      assert(bp == c * 10000 / n, "bp is the pure integer formula")
      assert(c == n, s"separable plant must be fully correct in bucket $b: $rep")
    }
    assert(rep.keys.max >= 5L,
      s"disjoint-vocabulary margins should land in high buckets: $rep")

    // a held-out doc whose words the train slice never saw: the model
    // abstains (pred ''), lands in bucket -1, and is counted incorrect
    // 45 % 5 == 0 → held out; its vocabulary never appears in training
    val withOov = qualityPlanted
      .unionByName(Seq((45L, "zzz1 zzz2 zzz3")).toDF("doc_id", "text"))
    val rep2 = Classify.qnbCalibrationReportOf(withOov).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(rep2(-1L) == ((1L, 0L)),
      s"the all-out-of-vocab doc must land in bucket -1 as incorrect: $rep2")

    // real corpus: totals = held-out count, buckets in range, bp formula
    val real = Classify.qnbCalibrationReport(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % Classify.QnbEvalMod === 0).count()
    assert(real.map(_.getAs[Long]("n_docs")).sum == expected)
    real.foreach { r =>
      assert(r.getAs[Long]("accuracy_bp") ==
        r.getAs[Long]("n_correct") * 10000 / r.getAs[Long]("n_docs"))
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

  test("qnb_quarantine: every quarantined doc is below the bar, train = high-margin preds, abstentions always quarantine") {
    // separable plant → every real-vocab held-out doc clears the bar;
    // one planted all-OOV doc abstains (bucket −1) and must quarantine
    val withOov = qualityPlanted
      .unionByName(Seq((40L, "zzz qqq vvv www uuu")).toDF("doc_id", "text"))
    val out = Classify.qnbQuarantineOf(withOov).collect()
    val thr = Classify.QnbQuarantineBucket
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      r.getAs[String]("split") match {
        case "quarantine" => assert(b < thr, s"quarantined above the bar: $r")
        case "train" =>
          assert(b >= thr && r.getAs[String]("pred").nonEmpty,
            s"trained below the bar or without a prediction: $r")
        case other => fail(s"unknown split '$other': $r")
      }
    }
    assert(out.exists(_.getAs[String]("split") == "train"),
      "the separable plant must put confident docs in the train split")
    val oov = out.find(_.getAs[Long]("doc_id") == 40L).get
    assert(oov.getAs[Long]("bucket") == -1L &&
      oov.getAs[String]("split") == "quarantine" &&
      oov.getAs[String]("pred") == "",
      s"the abstention must quarantine with an empty pred: $oov")
  }

  test("degenerate single-class train slice: pred nulls out (oracle's rn=1⋈rn=2 join), never correct, always quarantined") {
    // every doc is junk → every teacher label is 'lo' → the NB model
    // trains ONE class → only rn=1 exists → the margin (and pred) must
    // null out so the doc abstains, matching the SQL oracle which drops
    // it from calm via the inner join on the rn=2 row
    val junk = Seq.fill(15)("the a").mkString(" ")
    val allLo = (0L until 20L).map(i => (i, junk)).toDF("doc_id", "text")
    val rep = Classify.qnbCalibrationReportOf(allLo).collect()
    assert(rep.length == 1 && rep.head.getAs[Long]("bucket") == -1L,
      s"single-class eval docs must all land in the abstention bucket: ${rep.mkString(",")}")
    assert(rep.head.getAs[Long]("n_correct") == 0L,
      "a single-class abstention must never count correct")
    val q = Classify.qnbQuarantineOf(allLo).collect()
    assert(q.nonEmpty && q.forall(r =>
      r.getAs[String]("split") == "quarantine" && r.getAs[String]("pred") == ""),
      s"single-class abstentions must all quarantine: ${q.mkString(",")}")
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
