package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import graft.sources.Tables

/** Persisted Naive-Bayes classifier — the "train once, score many" seam
  * for the labeling stack ([[Classify]]), completing the stored-artifact
  * matrix alongside the MinHash/SRP/winnow/line indexes, the BPE merge
  * table, the SBO LM ([[LmIndex]]) and the IVF-PQ store ([[AnnIndex]]).
  * `nb_classify` / `lang_id_nb` retrain their count tables every
  * invocation (correct for the oracle; wasteful in production — a
  * fastText-shaped labeler is trained on one curated slice and then
  * scores every crawl forever). [[writeNb]] persists the three model
  * tables — classes (C rows), the sparse observed-(class, token) bonus
  * table, and the train vocabulary — and [[nbScoreFrom]] scores ANY
  * corpus from the store through the SAME [[Classify.nbScoreAllOf]] the
  * in-plan operators use, so stored-path predictions are bit-equal by
  * construction (NbIndexSpec asserts it).
  *
  * Same safety contract as the other stores: artifacts are stamped with
  * the train-time conf fingerprint (survives the parquet round-trip in
  * column metadata) and the score path fails FAST on drift or a missing
  * stamp. The fingerprint carries the TOKENIZER TAG (`tok=words` /
  * `tok=chartri`) as well as the train-slice modulus: a word-trained
  * model scored with trigram features is silent garbage, so the
  * tokenization is part of the model's identity and the score path
  * re-derives its feature extractor FROM the stamp
  * ([[Classify.tokArrFor]]), never from the caller.
  *
  * Reference anchor: the reference's classification rungs are LLM calls
  * (extraction/extraction.py:13); this persists the deterministic
  * corpus-scale rung below them.
  */
object NbIndex {

  private val MetaKey = "graft.nb"

  /** The train-slice modulus the given tokenizer tag trains under —
    * `nb_classify`'s knob for word models, `lang_id_nb`'s for char
    * trigrams, so the stored model mirrors exactly one oracle operator.
    */
  private def evalModFor(tok: String): Int = tok match {
    case "words"   => Classify.NbEvalMod
    case "chartri" => Classify.LangIdEvalMod
    case other => throw new IllegalArgumentException(
      s"unknown NB tokenizer tag '$other' (expected words|chartri)")
  }

  /** Every knob that changes the stored bytes: the tokenization and the
    * train-slice modulus.
    */
  def nbFingerprint(tok: String): String =
    s"model=nb;tok=$tok;evalMod=${evalModFor(tok)}"

  /** The quality-distillation model's identity (r10): word features, the
    * quality sweep's own train slice, AND the teacher's threshold —
    * a model distilled at one `hi`/`lo` bar scored under another is
    * silently answering a different question, so τ is part of the
    * stored bytes' identity exactly as the tokenizer is.
    */
  def qualityNbFingerprint: String =
    "model=nb;tok=words;labeler=quality;" +
      s"evalMod=${Classify.QnbEvalMod};tau=${Classify.QnbTauQint}"

  /** Live fingerprint matching a STORED stamp's tokenizer + labeler tags
    * — the artifact-catalog hook (the catalog compares a store against
    * the live conf without knowing a priori which model family it holds).
    */
  private[graft] def fingerprintFor(stored: String): String = {
    val tags = stored.split(";").flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v); case _ => None
    }).toMap
    val tok = tags.getOrElse("tok", "words")
    if (tags.get("labeler").contains("quality")) qualityNbFingerprint
    else {
      try nbFingerprint(tok)
      catch { case _: IllegalArgumentException => s"model=nb;tok=$tok;evalMod=?" }
    }
  }

  private def stamp(df: DataFrame, colName: String, tok: String): DataFrame =
    stampWith(df, colName, nbFingerprint(tok))

  private def stampWith(df: DataFrame, colName: String, fp: String): DataFrame = {
    val m = new MetadataBuilder().putString(MetaKey, fp).build()
    df.withColumn(colName, col(colName).as(colName, m))
  }

  /** Fail FAST on conf drift — and on a MISSING stamp (the r10 store
    * discipline): scoring a foreign or unstamped table blind is exactly
    * the mis-score the stamp exists to prevent. Returns the stored
    * tokenizer tag so the caller's feature extractor comes from the
    * MODEL, not from an argument that could disagree with it.
    */
  private def validateConf(df: DataFrame, colName: String, what: String): String =
    df.schema.fields.find(_.name == colName)
      .filter(_.metadata.contains(MetaKey))
      .map(_.metadata.getString(MetaKey)) match {
      case None => throw new IllegalStateException(
        s"$what carries no $MetaKey conf stamp — not a graft-written NB artifact " +
          "(or written by a pre-stamp build); refusing to score against it blind — retrain the model")
      case Some(stored) =>
        if (stored != fingerprintFor(stored)) throw new IllegalStateException(
          s"$what was trained with NB conf [$stored] but the live spark.graft.* conf is " +
            s"[${fingerprintFor(stored)}]; stored log-probabilities would silently mis-score — " +
            "retrain the model or align the conf")
        stored.split(";").collectFirst {
          case kv if kv.startsWith("tok=") => kv.stripPrefix("tok=")
        }.getOrElse("words")
    }

  /** Train on the labeled `doc_id % evalMod != 0` slice of the corpus at
    * `dir` under tokenizer `tok` ("words" | "chartri") and persist the
    * model under `path`: `classes/`, `sparse/`, `vocab/`. Each table is
    * a counting aggregation's output — writing the model costs one
    * in-plan training pass, and every later scoring pass skips it.
    */
  def writeNb(spark: SparkSession, dir: String, path: String, tok: String): Unit = {
    val m = evalModFor(tok)
    val train = Tables.documents(spark, dir).filter(col("doc_id") % m =!= 0)
    val model = Classify.nbTrainOf(train, Classify.tokArrFor(tok))
    stamp(model.classes, "lang", tok).write.mode("overwrite").parquet(s"$path/classes")
    stamp(model.sparse, "lang", tok).write.mode("overwrite").parquet(s"$path/sparse")
    stamp(model.vocab, "word", tok).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Train + persist the QUALITY-distillation model (r10): the
    * [[Classify.qualityLabeledOf]] teacher labels (`hi`/`lo` at the
    * [[Classify.QnbTauQint]] bar) on the `doc_id % qnbEvalMod != 0`
    * slice, word features — the stored twin of `quality_classifier_nb`
    * exactly as [[writeNb]]'s tok variants twin `nb_classify` /
    * `lang_id_nb`. The production economics this buys are LARGER than
    * the lang models': the teacher is the full rule cascade, so every
    * scoring pass against the store skips not just training but the
    * whole rule evaluation.
    */
  def writeQualityNb(spark: SparkSession, dir: String, path: String): Unit = {
    // planted grade markers included: the stored model must train on the
    // bit-identical text the in-plan quality_classifier_nb tokenizes
    val labeled = Classify.plantQualityLexicon(
      Classify.qualityLabeledOf(Tables.documents(spark, dir)))
    val train = labeled.filter(col("doc_id") % Classify.QnbEvalMod =!= 0)
    val model = Classify.nbTrainOf(train, Classify.tokArrFor("words"))
    val fp = qualityNbFingerprint
    stampWith(model.classes, "lang", fp).write.mode("overwrite").parquet(s"$path/classes")
    stampWith(model.sparse, "lang", fp).write.mode("overwrite").parquet(s"$path/sparse")
    stampWith(model.vocab, "word", fp).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Score any (doc_id, text) corpus against the stored model →
    * (doc_id, pred_lang). The feature extractor is resolved from the
    * STORED tokenizer tag; fails fast on drift or a missing stamp.
    * Scoring is the production pass: one vocab join, one sparse join,
    * one C-row broadcast — no training work, no corpus-sized state.
    */
  def nbScoreFrom(spark: SparkSession, path: String, docs: DataFrame): DataFrame = {
    val classes = spark.read.parquet(s"$path/classes")
    val sparse = spark.read.parquet(s"$path/sparse")
    val vocab = spark.read.parquet(s"$path/vocab")
    val tok = validateConf(classes, "lang", s"stored NB class table at $path/classes")
    validateConf(sparse, "lang", s"stored NB sparse table at $path/sparse")
    validateConf(vocab, "word", s"stored NB vocabulary at $path/vocab")
    Classify.nbScoreAllOf(docs, Classify.tokArrFor(tok),
      Classify.NbModel(classes, sparse, vocab))
  }
}
