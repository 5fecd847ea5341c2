package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import graft.sources.Tables

/** Persisted n-gram language model — the "train once, score many" seam for
  * the perplexity stack, completing the stored-artifact matrix (ANN index,
  * dedup band index, SRP index, winnow fingerprint index, BPE merge table
  * — and now the LM). `doc_perplexity_sbo` retrains its count-ratio tables
  * every invocation (correct for the oracle, wasteful in production: the
  * Brants 2007 point is precisely that the count tables ARE the model and
  * scoring is joins). [[writeSbo]] persists the four tables; [[sboNllFrom]]
  * scores any corpus from the store through the SAME
  * [[TextAnalysis.sboScoreOf]] the in-plan operator uses, so stored-path
  * results are bit-equal by construction (spec-asserted).
  *
  * Same safety contract as the other stores: artifacts are stamped with
  * the train-time conf fingerprint (survives the parquet round-trip in
  * column metadata) and the score path fails FAST on drift. α is a
  * SCORE-time knob (frozen identically in both engines at score time), so
  * one stored model serves any α — it is deliberately NOT in the
  * fingerprint, the nprobe/topK discipline of [[AnnIndex]].
  *
  * Reference anchor: utils/validation.py:92 scores extraction text quality
  * per form; this is that scoring rung as a reusable corpus-level model.
  */
object LmIndex {

  /** Train-time knobs only: the held-out slice (`trainMod`) changes every
    * stored count; α does not.
    */
  def sboFingerprint: String =
    s"model=sbo;trainMod=${GraftConf.pplSboTrainMod};logScale=6"

  private val MetaKey = "graft.lm.sbo"

  private def stamp(df: DataFrame, colName: String): DataFrame = {
    val m = new MetadataBuilder().putString(MetaKey, sboFingerprint).build()
    df.withColumn(colName, col(colName).as(colName, m))
  }

  /** Fail FAST on conf drift — and (r10) on a MISSING stamp: an
    * unstamped or foreign parquet directory scored blind is exactly the
    * silent mis-score the stamp exists to prevent, so absence is an
    * error, not a pass.
    */
  private def validateConf(df: DataFrame, colName: String, what: String): Unit =
    df.schema.fields.find(_.name == colName)
      .filter(_.metadata.contains(MetaKey))
      .map(_.metadata.getString(MetaKey)) match {
      case None => throw new IllegalStateException(
        s"$what carries no $MetaKey conf stamp — not a graft-written SBO artifact " +
          "(or written by a pre-stamp build); refusing to score against it blind — retrain the model")
      case Some(stored) =>
        if (stored != sboFingerprint) throw new IllegalStateException(
          s"$what was trained with LM conf [$stored] but the live spark.graft.* conf is " +
            s"[$sboFingerprint]; stored log-ratios would silently mis-score — " +
            "retrain the model or align the conf")
    }

  /** Train + persist the SBO model under `path`: `lt1/` (train-vocab
    * unigram log-probs, +1-smoothed), `lt2/`, `lt3/` (backoff ratio
    * tables), `oov/` (the 1-row OOV constant). Each table is one
    * map-side-combined aggregation's output — writing the model costs the
    * same as one in-plan training pass, and every later scoring pass
    * skips it.
    */
  def writeSbo(spark: SparkSession, dir: String, path: String): Unit = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val m = TextAnalysis.sboModelOf(d)
    stamp(m.lt1, "word").write.mode("overwrite").parquet(s"$path/lt1")
    stamp(m.lt2, "w1").write.mode("overwrite").parquet(s"$path/lt2")
    stamp(m.lt3, "w1").write.mode("overwrite").parquet(s"$path/lt3")
    stamp(m.oov, "lp_oov").write.mode("overwrite").parquet(s"$path/oov")
  }

  /** Score a corpus against the stored model — fails fast if the live
    * conf's train-time knobs drifted from the stamp. Scoring is n-gram
    * key joins against the stored tables (broadcast when small, shuffle
    * on the gram key when not) — no retraining, no corpus-sized state.
    */
  /** `doc_perplexity_sbo_stored`: the stored-artifact path AS an oracle
    * query (r10) — write the SBO model to parquet, read it back, score
    * the corpus from the STORE. Output is bit-equal to
    * `doc_perplexity_sbo` by construction (the same
    * [[TextAnalysis.sboScoreOf]] over the round-tripped tables —
    * LmIndexSpec asserts it row for row), so it shares that query's
    * oracle SQL verbatim; what this row adds is the driver's hash check
    * standing guard over the parquet round-trip + stamp machinery itself,
    * exactly as `dedup_delta` does for the stored MinHash band index.
    * The write lands under java.io.tmpdir keyed by the sf dir, mode
    * overwrite — rebuilt per invocation (that cost is the train pass the
    * in-plan query pays anyway; Bench times the honest train+store+score
    * cycle).
    */
  def docPerplexitySboStored(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft-sbo-store-" + dir.replaceAll("[^A-Za-z0-9]", "_")).getPath
    writeSbo(spark, dir, path)
    // sboScoreOf already applies the contract ordering
    sboNllFrom(spark, path, Tables.documents(spark, dir))
  }

  def sboNllFrom(spark: SparkSession, path: String, docs: DataFrame): DataFrame = {
    val lt1 = spark.read.parquet(s"$path/lt1")
    val lt2 = spark.read.parquet(s"$path/lt2")
    val lt3 = spark.read.parquet(s"$path/lt3")
    val oov = spark.read.parquet(s"$path/oov")
    validateConf(lt1, "word", s"stored SBO unigram table at $path/lt1")
    validateConf(lt2, "w1", s"stored SBO bigram table at $path/lt2")
    validateConf(lt3, "w1", s"stored SBO trigram table at $path/lt3")
    validateConf(oov, "lp_oov", s"stored SBO OOV row at $path/oov")
    val d = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    TextAnalysis.sboScoreOf(d, TextAnalysis.SboModel(lt1, lt2, lt3, oov))
  }
}
