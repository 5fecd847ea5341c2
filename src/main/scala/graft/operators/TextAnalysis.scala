package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data curation (SURVEY §2C):
  * language-ID heuristic, quality scoring, token counting, fingerprinting.
  * All stateless projections + one small aggregation — they stream through
  * a 100 TB corpus at scan speed.
  */
object TextAnalysis {

  /** English function words present in the corpus vocabulary (the n-gram/
    * stopword-ratio heuristic of fastText-style langid, reduced to the
    * synthetic vocab).
    */
  val EnStopwords = Seq("the", "a")
  /** Stopword-ratio above this ⇒ English. */
  val EnTau = 0.03

  /** `lang_id`: predicted language per doc vs the labeled `lang`, aggregated
    * into a compact agreement matrix.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(ws, w -> w IN (${EnStopwords.map("'" + _ + "'").mkString(",")})))").cast("long"))
      .withColumn("pred_lang",
        when(col("n_stop").cast("double") / col("n_words") > EnTau, "en").otherwise("unknown"))
    d.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_stop")).cast("double") / sum(col("n_words")), 4).as("avg_stop_ratio"))
      .contractOrderBy("lang", "pred_lang")
  }

  val langIdSql: String = {
    val stopList = EnStopwords.map("'" + _ + "'").mkString(",")
    s"""WITH d AS (
       |  SELECT lang, string_split(text, ' ') AS ws FROM documents
       |), f AS (
       |  SELECT lang, CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(ws, w -> w IN ($stopList))) AS BIGINT) AS n_stop
       |  FROM d
       |)
       |SELECT lang,
       |  CASE WHEN CAST(n_stop AS DOUBLE) / n_words > $EnTau THEN 'en' ELSE 'unknown' END AS pred_lang,
       |  count(*) AS n_docs,
       |  round(CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 4) AS avg_stop_ratio
       |FROM f
       |GROUP BY lang, pred_lang
       |ORDER BY lang, pred_lang""".stripMargin
  }

  /** `quality_score`: per-doc quality features + composite score
    * (length / stopword ratio / type-token ratio — the C4/Gopher-rule
    * family reduced to deterministic column math).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stopList = EnStopwords.map("'" + _ + "'").mkString(",")
    Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("ws"))).cast("long"))
      .withColumn("ttr", round(col("n_distinct").cast("double") / col("n_words"), 4))
      .withColumn("stop_ratio",
        round(expr(s"size(filter(ws, w -> w IN ($stopList)))").cast("double") / col("n_words"), 4))
      .withColumn("avg_word_len",
        round((col("n_chars") - (col("n_words") - 1)).cast("double") / col("n_words"), 4))
      // Composite score in exact integer space (scaled by 1e4 per component)
      // then ONE double division — no float rounding boundary to disagree on.
      .withColumn("score",
        (expr("(10000 * n_distinct) div n_words") * 3
          + (lit(10000L) - expr(s"(10000 * size(filter(ws, w -> w IN ($stopList)))) div n_words")) * 3
          + least(col("n_words") * 100, lit(10000L)) * 4).cast("double") / 100000.0)
      .select("doc_id", "n_words", "n_distinct", "ttr", "stop_ratio", "avg_word_len", "score")
      .contractOrderBy("doc_id")
  }

  val qualityScoreSql: String = {
    val stopList = EnStopwords.map("'" + _ + "'").mkString(",")
    s"""WITH d AS (
       |  SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents
       |), f AS (
       |  SELECT doc_id, n_chars,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(ws, w -> w IN ($stopList))) AS BIGINT) AS n_stop
       |  FROM d
       |)
       |SELECT doc_id, n_words, n_distinct,
       |  round(CAST(n_distinct AS DOUBLE) / n_words, 4) AS ttr,
       |  round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stop_ratio,
       |  round(CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words, 4) AS avg_word_len,
       |  CAST(((10000 * n_distinct) // n_words) * 3
       |      + (10000 - ((10000 * n_stop) // n_words)) * 3
       |      + least(n_words * 100, 10000) * 4 AS DOUBLE) / 100000.0 AS score
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  /** `token_count`: whitespace tokens + BPE-ish regex tokens (alpha runs /
    * digit runs / other non-space) per doc.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("alpha_tokens", regexp_count(col("text"), lit("[a-zA-Z]+")).cast("long"))
      .withColumn("digit_tokens", regexp_count(col("text"), lit("[0-9]+")).cast("long"))
      .withColumn("bpe_tokens",
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / nullif(col("bpe_tokens"), lit(0L)), 4))
      .select("doc_id", "ws_tokens", "alpha_tokens", "digit_tokens", "bpe_tokens", "chars_per_token")
      .contractOrderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS alpha_tokens,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS digit_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
      |  round(CAST(n_chars AS DOUBLE) / nullif(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')), 0), 4) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** `doc_fingerprint`: whole-content md5 + winnowing-style min-shingle
    * fingerprint (min md5 over 5-gram shingles — the rolling-hash
    * fingerprint family).
    */
  val FpShingle = 5

  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val parts = (1 to FpShingle).map(k => s"element_at(ws, i + $k)").mkString(", ")
    Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      // short-doc guard: ANSI element_at past the end throws (see Dedup)
      .withColumn("sh5",
        expr(s"CASE WHEN size(ws) >= $FpShingle THEN transform(sequence(0, size(ws) - $FpShingle), i -> concat_ws(' ', $parts)) ELSE array(text) END"))
      .withColumn("content_md5", md5(col("text")))
      .withColumn("winnow_fp", expr("array_min(transform(sh5, s -> substr(md5(s), 1, 16)))"))
      .select("doc_id", "content_md5", "winnow_fp")
      .contractOrderBy("doc_id")
  }

  val docFingerprintSql: String = {
    val parts = (0 until FpShingle).map(k => s"ws[i + $k]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
       |SELECT doc_id, md5(text) AS content_md5,
       |  list_min(list_transform(
       |    CASE WHEN len(ws) >= $FpShingle
       |      THEN list_transform(generate_series(1, len(ws) - ${FpShingle - 1}), i -> $parts)
       |      ELSE [text] END,
       |    s -> substr(md5(s), 1, 16))) AS winnow_fp
       |FROM d
       |ORDER BY doc_id""".stripMargin
  }
}
