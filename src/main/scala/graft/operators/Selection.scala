package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data selection via importance resampling (SURVEY §2C) — the SELECTION
  * pillar of the training-data stack next to dedup / decontamination /
  * quality filtering: given a small curated TARGET slice and a large raw
  * POOL, score every pool document by how target-like it is and keep the
  * best `budget` docs (DSIR, Xie et al. 2023).
  *
  * Features are the paper's hashed n-grams: bigrams hashed into
  * [[Selection.DsirBuckets]] buckets; target and pool unigram-bucket LMs
  * with +1 smoothing; a pool doc's importance is the sum over its bigram
  * instances of `log p_target(bucket) − log p_pool(bucket)`. The
  * deterministic rung ranks by importance (score DESC, doc_id) — the
  * paper adds Gumbel noise for diversity, a noise rung a deployment seeds
  * per-run (noise would break cross-engine parity for no semantic gain
  * here).
  *
  * Determinism: both `ln` calls are rounded once to 6 dp and frozen as
  * DECIMAL(18,6) (the §5 / `nb_classify` discipline); per-doc scores are
  * exact decimal sums of those frozen ratios, so ranking can't
  * float-flip. Ties break to lower doc_id.
  *
  * Scale shape: the bucket ratio table is ≤ [[Selection.DsirBuckets]]
  * rows (BROADCAST — the paper's whole point: the target distribution
  * compresses to a fixed-size sketch no matter the corpus size); scoring
  * is one explode + broadcast join + doc-grain map-side-combined sum; the
  * final cut is orderBy+limit = TakeOrdered (never a global sort
  * materialized). At 100 TB: one corpus scan for counts (the target
  * slice is tiny), one for scoring.
  */
object Selection {

  def DsirBuckets: Int = GraftConf.dsirBuckets
  def DsirBudget: Int = GraftConf.dsirBudget
  def DsirTargetLang: String = GraftConf.dsirTargetLang

  /** `dsir_select`: top-[[DsirBudget]] most target-like pool docs. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirSelectOf(Tables.documents(spark, dir))

  /** Hashed-bigram instances of a corpus: (doc_id, is_target, bkt) —
    * [[Curation.bigramsExpr]], the quality filter's parity-proven bigram
    * construction, hashed into [[DsirBuckets]].
    */
  private def instancesOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), (col("lang") === DsirTargetLang).as("is_target"),
        explode(expr(Curation.bigramsExpr)).as("bg"))
      .withColumn("bkt",
        expr(s"cast(conv(substr(md5(bg), 1, 8), 16, 10) as bigint) % $DsirBuckets"))

  /** The per-bucket log-ratio table (bkt, lr) — DSIR's fixed-size sketch
    * of the target distribution. ≤ [[DsirBuckets]] rows; a deployment
    * builds this ONCE from the static corpus and broadcasts it everywhere
    * (the crawl-time scoring stream joins exactly this table).
    */
  def dsirRatiosOf(docs: DataFrame): DataFrame = {
    val b = DsirBuckets
    val inst = instancesOf(docs)
    // bucket counts for both LMs; only pool-observed buckets matter (every
    // bigram of every pool doc is pool-observed by construction)
    val counts = inst.groupBy(col("bkt")).agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("cr"))
      .filter(col("cr") > 0)
    val totals = inst.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tt"),
      sum(when(!col("is_target"), 1L).otherwise(0L)).as("tr"))
    // per-bucket log-ratio: each ln rounded ONCE then frozen as decimal
    counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        (round(log((col("ct") + 1).cast("double") / (col("tt") + b).cast("double")), 6)
            .cast("decimal(18,6)") -
          round(log((col("cr") + 1).cast("double") / (col("tr") + b).cast("double")), 6)
            .cast("decimal(18,6)")).as("lr"))
  }

  /** Every pool doc with its importance score, pre-cut:
    * (doc_id, lang, source, n_feats, score).
    */
  private[graft] def dsirPoolScoresOf(docs: DataFrame): DataFrame = {
    val ratios = dsirRatiosOf(docs)
    val scored = instancesOf(docs).filter(!col("is_target"))
      .join(broadcast(ratios), "bkt")
      .groupBy(col("doc_id"))
      .agg(sum(col("lr")).as("score"), count(lit(1)).as("n_feats"))
    docs.filter(col("lang") =!= DsirTargetLang)
      .select(col("doc_id"), col("lang"), col("source"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0).cast("decimal(29,6)")).as("score"))
  }

  /** Core over any (doc_id, text, lang, source) frame — specs plant a
    * pool with target-vocabulary overlap and assert the overlap ranks
    * first.
    */
  def dsirSelectOf(docs: DataFrame): DataFrame = {
    val k = DsirBudget
    // TakeOrdered cut, then rank the (tiny) selected set
    val top = dsirPoolScoresOf(docs)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .contractOrderBy("doc_id")
  }

  def dsirSelectSql: String = {
    val b = DsirBuckets
    val k = DsirBudget
    val t = DsirTargetLang
    s"""WITH d AS (
       |  SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents
       |), base AS (
       |  SELECT doc_id, (lang = '$t') AS is_target,
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1])
       |      ELSE CAST([] AS VARCHAR[]) END AS bgs
       |  FROM d
       |), inst AS (
       |  SELECT doc_id, is_target,
       |    CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT) % $b AS bkt
       |  FROM (SELECT doc_id, is_target, unnest(bgs) AS bg FROM base)
       |), cnt AS (
       |  SELECT * FROM (
       |    SELECT bkt,
       |      CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |      CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |    FROM inst GROUP BY bkt) WHERE cr > 0
       |), tot AS (
       |  SELECT
       |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tt,
       |    CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS tr
       |  FROM inst
       |), lr AS (
       |  SELECT bkt,
       |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + $b AS DOUBLE)), 6) AS DECIMAL(18,6))
       |      - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + $b AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lrv
       |  FROM cnt, tot
       |), scored AS (
       |  SELECT i.doc_id, sum(l.lrv) AS score, count(*) AS n_feats
       |  FROM inst i JOIN lr l USING (bkt) WHERE NOT i.is_target GROUP BY i.doc_id
       |), pool AS (
       |  SELECT p.doc_id, p.lang, p.source,
       |    CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       |    coalesce(s.score, 0) AS score
       |  FROM documents p LEFT JOIN scored s ON p.doc_id = s.doc_id
       |  WHERE p.lang <> '$t'
       |), ranked AS (
       |  SELECT doc_id, lang, source, n_feats, score,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM pool
       |)
       |SELECT doc_id, lang, source, n_feats, score, rank
       |FROM ranked WHERE rank <= $k
       |ORDER BY doc_id""".stripMargin
  }
}
