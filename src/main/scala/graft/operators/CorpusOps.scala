package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus management operators (SURVEY §2C) every training-data pipeline
  * needs: deterministic splits, stratified sampling, PII redaction /
  * normalization, global stats. All are hash-deterministic (never RNG-
  * based) so reruns, retries, and the DuckDB oracle agree at any scale.
  */
object CorpusOps {

  /** Train/val/test boundaries on the 0..99 hash-bucket space. */
  val TrainUpto = 80
  val ValUpto = 90
  /** Stratified sample keeps buckets < this per stratum (20%). */
  val SampleUpto = 20

  /** 0..99 bucket from a stable content-independent key (doc_id) — docs
    * keep their split across corpus versions.
    */
  private val bucketExpr =
    "pmod(graft_md5_long(cast(doc_id as string), 1, 8), 100)"
  private val bucketSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  /** `split_assign`: deterministic 80/10/10 train/val/test assignment. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(bucketExpr))
      .withColumn("split",
        when(col("bucket") < TrainUpto, "train")
          .when(col("bucket") < ValUpto, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .contractOrderBy("doc_id")

  val splitAssignSql: String =
    s"""SELECT doc_id, $bucketSql AS bucket,
       |  CASE WHEN $bucketSql < $TrainUpto THEN 'train'
       |       WHEN $bucketSql < $ValUpto THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** `corpus_diff`: snapshot diff — the primitive a crawl pipeline runs
    * between corpus versions before deciding what to reprocess: every
    * doc_id classified `added` / `removed` / `changed` / `unchanged` by
    * content hash. ONE key-shuffle full-outer join of two hashed corpus
    * scans (md5 computed map-side); at 100 TB both sides stream through
    * the join with no other state — this is exactly the shape a
    * snapshot-diff stays cheap in.
    *
    * The two snapshots are carved deterministically from the corpus (no
    * second snapshot file exists in the test data): snapshot A drops
    * doc_id ≡ 0 (mod 11) — those become `added` in B; snapshot B drops
    * doc_id ≡ 0 (mod 13) — `removed`; B revises the text of doc_id ≡ 0
    * (mod 7) — `changed`. The SAME carving runs in the oracle, so what is
    * under test is the diff classification itself.
    */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val snapA = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    val snapB = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    corpusDiffOf(snapA, snapB)
  }

  /** The diff core over two explicit (doc_id, text) snapshots. */
  def corpusDiffOf(snapA: DataFrame, snapB: DataFrame): DataFrame =
    corpusDiffRawOf(snapA, snapB).contractOrderBy("doc_id")

  /** [[corpusDiffOf]] without the contract ordering — the seam
    * aggregation consumers ([[sourceDriftReport]]) read so no sort sits
    * under their group-by.
    */
  private[graft] def corpusDiffRawOf(snapA: DataFrame, snapB: DataFrame): DataFrame = {
    val a = snapA.select(col("doc_id"), md5(col("text")).as("hash_a"))
    val b = snapB.select(col("doc_id"), md5(col("text")).as("hash_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("hash_a").isNull, "added")
          .when(col("hash_b").isNull, "removed")
          .when(col("hash_a") =!= col("hash_b"), "changed")
          .otherwise("unchanged").as("status"),
        col("hash_a"), col("hash_b"))
  }

  val corpusDiffSql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS hash_a FROM documents WHERE doc_id % 11 <> 0
      |), b AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS hash_b
      |  FROM documents WHERE doc_id % 13 <> 0
      |)
      |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN a.doc_id IS NULL THEN 'added'
      |       WHEN b.doc_id IS NULL THEN 'removed'
      |       WHEN hash_a <> hash_b THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  hash_a, hash_b
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin

  /** `source_drift_report`: the crawl-ops drift dashboard (r10) — per
    * SOURCE, how the corpus moved between two snapshots: doc/token totals
    * and their integer deltas, per-doc churn (added/removed/changed from
    * the [[corpusDiffOf]] status grain), and mean composite quality per
    * side. This is the twin of `lm_coverage_report` on the crawl axis:
    * coverage tells you the MODEL no longer fits a source; this tells you
    * the SOURCE itself moved (a scrape pipeline change, a spam flood, a
    * site redesign), per source so the re-crawl/drop decision has a
    * target. Snapshots are the deterministic carving `corpus_diff`
    * already uses (A = `doc_id % 11 ≠ 0`; B = `doc_id % 13 ≠ 0` with the
    * `% 7` rev2 text mutation); quality is [[TextAnalysis
    * .qualityIntScoreOf]]'s EXACT integer composite summed per side, so
    * the only float step is one identical divide + round(·,4) per emitted
    * mean.
    *
    * Scale: two snapshot scans with map-side-combined per-source rollups,
    * the diff's doc_id full-outer hash join (hashes only, never text),
    * one source-keyed join of O(sources)-row tables. No windows, no
    * driver state.
    */
  def sourceDriftReport(spark: SparkSession, dir: String): DataFrame =
    sourceDriftReportOf(Tables.documents(spark, dir))

  /** The drift core over any (doc_id, source, text) frame — specs plant
    * per-source churn and assert the counts land on the right source.
    */
  private[graft] def sourceDriftReportOf(docs: DataFrame): DataFrame = {
    val snapA = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
    val snapB = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    def rollup(snap: DataFrame, sfx: String): DataFrame =
      snap.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .join(TextAnalysis.qualityIntScoreOf(snap), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as(s"n_docs_$sfx"),
          sum(col("n_tokens")).as(s"tok_$sfx"),
          sum(col("qint")).as(s"qint_$sfx"))
    val churn = corpusDiffRawOf(
        snapA.select("doc_id", "text"), snapB.select("doc_id", "text"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"))
    def meanQ(qintCol: String, nCol: String) =
      when(col(nCol) > 0,
        round(col(qintCol).cast("double") / (col(nCol) * 100000L), 4))
        .otherwise(lit(null).cast("double"))
    rollup(snapA, "a").join(rollup(snapB, "b"), Seq("source"), "full_outer")
      .join(churn, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b"),
        (coalesce(col("n_docs_b"), lit(0L)) - coalesce(col("n_docs_a"), lit(0L))).as("d_docs"),
        coalesce(col("tok_a"), lit(0L)).as("tok_a"),
        coalesce(col("tok_b"), lit(0L)).as("tok_b"),
        (coalesce(col("tok_b"), lit(0L)) - coalesce(col("tok_a"), lit(0L))).as("d_tokens"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"),
        meanQ("qint_a", "n_docs_a").as("avg_q_a"),
        meanQ("qint_b", "n_docs_b").as("avg_q_b"))
      .contractOrderBy("source")
  }

  def sourceDriftReportSql: String = {
    val stopList = TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(",")
    def rollupSql(name: String, src: String, sfx: String): String =
      s"""$name AS (
         |  SELECT source,
         |    CAST(count(*) AS BIGINT) AS n_docs_$sfx,
         |    CAST(sum(n_tokens) AS BIGINT) AS tok_$sfx,
         |    CAST(sum(qint) AS BIGINT) AS qint_$sfx
         |  FROM (
         |    SELECT source, CAST(len(ws) AS BIGINT) AS n_tokens,
         |      ((10000 * CAST(len(list_distinct(ws)) AS BIGINT)) // CAST(len(ws) AS BIGINT)) * 3
         |        + (10000 - ((10000 * CAST(len(list_filter(ws, w -> w IN ($stopList))) AS BIGINT)) // CAST(len(ws) AS BIGINT))) * 3
         |        + least(CAST(len(ws) AS BIGINT) * 100, 10000) * 4 AS qint
         |    FROM (SELECT source, string_split(text, ' ') AS ws FROM $src))
         |  GROUP BY source
         |)""".stripMargin
    s"""WITH sa AS (
       |  SELECT doc_id, source, text FROM documents WHERE doc_id % 11 <> 0
       |), sb AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
       |  FROM documents WHERE doc_id % 13 <> 0
       |),
       |${rollupSql("ra", "sa", "a")},
       |${rollupSql("rb", "sb", "b")},
       |st AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |    CASE WHEN a.doc_id IS NULL THEN 'added'
       |         WHEN b.doc_id IS NULL THEN 'removed'
       |         WHEN a.hash_a <> b.hash_b THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM (SELECT doc_id, md5(text) AS hash_a FROM sa) a
       |  FULL OUTER JOIN (SELECT doc_id, md5(text) AS hash_b FROM sb) b
       |    ON a.doc_id = b.doc_id
       |), churn AS (
       |  SELECT d.source,
       |    CAST(sum(CASE WHEN st.status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |    CAST(sum(CASE WHEN st.status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(sum(CASE WHEN st.status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
       |  FROM st JOIN documents d ON st.doc_id = d.doc_id
       |  GROUP BY d.source
       |)
       |SELECT coalesce(ra.source, rb.source) AS source,
       |  CAST(coalesce(n_docs_a, 0) AS BIGINT) AS n_docs_a,
       |  CAST(coalesce(n_docs_b, 0) AS BIGINT) AS n_docs_b,
       |  CAST(coalesce(n_docs_b, 0) - coalesce(n_docs_a, 0) AS BIGINT) AS d_docs,
       |  CAST(coalesce(tok_a, 0) AS BIGINT) AS tok_a,
       |  CAST(coalesce(tok_b, 0) AS BIGINT) AS tok_b,
       |  CAST(coalesce(tok_b, 0) - coalesce(tok_a, 0) AS BIGINT) AS d_tokens,
       |  CAST(coalesce(n_added, 0) AS BIGINT) AS n_added,
       |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(coalesce(n_changed, 0) AS BIGINT) AS n_changed,
       |  CASE WHEN coalesce(n_docs_a, 0) > 0
       |    THEN round(CAST(qint_a AS DOUBLE) / (n_docs_a * 100000), 4)
       |    ELSE CAST(NULL AS DOUBLE) END AS avg_q_a,
       |  CASE WHEN coalesce(n_docs_b, 0) > 0
       |    THEN round(CAST(qint_b AS DOUBLE) / (n_docs_b * 100000), 4)
       |    ELSE CAST(NULL AS DOUBLE) END AS avg_q_b
       |FROM ra FULL OUTER JOIN rb ON ra.source = rb.source
       |LEFT JOIN churn ON churn.source = coalesce(ra.source, rb.source)
       |ORDER BY source""".stripMargin
  }

  // ---- vocab_growth / vocab_coverage --------------------------------------

  /** Doc-count checkpoints (percent of the max doc_id) at which
    * [[vocabGrowth]] samples the curve.
    */
  private[graft] val GrowthPcts: Seq[Int] = Seq(1, 2, 5, 10, 20, 50, 100)

  /** `vocab_growth` (r10): the Heaps-law curve — distinct-vocabulary size
    * and token total at doc-count checkpoints (1/2/5/10/20/50/100% of the
    * id range). The tokenizer-budget planning read: where the V ∝ Tᵝ
    * curve is still steep, a bigger crawl keeps buying vocabulary (and a
    * BPE/vocab budget sized on the sample will under-fit the full crawl);
    * where it flattens, the corpus has saturated its domain. Also the
    * crawl-dedup sanity check — a vocab curve that goes FLAT early while
    * tokens keep growing is a crawler re-fetching the same content.
    *
    * NO ordered pass and no cumulative window: "vocab at checkpoint c" =
    * count of words whose MIN doc_id ≤ c — one word-grain min
    * aggregation, one doc-grain token count, each conditionally summed
    * against the 7-row broadcast checkpoint table. Exactly two
    * map-side-combinable aggregations over the corpus at any scale.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    vocabGrowthOf(spark, Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — specs plant a one-new-word-per-
    * doc prefix whose curve is exact by construction.
    */
  def vocabGrowthOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val maxId = docs.agg(max(col("doc_id")).as("max_id"))
    val cps = spark.createDataFrame(GrowthPcts.map(Tuple1(_))).toDF("pct")
      .crossJoin(broadcast(maxId))
      .select(col("pct"), expr("(max_id * pct) div 100").as("cut"))
    val firstSeen = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(min(col("doc_id")).as("first_doc"))
    val vocabAt = firstSeen.crossJoin(broadcast(cps))
      .groupBy(col("pct"), col("cut"))
      .agg(sum(when(col("first_doc") <= col("cut"), 1L).otherwise(0L)).as("vocab"))
    val docTok = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("n_tok"))
    val tokAt = docTok.crossJoin(broadcast(cps))
      .groupBy(col("pct"))
      .agg(sum(when(col("doc_id") <= col("cut"), 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("doc_id") <= col("cut"), col("n_tok")).otherwise(0L)).as("n_tokens"))
    vocabAt.join(tokAt, "pct")
      .select(col("pct"), col("cut"), col("n_docs"), col("n_tokens"), col("vocab"))
      .contractOrderBy("pct")
  }

  def vocabGrowthSql: String =
    s"""WITH mx AS (
       |  SELECT max(doc_id) AS max_id FROM documents
       |), cps AS (
       |  SELECT pct, (max_id * pct) // 100 AS cut
       |  FROM (SELECT unnest([${GrowthPcts.mkString(", ")}]) AS pct) CROSS JOIN mx
       |), fs AS (
       |  SELECT word, min(doc_id) AS first_doc FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |  ) WHERE word <> '' GROUP BY word
       |), va AS (
       |  SELECT pct, cut,
       |    CAST(sum(CASE WHEN first_doc <= cut THEN 1 ELSE 0 END) AS BIGINT) AS vocab
       |  FROM fs CROSS JOIN cps GROUP BY pct, cut
       |), dt AS (
       |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tok
       |  FROM documents
       |), ta AS (
       |  SELECT pct,
       |    CAST(sum(CASE WHEN doc_id <= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN doc_id <= cut THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens
       |  FROM dt CROSS JOIN cps GROUP BY pct
       |)
       |SELECT va.pct, va.cut, ta.n_docs, ta.n_tokens, va.vocab
       |FROM va JOIN ta ON va.pct = ta.pct
       |ORDER BY va.pct""".stripMargin

  /** Power-of-two count thresholds for [[vocabCoverage]]. */
  private[graft] val CoverageThresholds: Seq[Long] =
    Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L)

  /** `vocab_coverage` (r10): the Zipf head/tail mass profile WITHOUT a
    * sort — for each power-of-two count threshold t, how many vocabulary
    * words occur ≥ t times and what integer basis-point share of all
    * token occurrences they cover. The how-big-must-the-vocab-be read
    * (`vocab_top_tokens` shows the head's members; this prices the whole
    * curve): a corpus where 128+-count words cover 9000 bp tokenizes
    * cheaply; one where coverage collapses below t=8 is identifier soup
    * that will shred any fixed vocab. Rank-free by design — cumulative
    * coverage at RANK checkpoints needs a vocab-grain global sort, the
    * count-threshold form is two map-side-combinable aggregations and an
    * 8-row broadcast, the same no-ordered-pass discipline as
    * [[vocabGrowth]]; coverage_bp is integer `(10000·mass) div total`
    * (no float ratio decides a reported value).
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageOf(spark, Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — specs plant exact word counts
    * on both sides of each threshold.
    */
  def vocabCoverageOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val ths = spark.createDataFrame(CoverageThresholds.map(Tuple1(_))).toDF("threshold")
    counts.crossJoin(broadcast(ths))
      .groupBy(col("threshold"))
      .agg(sum(when(col("n") >= col("threshold"), 1L).otherwise(0L)).as("n_words"),
        sum(when(col("n") >= col("threshold"), col("n")).otherwise(0L)).as("mass"))
      .crossJoin(broadcast(total))
      .select(col("threshold"), col("n_words"),
        col("mass"), expr("(10000 * mass) div total").as("coverage_bp"))
      .contractOrderBy("threshold")
  }

  def vocabCoverageSql: String =
    s"""WITH c AS (
       |  SELECT word, count(*) AS n FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
       |  ) WHERE word <> '' GROUP BY word
       |), tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS total FROM c
       |), th AS (
       |  SELECT CAST(unnest([${CoverageThresholds.mkString(", ")}]) AS BIGINT) AS threshold
       |)
       |SELECT threshold,
       |  CAST(sum(CASE WHEN n >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN n >= threshold THEN n ELSE 0 END) AS BIGINT) AS mass,
       |  (10000 * CAST(sum(CASE WHEN n >= threshold THEN n ELSE 0 END) AS BIGINT)) // (SELECT total FROM tot) AS coverage_bp
       |FROM c CROSS JOIN th
       |GROUP BY threshold
       |ORDER BY threshold""".stripMargin

  // ---- embedding_drift ----------------------------------------------------

  /** `embedding_drift` (r10): the ENCODER-axis drift dashboard,
    * completing the drift family — `lm_coverage_report` says the model
    * no longer fits a source (model axis), `source_drift_report` says
    * the source's text moved (crawl axis), and this says the source's
    * EMBEDDINGS moved (encoder axis: a re-encode with a new checkpoint,
    * a quietly bumped encoder version, a corrupted re-run). Per source,
    * the centroid of each snapshot on the exact kmeans integer grid
    * ([[Clustering.scaledEmbOf]]'s quantization + the Lloyd
    * round-half-up mean — the SAME arithmetic, so a drifted centroid
    * here means the ANN/SemDeDup geometry actually moved), with exact
    * integer centroid-to-centroid d2 and one rounded cosine as the
    * drift signal. cos ≈ 1 with d2 > 0 = magnitude-only change
    * (rescaled encoder); cos < 1 = the direction moved (retrained
    * encoder — rebuild the IVF/PQ stores, the `ArtifactCatalog` drift
    * class this query gives a per-source early warning for).
    *
    * Snapshots are the `corpus_diff` carving applied to vec_ids
    * (A = `% 11 ≠ 0`, B = `% 13 ≠ 0`), and B's `% 7 ≡ 0` rows are
    * "re-encoded" by an integer grid offset (+[[ReencodeGridOffset]] on
    * dim 0) — applied AFTER quantization, so the mutation is exactly
    * representable in both engines and the carving stays the tested
    * seam, not float arithmetic.
    *
    * Scale: two snapshot scans exploded to (source, dim) grain —
    * map-side-combinable sums, sources × dims rows out — then one
    * O(sources) key join; no windows, no driver state.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame =
    embeddingDriftOf(Tables.documents(spark, dir), Tables.embeddings(spark, dir))

  /** Grid offset simulating a re-encode on snapshot B's `% 7` rows
    * (0.25 at the 1e-6 grid).
    */
  private[graft] val ReencodeGridOffset: Long = 250000L

  def embeddingDriftOf(docs: DataFrame, embs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id").as("vec_id"), col("source"))
    val sv = Clustering.scaledEmbOf(embs)
    val a = sv.filter(col("vec_id") % 11 =!= 0).select(col("vec_id"), col("se"))
    val b = sv.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"),
        when(col("vec_id") % 7 === 0,
          expr(s"transform(se, (x, i) -> CASE WHEN i = 0 THEN x + $ReencodeGridOffset ELSE x END)"))
          .otherwise(col("se")).as("se"))
    def centroids(side: DataFrame): DataFrame = side.join(src, "vec_id")
      .select(col("source"), posexplode(col("se")).as(Seq("pos", "v")))
      .groupBy(col("source"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("source"), col("pos"),
        expr("cast(round(cast(s as double) / n) as bigint)").as("c"), col("n"))
    val ca = centroids(a)
    val cb = centroids(b).select(col("source"), col("pos"),
      col("c").as("cb"), col("n").as("nb"))
    ca.join(cb, Seq("source", "pos"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_a"), max(col("nb")).as("n_b"),
        sum((col("c") - col("cb")) * (col("c") - col("cb"))).as("d2_centroid"),
        sum(col("c") * col("cb")).as("dot"),
        sum(col("c") * col("c")).as("na2"),
        sum(col("cb") * col("cb")).as("nb2"))
      .select(col("source"), col("n_a"), col("n_b"), col("d2_centroid"),
        when(col("na2") > 0 && col("nb2") > 0,
          round(col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 4))
          .as("cos_centroid"))
      .contractOrderBy("source")
  }

  def embeddingDriftSql: String = {
    val sc = Clustering.Scale
    val off = ReencodeGridOffset
    s"""WITH sv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $sc) AS BIGINT)) AS se
       |  FROM embeddings
       |), esrc AS (
       |  SELECT doc_id AS vec_id, source FROM documents
       |), ea AS (
       |  SELECT s.source, unnest(v.se) AS v, unnest(generate_series(1, len(v.se))) AS pos
       |  FROM (SELECT vec_id, se FROM sv WHERE vec_id % 11 <> 0) v
       |  JOIN esrc s USING (vec_id)
       |), eb AS (
       |  SELECT s.source, unnest(v.se) AS v, unnest(generate_series(1, len(v.se))) AS pos
       |  FROM (
       |    SELECT vec_id,
       |      CASE WHEN vec_id % 7 = 0
       |        THEN list_transform(generate_series(1, len(se)), i ->
       |          CASE WHEN i = 1 THEN se[i] + $off ELSE se[i] END)
       |        ELSE se END AS se
       |    FROM sv WHERE vec_id % 13 <> 0) v
       |  JOIN esrc s USING (vec_id)
       |), ca AS (
       |  SELECT source, pos, CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM ea GROUP BY source, pos
       |), cb AS (
       |  SELECT source, pos, CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM eb GROUP BY source, pos
       |)
       |SELECT ca.source, max(ca.n) AS n_a, max(cb.n) AS n_b,
       |  CAST(sum((ca.c - cb.c) * (ca.c - cb.c)) AS BIGINT) AS d2_centroid,
       |  CASE WHEN sum(ca.c * ca.c) > 0 AND sum(cb.c * cb.c) > 0 THEN
       |    round(CAST(sum(ca.c * cb.c) AS DOUBLE) /
       |      (sqrt(CAST(sum(ca.c * ca.c) AS DOUBLE)) * sqrt(CAST(sum(cb.c * cb.c) AS DOUBLE))), 4)
       |  END AS cos_centroid
       |FROM ca JOIN cb ON ca.source = cb.source AND ca.pos = cb.pos
       |GROUP BY ca.source
       |ORDER BY ca.source""".stripMargin
  }

  /** `stratified_sample`: hash-deterministic 20% sample per language
    * stratum (uniform within stratum, stable across runs).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(bucketExpr))
      .filter(col("bucket") < SampleUpto)
      .select("doc_id", "lang", "bucket")
      .contractOrderBy("doc_id")

  val stratifiedSampleSql: String =
    s"""SELECT doc_id, lang, $bucketSql AS bucket
       |FROM documents
       |WHERE $bucketSql < $SampleUpto
       |ORDER BY doc_id""".stripMargin

  /** Redaction bank: the production patterns (emails, long digit runs,
    * phone-ish) plus `customer` standing in for a named-entity hit — the
    * synthetic corpus has no real PII, so the entity rule keeps the
    * replace path exercised.
    */
  val RedactPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}" -> "<PHONE>",
    "[0-9]{6,}" -> "<NUM>",
    "customer" -> "<ENTITY>")

  /** `text_normalize`: redact + collapse whitespace + trim, with change
    * accounting.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    val redacted = RedactPatterns.foldLeft(col("text")) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    Tables.documents(spark, dir)
      .withColumn("norm_text", trim(regexp_replace(redacted, " +", " ")))
      .withColumn("n_entities", regexp_count(col("text"), lit("customer")).cast("long"))
      .withColumn("changed", col("norm_text") =!= col("text"))
      .select("doc_id", "norm_text", "n_entities", "changed")
      .contractOrderBy("doc_id")
  }

  val textNormalizeSql: String = {
    val redacted = RedactPatterns.foldLeft("text") {
      case (c, (p, r)) => s"regexp_replace($c, '$p', '$r', 'g')"
    }
    s"""SELECT doc_id,
       |  trim(regexp_replace($redacted, ' +', ' ', 'g')) AS norm_text,
       |  CAST(len(regexp_extract_all(text, 'customer')) AS BIGINT) AS n_entities,
       |  trim(regexp_replace($redacted, ' +', ' ', 'g')) <> text AS changed
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** `bottomk_sample`: deterministic k-doc sample per language via the
    * [[graft.functions.BottomK]] bounded-state aggregate (the scalable
    * replacement for `sort_array(collect_list(...))[1:k]`, whose buffer is
    * unbounded). The same hashes double as a KMV distinct sketch.
    */
  val SampleK = 5

  def bottomkSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .groupBy(col("lang"))
      .agg(
        expr(s"array_join(graft_bottomk(h, $SampleK), ',')").as("sample_hashes"),
        count(lit(1)).as("n_docs"))
      .contractOrderBy("lang")

  val bottomkSampleSql: String =
    s"""SELECT lang,
       |  array_to_string(list_sort(list(md5(CAST(doc_id AS VARCHAR))))[1:$SampleK], ',') AS sample_hashes,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** `corpus_stats`: one-row global profile of the corpus. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_chars")).as("total_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_doc_chars"),
        sum(when(col("text").rlike("\\bdup\\b"), 1).otherwise(0)).cast("long").as("n_dup_marked"))

  /** The 100 TB profile path: HyperLogLog++ sketches instead of exact
    * `countDistinct`. Exact distinct counts shuffle every distinct value to
    * count it — for token-grain cardinalities that's a vocabulary-sized
    * shuffle per stat; the HLL sketch is a few KB per partition, merged
    * map-side, with relative error ~ rsd regardless of cardinality (spec
    * bounds it empirically against [[corpusStats]]' exact counts at the
    * token grain, where the error statistics are meaningful).
    *
    * Test-only (no oracle row): DuckDB's approx_count_distinct is a
    * different sketch — cross-engine hash parity is impossible BY DESIGN
    * for approximate answers; correctness evidence is the error bound.
    */
  def corpusStatsApprox(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("token"))
      .agg(
        count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("token"), rsd).as("approx_distinct_tokens"),
        approx_count_distinct(col("lang"), rsd).as("approx_langs"),
        approx_count_distinct(col("source"), rsd).as("approx_sources"))

  /** `vocab_top_tokens`: top-[[VocabK]] token vocabulary with corpus
    * coverage — the first step of any BPE/WordPiece-style tokenizer build.
    *
    * Scale: token counts are one map-side-combined aggregation; the global
    * total is a SECOND tiny aggregate broadcast back (never a global
    * window, which would single-partition a 100 TB-vocabulary). Top-k is
    * orderBy+limit = TakeOrdered, not a full sort.
    */
  val VocabK = 50

  def vocabTopTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("token"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("coverage"))
      .orderBy(col("n").desc, col("token"))
      .limit(VocabK)
  }

  val vocabTopTokensSql: String =
    s"""WITH t AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
       |), c AS (
       |  SELECT token, count(*) AS n FROM t WHERE token <> '' GROUP BY token
       |), tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS total FROM c
       |)
       |SELECT token, n, round(CAST(n AS DOUBLE) / total, 6) AS coverage
       |FROM c CROSS JOIN tot
       |ORDER BY n DESC, token
       |LIMIT $VocabK""".stripMargin

  /** [[vocabTopTokens]]' bounded-memory scale twin: corpus heavy hitters
    * via the [[graft.functions.MisraGries]] sketch. The exact pass's
    * word-grain state is Heaps-law bounded on natural text but
    * quasi-unbounded on crawl token universes (URLs, identifiers,
    * hashes); MG holds at most k counters per partition AND per merged
    * buffer, so the whole corpus reduces to ONE k-entry summary with the
    * mergeable-summaries guarantee — every token with true frequency
    * > N/(k+1) present, estimates within N/(k+1) below truth.
    *
    * Test-only (no oracle row): the surviving low-frequency stragglers
    * depend on merge order — inherent to MG; the spec asserts the BOUNDS,
    * which hold for every merge order, against the exact counts.
    */
  def vocabTopTokensApprox(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .agg(call_function("graft_mgtopk", col("token"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.est").as("est"))

  /** `tfidf_topk`: each document's [[GraftConf.tfidfTopK]] most
    * characteristic terms by tf-idf — the classic keyword-extraction /
    * topic-tagging pass a curation pipeline runs for corpus exploration
    * and domain labeling (Salton & Buckley 1988 term weighting).
    *
    * Determinism: idf freezes once per word as `round(ln(N/df), 6)`
    * DECIMAL(18,6); the ranking compares the EXACT decimal product
    * `tf · idf` (never the rounded double output), ties broken by word, so
    * neither engine can float-flip a rank. df is derived from the tf table
    * (count of rows per word — already doc-distinct by its grain), not a
    * second countDistinct pass over tokens.
    *
    * Scale shape: one token explode, one (doc,word)-grain map-side count,
    * one word-grain rollup of that table, one vocab-grain key join (AQE
    * broadcasts the idf side when it fits), and a per-doc top-k window
    * PARTITIONED BY doc_id — shuffle grain doc_id, never a global sort.
    */
  def tfidfTopk(spark: SparkSession, dir: String): DataFrame =
    tfidfTopkOf(Tables.documents(spark, dir))

  def tfidfTopkOf(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = tok.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = dfr.crossJoin(broadcast(n))
      .select(col("word"),
        round(log(col("n").cast("double") / col("df").cast("double")), 6)
          .cast("decimal(18,6)").as("idf"))
    tf.join(idf, Seq("word"))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("word"))).cast("long"))
      .filter(col("rank") <= GraftConf.tfidfTopK)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"),
        round(col("score").cast("double"), 4).as("score"))
      .contractOrderBy("doc_id", "rank")
  }

  def tfidfTopkSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |), tf AS (
       |  SELECT doc_id, word, count(*) AS tf FROM tok WHERE word <> '' GROUP BY doc_id, word
       |), df AS (
       |  SELECT word, count(*) AS df FROM tf GROUP BY word
       |), n AS (
       |  SELECT count(*) AS n FROM documents
       |), idf AS (
       |  SELECT word,
       |    CAST(round(ln(CAST((SELECT n FROM n) AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS DECIMAL(18,6)) AS idf
       |  FROM df
       |), ranked AS (
       |  SELECT tf.doc_id, tf.word, tf.tf, tf.tf * idf.idf AS score,
       |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf * idf.idf DESC, tf.word) AS rank
       |  FROM tf JOIN idf ON tf.word = idf.word
       |)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, CAST(tf AS BIGINT) AS tf,
       |  round(CAST(score AS DOUBLE), 4) AS score
       |FROM ranked WHERE rank <= ${GraftConf.tfidfTopK}
       |ORDER BY doc_id, rank""".stripMargin

  val corpusStatsSql: String =
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_doc_chars,
      |  CAST(sum(CASE WHEN regexp_matches(text, '\bdup\b') THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_marked
      |FROM documents""".stripMargin

  /** `length_histogram`: per-source document-length histogram in
    * DECIMAL-DIGIT buckets (bucket = number of digits of the token count:
    * 1 → 1-9 tokens, 2 → 10-99, …) — the corpus profile read before
    * setting packing budgets and length filters, and the drift alarm
    * between crawls (a new boilerplate source shows up as a spike in one
    * bucket). The bucket function is `length(CAST(n AS VARCHAR))` — pure
    * integer/string machinery with identical semantics in both engines,
    * where a float `log10` would invite last-ulp bucket flips at powers of
    * ten. Stateless projection + one (source, bucket) hash aggregation;
    * output is O(sources × 20).
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bucket", length(col("n_tokens").cast("string")).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .contractOrderBy("source", "bucket")

  val lengthHistogramSql: String =
    """WITH t AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |)
      |SELECT source, CAST(length(CAST(n_tokens AS VARCHAR)) AS BIGINT) AS bucket,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM t GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin
}
