package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed k-means (Lloyd) over the embedding column — trains the coarse
  * centroids the IVF ANN path ([[Similarity.blockedTopK]]) probes against,
  * instead of relying on pre-assigned labels.
  *
  * Determinism (SURVEY §5): embeddings are quantized once to 1e-6-scaled
  * BIGINTs, so every distance is an exact integer (order-independent partial
  * aggregation, bit-identical to DuckDB). Centroid updates divide exact
  * integer sums (< 2^53, so the double quotient is identical in both
  * engines) and re-round to the integer grid. Assignment argmin breaks d2
  * ties on centroid id.
  *
  * Scale: centroids are K rows — always broadcast; each Lloyd round is ONE
  * corpus scan (assignment, map-side-combined argmin) + one (cluster, dim)
  * keyed aggregation of K·dims rows for the update. Rounds are a fixed
  * constant (2 here), so at 100 TB the cost is 2 linear scans — no
  * all-pairs anything. Empty clusters keep their previous centroid (the
  * standard Lloyd fallback), expressed as a left join + coalesce.
  */
object Clustering {

  /** Cluster count (`spark.graft.kmeans.k`, default 10 at test scale; size
    * to O(√corpus) cells for IVF) and assignment rounds
    * (`spark.graft.kmeans.iters`, default 2). Conf-driven — the oracle SQL
    * generator reads the same confs, so parity holds at any setting.
    */
  def K: Int = GraftConf.kmeansK
  def Iters: Int = GraftConf.kmeansIters
  /** Train-sample modulus (`spark.graft.kmeans.trainSampleMod`, default 1 =
    * full corpus). See [[GraftConf.kmeansTrainSampleMod]].
    */
  def TrainSampleMod: Int = GraftConf.kmeansTrainSampleMod
  /** Fixed-point scale of the exact integer grid. */
  val Scale = 1000000L

  /** (vec_id, se: array<bigint>) — embeddings quantized to the exact grid. */
  private[operators] def scaledEmb(spark: SparkSession, dir: String): DataFrame =
    scaledEmbOf(Tables.embeddings(spark, dir))

  private[graft] def scaledEmbOf(embs: DataFrame): DataFrame =
    embs.select(
      col("vec_id"),
      expr(s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) as bigint))")
        .as("se"))

  /** Exact squared L2 distance between the row's `se` and centroid `cemb` —
    * the native codegen'd [[graft.functions.L2Squared]] (a primitive loop in
    * WholeStageCodegen), not `aggregate(zip_with(...))` which allocates a
    * zipped array and boxes the accumulator per (vector × centroid) pair in
    * the assignment scan's hot loop.
    */
  private val d2: org.apache.spark.sql.Column = expr("graft_l2sq(se, cemb)")

  /** Argmin assignment of every vector to a centroid set (broadcast). */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))

  /** Trained centroids after the fixed Lloyd rounds: (cid, cemb) on the
    * exact integer grid. This is the coarse quantizer the IVF ANN path
    * ([[Similarity.trainedIvfTopK]]) probes. K rows — at 100 TB a caller
    * persists this tiny table once and broadcasts it everywhere.
    */
  def trainedCentroids(spark: SparkSession, dir: String): DataFrame =
    trainedCentroidsOf(scaledEmb(spark, dir))

  /** [[trainedCentroids]] over any already-scaled (vec_id, se) relation —
    * the seam the scale probe trains per-scale quantizers through.
    */
  private[graft] def trainedCentroidsOf(vecs: DataFrame): DataFrame = {
    val mod = TrainSampleMod
    // Lloyd rounds see the deterministic vec_id-modulus sample only; the
    // K seeds are the sample's K lowest ids (vec_id < K·mod on the id
    // grid — the same pushdown-able shape as the full-corpus vec_id < K).
    // Assignment consumers (kmeansTrain, IVF cells) still cover everything.
    val train = if (mod == 1) vecs else vecs.filter(col("vec_id") % mod === 0)
    val cent0 = train.filter(col("vec_id") < K.toLong * mod)
      .select(col("vec_id").as("cid"), col("se").as("cemb"))
    val dims = train.select(col("vec_id"), posexplode(col("se")).as(Seq("pos", "v")))
    // each round: assign (argmin over current centroids), then update —
    // exact integer sums per (cluster, dim), re-rounded to the grid;
    // empty clusters keep their previous centroid (left join + coalesce)
    (1 until Iters).foldLeft(cent0) { (cent, _) =>
      val a = assign(train, cent).select(col("vec_id"), col("m.cid").as("cluster"))
      val cNew = a.join(dims, "vec_id")
        .groupBy(col("cluster"), col("pos"))
        .agg(round(sum(col("v")).cast("double") / count(lit(1))).cast("bigint").as("nv"))
        .groupBy(col("cluster").as("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, nv))), x -> x.nv)").as("cemb1"))
      cent.join(cNew, Seq("cid"), "left_outer")
        .select(col("cid"), coalesce(col("cemb1"), col("cemb")).as("cemb"))
    }
  }

  /** Argmin cell + exact integer distance for every vector of an
    * (vec_id, embedding) relation — the shared "train the quantizer, then
    * assign everything once" artifact: the cell blocks pair generation
    * (`dedup_semantic`), the exact d2 is the prototypicality signal
    * (SemDeDup's keep rule, `prototype_prune`'s difficulty rank). One
    * broadcast corpus scan with map-side-combined argmin.
    */
  private[graft] def assignedCellsOf(embs: DataFrame): DataFrame = {
    val sv = Intermediates.persist(scaledEmbOf(embs))
    val cents = Intermediates.persist(trainedCentroidsOf(sv))
    sv.crossJoin(broadcast(cents))
      .withColumn("d2", expr("graft_l2sq(se, cemb)"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"), col("m.d2").as("d2"))
  }

  /** Oracle CTE for [[assignedCellsOf]] over [[kmeansCtesSql]]'s `d2t` —
    * shared by every assigned-cell consumer so the assignment convention
    * (ties to lower cid) can't drift between oracles.
    */
  private[operators] val assignedCteSql: String =
    """assigned AS (
      |  SELECT vec_id, cid AS cell, d2 FROM (
      |    SELECT vec_id, cid, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |    FROM d2t) WHERE rn = 1
      |)""".stripMargin

  /** `kmeans_train`: [[Iters]] exact Lloyd assignment rounds, k = [[K]],
    * initialized from the K lowest vec_ids (deterministic seeding). Returns
    * the final assignment (vec_id, cluster, d2).
    */
  def kmeansTrain(spark: SparkSession, dir: String): DataFrame =
    assign(scaledEmb(spark, dir), trainedCentroids(spark, dir))
      .select(col("vec_id"), col("m.cid").as("cluster"), col("m.d2").as("d2"))
      .contractOrderBy("vec_id")

  /** Shared oracle CTE body, generated for the conf'd [[K]]/[[Iters]]:
    * embeddings → [[Iters]]−1 assign/update rounds → trained centroids
    * (`cent{Iters-1}`) → `d2t` = exact distance of every vector to every
    * trained centroid. Reused verbatim by `kmeans_train` and
    * `ann_topk_ivf2`, so the two oracles can never disagree about the
    * quantizer.
    */
  private[operators] def kmeansCtesSql: String = {
    val mod = TrainSampleMod
    // mod == 1 emits exactly the historical full-corpus text (no no-op
    // `% 1 = 0` CTEs cluttering the default artifacts); mod > 1 adds a
    // train-sample CTE that the Lloyd rounds read, while the footer's
    // full-corpus d2t (assignment) always reads `ev`
    val (evTrain, base) =
      if (mod == 1) ("ev",
        s"""scaled AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS se
           |  FROM embeddings
           |), ev AS (
           |  SELECT vec_id, unnest(se) AS v, unnest(generate_series(1, len(se))) AS pos FROM scaled
           |), cent0 AS (
           |  SELECT vec_id AS cid, se AS cemb FROM scaled WHERE vec_id < $K
           |)""".stripMargin)
      else ("evt",
        s"""scaled AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS se
           |  FROM embeddings
           |), ev AS (
           |  SELECT vec_id, unnest(se) AS v, unnest(generate_series(1, len(se))) AS pos FROM scaled
           |), evt AS (
           |  SELECT * FROM ev WHERE vec_id % $mod = 0
           |), cent0 AS (
           |  SELECT vec_id AS cid, se AS cemb FROM scaled
           |  WHERE vec_id % $mod = 0 AND vec_id < ${K.toLong * mod}
           |)""".stripMargin)
    val rounds = (1 until Iters).map { r =>
      s"""cv${r - 1} AS (
         |  SELECT cid, unnest(cemb) AS cv, unnest(generate_series(1, len(cemb))) AS pos FROM cent${r - 1}
         |), dd${r - 1} AS (
         |  SELECT vec_id, cid, CAST(sum((v - cv) * (v - cv)) AS BIGINT) AS d2
         |  FROM $evTrain JOIN cv${r - 1} USING (pos) GROUP BY vec_id, cid
         |), a$r AS (
         |  SELECT vec_id, cid AS cluster FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM dd${r - 1}) WHERE rn = 1
         |), upd$r AS (
         |  SELECT cluster, pos,
         |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS nv
         |  FROM a$r JOIN $evTrain USING (vec_id) GROUP BY cluster, pos
         |), cl$r AS (
         |  SELECT cluster AS cid, list(nv ORDER BY pos) AS cemb1 FROM upd$r GROUP BY cluster
         |), cent$r AS (
         |  SELECT c0.cid, coalesce(c1.cemb1, c0.cemb) AS cemb
         |  FROM cent${r - 1} c0 LEFT JOIN cl$r c1 ON c0.cid = c1.cid
         |)""".stripMargin
    }
    val footer =
      s"""cvf AS (
         |  SELECT cid, unnest(cemb) AS cv, unnest(generate_series(1, len(cemb))) AS pos FROM cent${Iters - 1}
         |), d2t AS (
         |  SELECT vec_id, cid, CAST(sum((v - cv) * (v - cv)) AS BIGINT) AS d2
         |  FROM ev JOIN cvf USING (pos) GROUP BY vec_id, cid
         |)""".stripMargin
    (base +: rounds :+ footer).mkString(",\n")
  }

  def kmeansTrainSql: String =
    s"""WITH $kmeansCtesSql
       |SELECT vec_id, cid AS cluster, d2 FROM (
       |  SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM d2t) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin

  /** `cluster_topics` (r10): corpus CARTOGRAPHY — the top TF-IDF terms of
    * each kmeans cell, where the "documents" of the TF-IDF are the CELLS
    * (tf = term occurrences across the cell's docs, idf = ln(cells /
    * cells-containing-term)). This is how an embedding-space map gets
    * LABELED: SemDeDup/prototype-prune/IVF all operate on anonymous cell
    * ids, and this query names them ("cell 7 is the SQL-keyword mass"),
    * turning cluster dashboards, drift reads, and domain-mix decisions
    * into something a human can act on (the Nomic-Atlas / topic-model
    * read over the SAME trained cells the ANN and dedup paths use —
    * shared [[assignedCellsOf]] seam, so the map describes exactly the
    * geometry the other operators act on; vec_id ≡ doc_id links text).
    *
    * Determinism: idf frozen once as round(ln, 6) DECIMAL (the
    * `tfidf_topk` discipline), rank ties to the lexicographically first
    * word, n = count of non-empty cells (not K: an empty cell
    * contributes no documents, so it isn't part of the collection).
    *
    * Scale: assignment is the one broadcast corpus scan; tf is a
    * (cell, word)-grain map-side-combined count (≤ cells × vocab rows,
    * vocab Heaps-bounded); idf a vocab-grain rollup + broadcast scalar;
    * the top-k window partitions by CELL over the cell-grain tf table —
    * K partitions of ≤ vocab rows, never a corpus-grain sort.
    */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame =
    clusterTopicsOf(Tables.documents(spark, dir), Tables.embeddings(spark, dir))

  /** Core over any (doc_id, text) + (vec_id, embedding) pair of relations
    * — specs plant separated clusters with disjoint vocabularies.
    */
  def clusterTopicsOf(docs: DataFrame, embs: DataFrame): DataFrame = {
    val cells = assignedCellsOf(embs)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val tok = docs.join(cells, "doc_id")
      .select(col("cell"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = tok.groupBy(col("cell"), col("word")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = tf.select(col("cell")).distinct().agg(count(lit(1)).as("n"))
    val idf = dfr.crossJoin(broadcast(n))
      .select(col("word"),
        round(log(col("n").cast("double") / col("df").cast("double")), 6)
          .cast("decimal(18,6)").as("idf"))
    tf.join(idf, Seq("word"))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number()
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
          .orderBy(col("score").desc, col("word"))).cast("long"))
      .filter(col("rank") <= GraftConf.tfidfTopK)
      .select(col("cell"), col("rank"), col("word"), col("tf"),
        round(col("score").cast("double"), 4).as("score"))
      .contractOrderBy("cell", "rank")
  }

  /** `topic_mix_report` (r11): the SOURCE × CELL composition matrix —
    * for every crawl source, how its documents distribute over the
    * trained kmeans cells (doc count + integer basis-point share of the
    * source's embedded docs). [[clusterTopics]] names the cells; this is
    * the read that uses those names per SOURCE: "crawl X is 60% cell 7"
    * is the what's-in-my-crawl dashboard, the between-crawls topic-drift
    * alarm (a source whose cell mix jumps changed what it serves —
    * the embedding-space twin of `script_profile`'s codepoint mix), and
    * the input a `domain_mix_sample` weighting decision actually wants
    * (balance by TOPIC mass, not by source label). Same shared
    * [[assignedCellsOf]] seam as every cell consumer, so the matrix
    * describes exactly the geometry SemDeDup/IVF/prune act on; vec_id ≡
    * doc_id links the source column.
    *
    * Determinism: counts are exact integers; `share_bp` is pure integer
    * division (`n_docs·10000 div src_docs`) — no float ever decides a
    * reported value. Scale: the assignment is the one broadcast corpus
    * scan; the rollup is a (source, cell)-grain map-side-combined count
    * (≤ sources × K rows) + an O(sources) totals join. No windows.
    */
  def topicMixReport(spark: SparkSession, dir: String): DataFrame =
    topicMixReportOf(Tables.documents(spark, dir), Tables.embeddings(spark, dir))

  /** Core over explicit (doc_id, source) + (vec_id, embedding) relations —
    * specs plant separated clusters with known per-source mixes.
    */
  def topicMixReportOf(docs: DataFrame, embs: DataFrame): DataFrame = {
    val cells = assignedCellsOf(embs)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val perCell = docs.select(col("doc_id"), col("source"))
      .join(cells, "doc_id")
      .groupBy(col("source"), col("cell"))
      .agg(count(lit(1)).as("n_docs"))
    val perSrc = perCell.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("src_docs"))
    perCell.join(perSrc, "source")
      .withColumn("share_bp", expr("n_docs * 10000 div src_docs"))
      .select(col("source"), col("cell").cast("long").as("cell"),
        col("n_docs"), col("src_docs"), col("share_bp"))
      .contractOrderBy("source", "cell")
  }

  def topicMixReportSql: String =
    s"""WITH $kmeansCtesSql,
       |$assignedCteSql,
       |tmx AS (
       |  SELECT d.source, a.cell, count(*) AS n_docs
       |  FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
       |  GROUP BY d.source, a.cell
       |), tms AS (
       |  SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs FROM tmx GROUP BY source
       |)
       |SELECT x.source, CAST(x.cell AS BIGINT) AS cell,
       |  CAST(x.n_docs AS BIGINT) AS n_docs, s.src_docs,
       |  CAST(x.n_docs * 10000 // s.src_docs AS BIGINT) AS share_bp
       |FROM tmx x JOIN tms s ON x.source = s.source
       |ORDER BY x.source, x.cell""".stripMargin

  /** `embedding_outliers` (r10): per-CELL robust outlier audit over the
    * embedding space — a vector whose distance-to-own-centroid deviates
    * > 3× MAD from its cell's median d2 is flagged (garbage vectors,
    * encoder faults, corrupted rows — the things you want OUT before
    * they become somebody's nearest neighbor in the ANN index or a
    * phantom "semantic dup"). The per-cell framing matters: a tight
    * cell's noise floor would read as clean under one global threshold,
    * and a diffuse cell's healthy spread would all flag.
    *
    * Discipline: exactly [[Events.eventsAnomalyMad]]'s integer
    * median/MAD form — med2 = 2·median, mad4 = 2·median(|2·d2 − med2|),
    * flag `2·|2·d2 − med2| > 3·mad4`; every quantity stays a BIGINT
    * (the ×2 absorbs percentile's midpoint interpolation; d2 ≤ ~6e13 so
    * 2·interp is exact in double before the cast). Baselines come from
    * the `vec_id % ppl.sampleMod` SAMPLE (the `ccnet_filter` /
    * `perplexity_buckets` knob), so the exact `percentile` agg holds
    * sample-sized — never corpus-sized — per-cell state; the corpus is
    * then flagged map-side through the O(cells) broadcast baseline. A
    * cell with no sampled member gets null baselines and flags nothing
    * (conservative; production sizes the mod so every cell samples).
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    embeddingOutliersOf(Tables.embeddings(spark, dir))

  /** Core over any (vec_id, embedding) relation — specs plant a far
    * outlier inside an otherwise tight cell.
    */
  def embeddingOutliersOf(embs: DataFrame): DataFrame = {
    val assigned = Intermediates.persist(assignedCellsOf(embs))
    val smp = assigned.filter(col("vec_id") % GraftConf.pplSampleMod === 0)
    val med = smp.groupBy(col("cell"))
      .agg(expr("CAST(2 * percentile(d2, 0.5) AS BIGINT)").as("med2"))
    val mad = smp.join(broadcast(med), "cell")
      .withColumn("dd", abs(lit(2L) * col("d2") - col("med2")))
      .groupBy(col("cell"))
      .agg(max(col("med2")).as("med2"),
        expr("CAST(2 * percentile(dd, 0.5) AS BIGINT)").as("mad4"))
    assigned.join(broadcast(mad), Seq("cell"), "left")
      .select(col("vec_id"), col("cell"), col("d2"), col("med2"), col("mad4"),
        coalesce(lit(2L) * abs(lit(2L) * col("d2") - col("med2")) >
          lit(3L) * col("mad4"), lit(false)).as("outlier"))
      .contractOrderBy("vec_id")
  }

  def embeddingOutliersSql: String =
    s"""WITH $kmeansCtesSql,
       |$assignedCteSql,
       |osmp AS (
       |  SELECT cell, d2 FROM assigned WHERE vec_id % ${GraftConf.pplSampleMod} = 0
       |), omed AS (
       |  SELECT cell, CAST(2 * median(d2) AS BIGINT) AS med2 FROM osmp GROUP BY cell
       |), omad AS (
       |  SELECT s.cell, max(m.med2) AS med2,
       |    CAST(2 * median(abs(2 * s.d2 - m.med2)) AS BIGINT) AS mad4
       |  FROM osmp s JOIN omed m ON s.cell = m.cell GROUP BY s.cell
       |)
       |SELECT a.vec_id, a.cell, a.d2, o.med2, o.mad4,
       |  COALESCE(2 * abs(2 * a.d2 - o.med2) > 3 * o.mad4, FALSE) AS outlier
       |FROM assigned a LEFT JOIN omad o ON a.cell = o.cell
       |ORDER BY a.vec_id""".stripMargin

  def clusterTopicsSql: String =
    s"""WITH $kmeansCtesSql,
       |$assignedCteSql,
       |ctok AS (
       |  SELECT a.cell, unnest(string_split(d.text, ' ')) AS word
       |  FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
       |), ctf AS (
       |  SELECT cell, word, count(*) AS tf FROM ctok WHERE word <> '' GROUP BY cell, word
       |), cdf AS (
       |  SELECT word, count(*) AS df FROM ctf GROUP BY word
       |), cn AS (
       |  SELECT count(DISTINCT cell) AS n FROM ctf
       |), cidf AS (
       |  SELECT word,
       |    CAST(round(ln(CAST((SELECT n FROM cn) AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS DECIMAL(18,6)) AS idf
       |  FROM cdf
       |), cranked AS (
       |  SELECT ctf.cell, ctf.word, ctf.tf, ctf.tf * cidf.idf AS score,
       |    row_number() OVER (PARTITION BY ctf.cell ORDER BY ctf.tf * cidf.idf DESC, ctf.word) AS rank
       |  FROM ctf JOIN cidf USING (word)
       |)
       |SELECT cell, CAST(rank AS BIGINT) AS rank, word, CAST(tf AS BIGINT) AS tf,
       |  round(CAST(score AS DOUBLE), 4) AS score
       |FROM cranked WHERE rank <= ${GraftConf.tfidfTopK}
       |ORDER BY cell, rank""".stripMargin

  // ---- product-quantization codebooks (subspace Lloyd) ---------------------

  /** PQ geometry/training knobs (`spark.graft.ann.pq*`). */
  def PqSubs: Int = GraftConf.annPqSubs
  def PqK: Int = GraftConf.annPqK
  def PqIters: Int = GraftConf.annPqIters

  /** (vec_id, sub, spos, v) rows: the scaled embedding cut into [[PqSubs]]
    * contiguous subspaces. `sub = min(M−1, pos0 div subdim)` with
    * `subdim = dims div M` — any remainder dims ride the last subspace, so
    * the cut is total for every dims/M combination.
    */
  private[operators] def pqSubRowsOf(vecs: DataFrame): DataFrame = {
    val m = PqSubs
    vecs.withColumn("subdim", expr(s"greatest(size(se) div $m, 1)"))
      .select(col("vec_id"), col("subdim"),
        posexplode(col("se")).as(Seq("pos0", "v")))
      .withColumn("sub", least(lit(m - 1), expr("pos0 div subdim")))
      .withColumn("spos", col("pos0") - col("sub") * col("subdim"))
      .select("vec_id", "sub", "spos", "v")
  }

  /** Per-subspace codebooks after the [[PqIters]] Lloyd rounds:
    * (sub, cid, spos, cv) rows on the exact integer grid — the same
    * determinism contract as [[trainedCentroidsOf]] (integer distances,
    * argmin ties to lower cid, round-half-up integer centroid updates,
    * empty clusters keep their previous centroid), run once per subspace
    * in ONE relational chain keyed by `sub`. Trains on the
    * [[TrainSampleMod]] id-grid sample; seeds are each subspace's slice of
    * the sample's [[PqK]] lowest vec_ids. M·K·subdim rows total — tiny,
    * always broadcast.
    */
  private[graft] def pqCodebooksOf(vecs: DataFrame): DataFrame = {
    val mod = TrainSampleMod
    val train = if (mod == 1) vecs else vecs.filter(col("vec_id") % mod === 0)
    val sv = Intermediates.persist(pqSubRowsOf(train))
    val cent0 = sv.filter(col("vec_id") < PqK.toLong * mod)
      .select(col("sub"), col("vec_id").as("cid"), col("spos"), col("v").as("cv"))
    (1 until PqIters).foldLeft(cent0) { (cent, _) =>
      val d2 = sv.join(cent, Seq("sub", "spos"))
        .groupBy(col("vec_id"), col("sub"), col("cid"))
        .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("d2"))
      val a = d2.groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.cid").as("cluster"))
      val upd = a.join(sv, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("cluster"), col("spos"))
        .agg(round(sum(col("v")).cast("double") / count(lit(1)))
          .cast("bigint").as("nv"))
        .select(col("sub").as("usub"), col("cluster").as("ucid"),
          col("spos").as("uspos"), col("nv"))
      cent.join(upd, col("sub") === col("usub") && col("cid") === col("ucid") &&
          col("spos") === col("uspos"), "left_outer")
        .select(col("sub"), col("cid"), col("spos"),
          coalesce(col("nv"), col("cv")).as("cv"))
    }
  }

  /** Codebook rows assembled to (sub, cid, cidx, cemb): the sub-vector
    * array per centroid plus a DENSE per-subspace index (`cidx` =
    * rank of cid within its subspace) so ADC distance tables can be flat
    * arrays instead of cid-keyed maps.
    */
  private[graft] def pqCodebookArrays(cbRows: DataFrame): DataFrame =
    cbRows.groupBy(col("sub"), col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(spos, cv))), x -> x.cv)")
        .as("cemb"))
      .withColumn("cidx", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sub"))
          .orderBy(col("cid"))).cast("long") - 1L)

  /** The pq-prefixed oracle CTE chain: scaled embeddings → subspace rows →
    * [[PqIters]]−1 per-subspace Lloyd rounds → final codebooks (`pqcb`) —
    * the PQ analog of [[kmeansCtesSql]], reused by `ann_topk_pq`'s oracle.
    */
  private[operators] def pqCtesSql: String =
    pqTrainCtesFrom(
      s"""pqscaled AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS se
         |  FROM embeddings
         |)""".stripMargin, "pqscaled")

  /** [[pqCtesSql]] with the training source abstracted: `prelude` defines
    * any CTE exposing (vec_id, se) as `rel` — the residual IVFADC oracle
    * feeds per-vector cell residuals through the identical Lloyd chain.
    */
  private[operators] def pqTrainCtesFrom(prelude: String, rel: String): String = {
    val m = PqSubs
    val mod = TrainSampleMod
    val trainPred = if (mod == 1) "TRUE" else s"vec_id % $mod = 0"
    val base =
      s"""$prelude, pqsv AS (
         |  SELECT vec_id,
         |    least($m - 1, (pos - 1) // subdim) AS sub,
         |    (pos - 1) - least($m - 1, (pos - 1) // subdim) * subdim AS spos,
         |    v
         |  FROM (
         |    SELECT vec_id, greatest(len(se) // $m, 1) AS subdim,
         |      unnest(se) AS v, unnest(generate_series(1, len(se))) AS pos
         |    FROM $rel)
         |), pqsvt AS (
         |  SELECT * FROM pqsv WHERE $trainPred
         |), pqc0 AS (
         |  SELECT sub, vec_id AS cid, spos, v AS cv FROM pqsvt
         |  WHERE vec_id < ${PqK.toLong * mod}
         |)""".stripMargin
    val rounds = (1 until PqIters).map { r =>
      s"""pqdd${r - 1} AS (
         |  SELECT vec_id, sub, cid, CAST(sum((v - cv) * (v - cv)) AS BIGINT) AS d2
         |  FROM pqsvt JOIN pqc${r - 1} USING (sub, spos) GROUP BY vec_id, sub, cid
         |), pqa$r AS (
         |  SELECT vec_id, sub, cid AS cluster FROM (
         |    SELECT vec_id, sub, cid,
         |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
         |    FROM pqdd${r - 1}) WHERE rn = 1
         |), pqu$r AS (
         |  SELECT sub, cluster, spos,
         |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS nv
         |  FROM pqa$r JOIN pqsvt USING (vec_id, sub) GROUP BY sub, cluster, spos
         |), pqc$r AS (
         |  SELECT c.sub, c.cid, c.spos, coalesce(u.nv, c.cv) AS cv
         |  FROM pqc${r - 1} c LEFT JOIN pqu$r u
         |    ON c.sub = u.sub AND c.cid = u.cluster AND c.spos = u.spos
         |)""".stripMargin
    }
    val footer = s"""pqcb AS (SELECT sub, cid, spos, cv FROM pqc${PqIters - 1})"""
    (base +: rounds :+ footer).mkString(",\n")
  }
}
