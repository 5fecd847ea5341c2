package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Unigram-LM subword segmentation (Kudo 2018 — SentencePiece's OTHER
  * algorithm, next to the [[Bpe]] family): score a word's segmentations by
  * the sum of independent piece log-probabilities and keep the Viterbi
  * argmax. BPE composes greedy merges; the unigram model segments
  * OPTIMALLY under an explicit probabilistic inventory, which is why
  * SentencePiece defaults to it — and why a data engine wants both: the
  * two tokenizers price the same corpus differently, and `bpe_fertility` /
  * `unigram_segment` side by side is how that choice gets made.
  *
  * Deterministic scope: the piece inventory is the SEED model (Kudo §3.2's
  * starting point — all substrings up to [[GraftConf.unigramMaxPiece]]
  * chars, weighted by corpus word counts, pruned to the
  * [[GraftConf.unigramSeedK]] heaviest multi-char pieces; single chars
  * always survive so every word stays segmentable), with piece
  * log-probabilities frozen once as `round(ln(cnt/total), 6)`
  * DECIMAL(18,6) — the §5 discipline, so Viterbi comparisons are exact
  * decimal adds both engines agree on bit-for-bit. The EM re-estimation
  * loop on top of the seed model is the non-deterministic-float part of
  * Kudo's trainer and is deliberately out; the seed model is exactly what
  * the paper initializes EM from, and the Viterbi DP here is byte-for-byte
  * the INFERENCE path a trained unigram tokenizer runs forever.
  *
  * Spark-first scale shape (the [[Bpe]] argument): ONE corpus scan builds
  * the weighted distinct-word table; everything after — substring
  * counting, inventory pruning, the DP — runs at VOCABULARY grain,
  * independent of corpus rows. The Viterbi unroll is
  * 2·[[GraftConf.unigramMaxWordLen]] vocab-grain join+agg stages (a
  * PLAN-SIZE knob, not data truncation — words past the bound are
  * excluded, loudly visible in the output row count; production sizes it
  * to its corpus's ceiling). Ties break to the LONGEST last piece at each
  * position — a fixed rule both engines implement as max(j) among
  * exact-decimal score equals, never an unspecified argmax.
  *
  * Reference anchor: the reference counts whitespace tokens
  * (utils/validation.py length checks); this learns subword pricing, the
  * denomination real token budgets use.
  */
object Unigram {

  private def P: Int = GraftConf.unigramMaxPiece
  private def K: Int = GraftConf.unigramSeedK
  private def L: Int = GraftConf.unigramMaxWordLen

  /** Weighted distinct words within the DP's length bound (shared with
    * [[WordPiece]] — both tokenizers price the same vocabulary).
    */
  private[graft] def vocabOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= L)
      .groupBy("word").agg(count(lit(1)).as("w"))

  /** The frozen seed piece model: (piece, cnt, lp) — all single chars
    * plus the K heaviest multi-char substrings (≤ P chars), lp =
    * round(ln(cnt/total), 6) over the KEPT inventory.
    */
  private[graft] def unigramModelOf(docs: DataFrame): DataFrame = {
    val subs = vocabOf(docs).select(col("w"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), e -> " +
          s"transform(sequence(1, least($P, e)), j -> substring(word, e - j + 1, j))))"))
        .as("piece"))
      .groupBy("piece").agg(sum(col("w")).as("cnt"))
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(desc("cnt"), asc("piece")).limit(K)
    val kept = subs.filter(length(col("piece")) === 1).unionByName(multi)
    val total = kept.agg(sum(col("cnt")).as("total"))
    kept.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("total").cast("double")), 6)
          .cast("decimal(18,6)").as("lp"))
  }

  /** `unigram_segment`: per distinct corpus word, the Viterbi-optimal
    * segmentation under the seed model — (word, corpus count, n_chars,
    * n_pieces, `|`-joined pieces, 4-dp score).
    */
  def unigramSegment(spark: SparkSession, dir: String): DataFrame =
    unigramSegmentOf(Tables.documents(spark, dir))

  def unigramSegmentOf(docs: DataFrame): DataFrame =
    segmentWithModel(docs, unigramModelOf(docs))

  /** The vocabulary's Viterbi segmentation table routed through the
    * bench-session artifact cache when `spark.graft.bench.artifactDir`
    * is set — "train once, segment once per corpus snapshot, PRICE
    * many": the pricing rows (`unigram_fertility`, `tokenizer_compare`)
    * read the stored vocab-grain table the way production prices slices
    * against a deployed SentencePiece vocabulary, while
    * `unigram_segment` itself stays the in-query derivation (that row
    * IS the DP being measured). The unigram conf fingerprint rides in
    * the artifact NAME — the shared cache path's dedup-knob salt does
    * not cover these knobs, and a knob change must rebuild, never serve
    * a stale inventory. Plan-only: Verify never sets the conf; parity
    * is spec-asserted (DedupMembershipApplySpec).
    */
  private[graft] def storedSegmentTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.storedIndex(spark,
      // sanitizing can collide distinct knob-sets (1.2/12 vs 12/·) — append
      // a hash of the RAW fingerprint, the benchArtifact dir-salt discipline
      "uniseg-" + unigramFingerprint.replaceAll("[^A-Za-z0-9]", "") +
        "-" + Dedup.md5Hex(unigramFingerprint).take(8), dir)(
      unigramSegmentOf(Tables.documents(spark, dir)))

  /** The DP over an EXPLICIT (piece, lp) model — the seam
    * [[unigramSegmentFrom]]'s stored artifact feeds, so the stored path
    * is the same arithmetic by construction.
    */
  private[graft] def segmentWithModel(docs: DataFrame, modelIn: DataFrame): DataFrame = {
    // Single-pass Viterbi (r18). The frame-level DP this replaces unrolled
    // one join+agg+localCheckpoint Spark job per word POSITION (2·maxLen
    // jobs of fixed scheduling cost — the dominant wall-clock term at any
    // corpus size, since every level is vocab-grain tiny), plus a
    // candidate-table explode and a backtrace join chain. The piece model
    // is K+alphabet rows by construction (seedK heaviest multi-char pieces
    // + single chars — a BOUNDED artifact, the thing a deployment ships),
    // so it broadcasts, and the whole DP for one word is a local O(L·P)
    // loop at vocabulary grain: one job, no shuffles beyond vocabOf's own
    // aggregation.
    //
    // Exactness is preserved arithmetic-by-arithmetic: lp is DECIMAL(18,6)
    // — carried here as its unscaled long (micro-nats), so score adds are
    // the same exact integer adds; the tie rule (best exact score, ties to
    // the LONGEST last piece) is the same lexicographic (score, j) max;
    // positions are CODE POINTS (Spark's length/substring semantics, not
    // UTF-16 units); the final score is decimal(18,6) → double → round
    // HALF_UP 4, reproduced via the same java.math.BigDecimal calls
    // Spark's Cast and Round use. A word with an unreachable final
    // position (a char outside a STORED model's alphabet) drops from the
    // output, exactly as the old final inner join dropped it.
    val spark = docs.sparkSession
    import spark.implicits._
    val vw = vocabOf(docs)
    val p = P
    val pieces = modelIn.select(col("piece"), col("lp")).collect()
    // boxed values: j.u.HashMap[String, scala.Long] would unbox a missing
    // key's null to 0L and silently score unknown pieces as certainty
    val modelMap = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { r =>
      modelMap.put(r.getString(0),
        r.getDecimal(1).setScale(6).unscaledValue().longValueExact())
    }
    val bc = spark.sparkContext.broadcast(modelMap)
    vw.select(col("word"), col("w")).as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (word, w) =>
          // code-point view: Spark length()/substring() count code points
          val cp = word.codePoints().toArray
          val n = cp.length
          val score = new Array[Long](n + 1)
          val bj = new Array[Int](n + 1)
          val reach = new Array[Boolean](n + 1)
          reach(0) = true
          var e = 1
          while (e <= n) {
            var bestS = 0L; var bestJ = 0; var found = false
            var j = 1
            val jMax = math.min(p, e)
            while (j <= jMax) {
              if (reach(e - j)) {
                val lp = m.get(new String(cp, e - j, j))
                if (lp != null) {
                  val cand = score(e - j) + lp.longValue()
                  // max(struct(sc, j)): higher score wins, ties to longer j
                  if (!found || cand > bestS || (cand == bestS && j > bestJ)) {
                    bestS = cand; bestJ = j; found = true
                  }
                }
              }
              j += 1
            }
            if (found) { reach(e) = true; score(e) = bestS; bj(e) = bestJ }
            e += 1
          }
          if (!reach(n)) Iterator.empty
          else {
            // backtrace: pieces joined '|' in word order; np is the DP's
            // own step count (never re-derived by splitting the path)
            val parts = scala.collection.mutable.ArrayBuffer.empty[String]
            var pos = n
            while (pos > 0) { parts += new String(cp, pos - bj(pos), bj(pos)); pos -= bj(pos) }
            val path = parts.reverseIterator.mkString("|")
            // decimal(18,6) → double → round(_, 4): the same BigDecimal
            // calls Spark's Cast(DecimalType → double) and Round execute
            val dbl = new java.math.BigDecimal(
              java.math.BigInteger.valueOf(score(n)), 6).doubleValue()
            val rounded = java.math.BigDecimal.valueOf(dbl)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            Iterator((word, w, n.toLong, parts.length.toLong, path, rounded))
          }
        }
      }
      .toDF("word", "w", "n_chars", "n_pieces", "segmentation", "score")
      .contractOrderBy("word")
  }

  // ------------------------------------------------------------------
  // Stored tokenizer artifact — "train once, segment many" (the
  // Bpe.writeMerges / NbIndex discipline): the seed piece model persists
  // to parquet, conf-stamped, and the segment path runs the identical DP
  // from the stored inventory without re-deriving it. At 100 TB the
  // model trains once per corpus snapshot; every downstream pricing pass
  // reads the artifact.
  // ------------------------------------------------------------------

  private val MetaKey = "graft.unigram"

  /** Every knob that changes the stored bytes. */
  def unigramFingerprint: String =
    s"maxPiece=$P;seedK=$K;maxWordLen=$L"

  /** Train the seed model on the corpus at `dir` and persist it. */
  def writeModel(spark: SparkSession, dir: String, path: String): Unit = {
    val m = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(MetaKey, unigramFingerprint).build()
    unigramModelOf(Tables.documents(spark, dir))
      .withColumn("piece", col("piece").as("piece", m))
      .write.mode("overwrite").parquet(path)
    Dedup.releaseIntermediates()
  }

  /** Segment any (doc_id, text) corpus's vocabulary from the STORED
    * model — fails FAST on conf drift or a missing stamp (a model pruned
    * at one seedK segmented under another inventory silently answers a
    * different question). Bit-equal to [[unigramSegmentOf]] when the
    * store was trained on the same corpus+conf (spec-asserted).
    */
  def unigramSegmentFrom(spark: SparkSession, path: String, docs: DataFrame): DataFrame =
    segmentWithModel(docs, loadModel(spark, path))

  /** Load + stamp-validate the stored piece model — the shared seam for
    * every consumer of the artifact ([[unigramSegmentFrom]] and
    * [[WordPiece.wordpieceSegmentFrom]]: one trained inventory serves
    * both inference rules, which is exactly how SentencePiece models are
    * deployed).
    */
  private[graft] def loadModel(spark: SparkSession, path: String): DataFrame = {
    val stored = spark.read.parquet(path)
    stored.schema.fields.find(_.name == "piece")
      .filter(_.metadata.contains(MetaKey))
      .map(_.metadata.getString(MetaKey)) match {
      case None => throw new IllegalStateException(
        s"stored unigram model at $path carries no $MetaKey conf stamp — not a " +
          "graft-written artifact; refusing to segment against it blind")
      case Some(fp) if fp != unigramFingerprint => throw new IllegalStateException(
        s"stored unigram model at $path was trained with [$fp] but the live conf is " +
          s"[$unigramFingerprint]; segmentations would silently differ — retrain or align")
      case _ => ()
    }
    stored.select(col("piece"), col("lp"))
  }

  /** Oracle: the identical seed model + the DP UNROLLED as a generated
    * CTE chain, one (candidates, max, argmax, union) block per position
    * and one backtrace CTE per step — the [[Clustering.kmeansCtesSql]] /
    * BPE-unroll discipline: loops in the engine become generated SQL, so
    * the two implementations stay independent formulations of the same
    * fixed-point.
    */
  def unigramSegmentSql: String =
    "WITH " + unigramChainSql + "\n" +
      s"""SELECT v.word, v.w, CAST(len(v.word) AS BIGINT) AS n_chars,
         |  t.np AS n_pieces,
         |  t.path AS segmentation,
         |  round(CAST(b.score AS DOUBLE), 4) AS score
         |FROM uvw v
         |JOIN ut$L t ON t.word = v.word
         |JOIN ubb$L b ON b.word = v.word AND b.pos = len(v.word)
         |ORDER BY v.word""".stripMargin

  /** The shared model + unrolled-DP + backtrace CTE body (callers prepend
    * `WITH ` and append their SELECT) — one string for every unigram
    * consumer, the `minhashVerifiedCtes` discipline.
    */
  /** The seed-model CTEs alone (uvw/usub/ukept/utot/upc) — shared with
    * [[WordPiece]]'s oracle so both tokenizers provably price the same
    * frozen inventory.
    */
  private[graft] def modelCoreSql: String = modelCoreSqlFor("u", "")

  /** The model CTEs with a caller-chosen CTE-name prefix and an optional
    * training-doc predicate — `("u", "")` reproduces the historical
    * chain byte-for-byte; the drift report trains a SECOND model on the
    * base carve under prefix `"s"`.
    */
  private[graft] def modelCoreSqlFor(q: String, docWhere: String): String =
    s"""${q}vw AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents$docWhere
       |  ) WHERE word <> '' AND len(word) <= $L GROUP BY word
       |), ${q}sub AS MATERIALIZED (
       |  SELECT piece, CAST(sum(w) AS BIGINT) AS cnt FROM (
       |    SELECT v.word, v.w, substr(v.word, e.e - j.j + 1, j.j) AS piece
       |    FROM ${q}vw v
       |    CROSS JOIN (SELECT unnest(generate_series(1, $L)) AS e) e
       |    CROSS JOIN (SELECT unnest(generate_series(1, $P)) AS j) j
       |    WHERE e.e <= len(v.word) AND j.j <= least($P, e.e)
       |  ) GROUP BY piece
       |), ${q}kept AS MATERIALIZED (
       |  SELECT piece, cnt FROM ${q}sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM ${q}sub WHERE len(piece) >= 2
       |  ) WHERE rn <= $K
       |), ${q}tot AS MATERIALIZED (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ${q}kept
       |), ${q}pc AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(round(ln(CAST(cnt AS DOUBLE) / (SELECT CAST(total AS DOUBLE) FROM ${q}tot)), 6) AS DECIMAL(18,6)) AS lp
       |  FROM ${q}kept
       |)""".stripMargin

  /** The DP's candidate table + level-0 row, end-position keyed. */
  private def segBlocksSqlFor(q: String): String =
    s"""${q}segs AS MATERIALIZED (
       |  SELECT v.word, e.e, j.j, p.lp
       |  FROM ${q}vw v
       |  CROSS JOIN (SELECT unnest(generate_series(1, $L)) AS e) e
       |  CROSS JOIN (SELECT unnest(generate_series(1, $P)) AS j) j
       |  JOIN ${q}pc p ON p.piece = substr(v.word, e.e - j.j + 1, j.j)
       |  WHERE e.e <= len(v.word) AND j.j <= least($P, e.e)
       |), ${q}bb0 AS MATERIALIZED (
       |  SELECT word, 0 AS pos, CAST(0 AS DECIMAL(18,6)) AS score, 0 AS bj FROM ${q}vw
       |)""".stripMargin

  private[graft] def unigramChainSql: String = unigramChainSqlFor("u", "")

  private[graft] def unigramChainSqlFor(q: String, docWhere: String): String = {
    val model = modelCoreSqlFor(q, docWhere) + ",\n" + segBlocksSqlFor(q)
    val fwd = (1 to L).map { i =>
      s"""${q}c$i AS MATERIALIZED (
         |  SELECT s.word, s.j, CAST(b.score + s.lp AS DECIMAL(18,6)) AS sc
         |  FROM ${q}segs s JOIN ${q}bb${i - 1} b ON b.word = s.word AND b.pos = $i - s.j
         |  WHERE s.e = $i
         |), ${q}m$i AS MATERIALIZED (
         |  SELECT word, max(sc) AS score FROM ${q}c$i GROUP BY word
         |), ${q}j$i AS MATERIALIZED (
         |  SELECT c.word, max(c.j) AS bj
         |  FROM ${q}c$i c JOIN ${q}m$i m ON c.word = m.word AND c.sc = m.score
         |  GROUP BY c.word
         |), ${q}bb$i AS MATERIALIZED (
         |  SELECT * FROM ${q}bb${i - 1}
         |  UNION ALL
         |  SELECT m.word, $i AS pos, m.score, j.bj
         |  FROM ${q}m$i m JOIN ${q}j$i j ON m.word = j.word
         |)""".stripMargin
    }.mkString(",\n")
    val bt0 =
      s"""${q}t0 AS MATERIALIZED (
         |  SELECT word, CAST(len(word) AS INTEGER) AS pos, '' AS path,
         |    CAST(0 AS BIGINT) AS np FROM ${q}vw
         |)""".stripMargin
    val bt = (1 to L).map { k =>
      s"""${q}t$k AS MATERIALIZED (
         |  SELECT t.word,
         |    CASE WHEN t.pos > 0 THEN t.pos - b.bj ELSE t.pos END AS pos,
         |    CASE WHEN t.pos > 0
         |      THEN substr(t.word, t.pos - b.bj + 1, b.bj)
         |        || (CASE WHEN t.path = '' THEN '' ELSE '|' END) || t.path
         |      ELSE t.path END AS path,
         |    CASE WHEN t.pos > 0 THEN t.np + 1 ELSE t.np END AS np
         |  FROM ${q}t${k - 1} t JOIN ${q}bb$L b ON b.word = t.word AND b.pos = t.pos
         |)""".stripMargin
    }.mkString(",\n")
    // assembled by concatenation, not an outer stripMargin template: the
    // backtrace CTEs carry line-leading `||` string concats a second
    // stripMargin pass would corrupt into single pipes (the
    // quality_gate_report lesson, caught by the DuckDB binder in-round)
    model + ",\n" + fwd + ",\n" + bt0 + ",\n" + bt
  }

  /** `unigram_fertility`: per-language corpus pricing under the unigram
    * model — whitespace words vs unigram pieces, the direct side-by-side
    * with `bpe_fertility` that the tokenizer-choice read needs (same
    * grouping, same 4-dp ratio convention). One doc-grain word explode
    * joined to the word→n_pieces table the DP already produces (vocab
    * grain — AQE broadcasts it), then an O(languages) rollup.
    */
  def unigramFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wp = storedSegmentTable(spark, dir).select(col("word"), col("n_pieces"))
    val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= L)
    tok.join(wp, Seq("word"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 4))
      .contractOrderBy("lang")
  }

  /** The BASE-carve segmentation table (vocabulary trained and priced on
    * `doc_id % DeltaIdMod != 0` — the deployed inventory a standard
    * crawl arrives against), routed through the bench-session artifact
    * cache like [[storedSegmentTable]]. Same conf-in-name +
    * raw-fingerprint-hash salting.
    */
  private[graft] def storedBaseSegmentTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.storedIndex(spark,
      "unisegbase-" + unigramFingerprint.replaceAll("[^A-Za-z0-9]", "") +
        "-" + Dedup.md5Hex(unigramFingerprint).take(8), dir)(
      unigramSegmentOf(Tables.documents(spark, dir)
        .filter(col("doc_id") % Dedup.DeltaIdMod =!= 0)))

  /** `tokenizer_drift_report` (r16): the vocab store's RETRAIN ALARM —
    * the [[graft.operators.LmIndex]] store has `lm_coverage_report` and
    * the ANN store has `appendRecallReport`; this is the segmentation
    * store's equivalent. Per SOURCE of the standard crawl
    * (`doc_id % DeltaIdMod == 0`), price the crawl's words against the
    * STORED vocabulary (trained on the base carve — what production has
    * deployed) vs a RETRAINED one (full corpus): `coverage_bp` = share
    * of crawl words the stored inventory can price at all (an unseen
    * word has no stored segmentation row), and `drift_bp` = how many
    * extra basis points of pieces-per-word the stored inventory pays
    * over the retrained one ON THE WORDS BOTH PRICE (same-population
    * compare — coverage loss is reported separately, not smuggled into
    * the fertility ratio). A source drifting ≥ τ bp on either axis
    * flags `retrain` ([[GraftConf.unigramDriftTauBp]]) — the signal to
    * pay for a vocabulary rebuild before fertility quietly inflates
    * every downstream token budget.
    *
    * Scale: two vocab-grain segmentation tables (stored artifacts in
    * amortized mode) + one crawl-grain word explode + two word-key
    * joins + an O(sources) rollup — no corpus windows, no driver state.
    * All ratios in pure integer basis points (hash-stable).
    */
  def tokenizerDriftReport(spark: SparkSession, dir: String): DataFrame =
    tokenizerDriftReportFrom(Tables.documents(spark, dir),
      storedBaseSegmentTable(spark, dir), storedSegmentTable(spark, dir))

  /** The report over EXPLICIT (word, n_pieces) segmentation tables — the
    * seam the spec drives with planted drifted/undrifted sources, and
    * the artifact path feeds with the stored tables.
    */
  private[graft] def tokenizerDriftReportFrom(docs: DataFrame,
      storedTbl: DataFrame, fullTbl: DataFrame): DataFrame = {
    val tau = GraftConf.unigramDriftTauBp
    val stored = storedTbl.select(col("word"), col("n_pieces").as("np_s"))
    val full = fullTbl.select(col("word"), col("n_pieces").as("np_f"))
    val tok = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= L)
    tok.join(stored, Seq("word"), "left")
      .join(full, Seq("word"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        count(col("np_s")).as("n_covered"),
        sum(col("np_s")).as("pieces_stored"),
        sum(when(col("np_s").isNotNull, col("np_f"))).as("pieces_current"))
      .withColumn("coverage_bp", expr("n_covered * 10000 div n_words"))
      .withColumn("fert_stored_bp",
        when(col("n_covered") > 0, expr("pieces_stored * 10000 div n_covered")))
      .withColumn("fert_current_bp",
        when(col("n_covered") > 0, expr("pieces_current * 10000 div n_covered")))
      .withColumn("drift_bp",
        coalesce(col("fert_stored_bp") - col("fert_current_bp"), lit(0L)))
      .withColumn("retrain",
        col("drift_bp") >= tau || (lit(10000L) - col("coverage_bp")) >= tau)
      .select("source", "n_words", "n_covered", "coverage_bp",
        "fert_stored_bp", "fert_current_bp", "drift_bp", "retrain")
      .contractOrderBy("source")
  }

  /** Oracle: the SAME chain generator instantiated twice — prefix `u`
    * over the full corpus (byte-identical to every other unigram
    * consumer's chain) and prefix `s` over the base carve.
    */
  def tokenizerDriftReportSql: String = {
    val tau = GraftConf.unigramDriftTauBp
    val mod = Dedup.DeltaIdMod
    "WITH " + unigramChainSql + ",\n" +
      unigramChainSqlFor("s", s" WHERE doc_id % $mod <> 0") + ",\n" +
      s"""duwp AS (SELECT word, np FROM ut$L),
         |dswp AS (SELECT word, np FROM st$L),
         |dctok AS (
         |  SELECT source, word FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE doc_id % $mod = 0
         |  ) WHERE word <> '' AND len(word) <= $L
         |),
         |dg AS (
         |  SELECT c.source,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(count(s.np) AS BIGINT) AS n_covered,
         |    CAST(sum(s.np) AS BIGINT) AS pieces_stored,
         |    CAST(sum(CASE WHEN s.np IS NOT NULL THEN u.np END) AS BIGINT) AS pieces_current
         |  FROM dctok c
         |  LEFT JOIN dswp s ON c.word = s.word
         |  LEFT JOIN duwp u ON c.word = u.word
         |  GROUP BY c.source
         |)
         |SELECT source, n_words, n_covered,
         |  CAST((n_covered * 10000) // n_words AS BIGINT) AS coverage_bp,
         |  CASE WHEN n_covered > 0
         |    THEN CAST((pieces_stored * 10000) // n_covered AS BIGINT) END AS fert_stored_bp,
         |  CASE WHEN n_covered > 0
         |    THEN CAST((pieces_current * 10000) // n_covered AS BIGINT) END AS fert_current_bp,
         |  CAST(coalesce((pieces_stored * 10000) // nullif(n_covered, 0)
         |    - (pieces_current * 10000) // nullif(n_covered, 0), 0) AS BIGINT) AS drift_bp,
         |  (coalesce((pieces_stored * 10000) // nullif(n_covered, 0)
         |      - (pieces_current * 10000) // nullif(n_covered, 0), 0) >= $tau
         |    OR 10000 - ((n_covered * 10000) // n_words) >= $tau) AS retrain
         |FROM dg
         |ORDER BY source""".stripMargin
  }

  def unigramFertilitySql: String =
    "WITH " + unigramChainSql + ",\n" +
      s"""uwp AS MATERIALIZED (
         |  SELECT word, np AS n_pieces FROM ut$L
         |), udtok AS (
         |  SELECT doc_id, lang, word FROM (
         |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
         |  ) WHERE word <> '' AND len(word) <= $L
         |)
         |SELECT d.lang, CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(p.n_pieces) AS DOUBLE) / count(*), 4) AS fertility
         |FROM udtok d JOIN uwp p ON d.word = p.word
         |GROUP BY d.lang
         |ORDER BY d.lang""".stripMargin
}
