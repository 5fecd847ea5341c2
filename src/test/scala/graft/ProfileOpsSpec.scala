package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Events, TextAnalysis}

/** Semantics of the corpus/telemetry PROFILING operators: the unified
  * cluster-size histogram, the median/MAD anomaly flag, serpentine shard
  * balancing, and the Unicode script mix. Each test plants the shape the
  * operator exists to detect (a mega-cluster, a sustained burst, a
  * heavy-tailed length distribution, a non-Latin source) — the shipped
  * synthetic corpus is too benign to exercise any of them.
  */
class ProfileOpsSpec extends SparkSpec {

  // ---- dedup_cluster_stats ------------------------------------------------

  test("dedup_cluster_stats: histogram covers the whole corpus and flags the planted mega-cluster") {
    import spark.implicits._
    // 4 exact copies (one cluster of 4), 2 exact copies (cluster of 2),
    // 3 untouched singletons
    val mk = (i: Long, t: String) => (i, t, "en", "web")
    val docs = Seq(
      mk(1, "aaa bbb ccc"), mk(2, "aaa bbb ccc"), mk(3, "aaa bbb ccc"), mk(4, "aaa bbb ccc"),
      mk(5, "ddd eee fff"), mk(6, "ddd eee fff"),
      mk(7, "unique first document body"), mk(8, "another standalone body"), mk(9, "third lonely body"))
      .toDF("doc_id", "text", "lang", "source")
    // orthogonal embeddings: the semantic lane adds nothing
    val embs = (1L to 9L).map(i =>
      (i, Seq.tabulate(64)(d => if (d == i.toInt) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val hist = Dedup.dedupClusterStatsFrom(docs, embs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hist(4L) == ((1L, 4L)), s"mega-cluster row: $hist")
    assert(hist(2L) == ((1L, 2L)))
    assert(hist(1L) == ((3L, 3L)))
    // n_docs column sums to the corpus
    assert(hist.values.map(_._2).sum == 9L)
    Dedup.releaseIntermediates()
  }

  // ---- events_anomaly_mad -------------------------------------------------

  test("events_anomaly_mad: flags the burst hour a trailing mean would smear, not the steady hours") {
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    // 20 steady hours at 5 events + one 50-event burst hour
    val steady = for {
      h <- 0L until 20L; i <- 0L until 5L
    } yield (h * 100 + i, new java.sql.Timestamp(h * 3600000L), 1L, "click", 1.0, "{}")
    val burst = (0L until 50L).map(i =>
      (9000L + i, new java.sql.Timestamp(20L * 3600000L), 1L, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    (steady ++ burst).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.eventsAnomalyMad(spark, dir).collect()
    assert(out.length == 1, s"exactly the burst hour flags: ${out.mkString(";")}")
    val r = out.head
    assert(r.getAs[String]("event_type") == "click")
    assert(r.getAs[Long]("cnt") == 50L)
    // 20-of-21 buckets at 5 → median 5 (med2=10), MAD 0 (mad4=0): the
    // burst deviates and the steady hours (d2 = 0) never can
    assert(r.getAs[Long]("med2") == 10L && r.getAs[Long]("mad4") == 0L)
    assert(out.head.getAs[Long]("hour_us") == 20L * hourUs)
  }

  // ---- shard_balance ------------------------------------------------------

  test("shard_balance: serpentine beats hash on a heavy-tailed distribution; token mass is conserved") {
    import spark.implicits._
    // heavy tail: a few giants + many small docs (sizes planted so LPT-ish
    // balance is near-perfect and hash sharding is measurably lumpy)
    val sizes = Seq(1000L, 900L, 800L, 700L) ++ Seq.fill(60)(10L)
    val docsTok = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tokens")
    spark.conf.set("spark.graft.pack.balanceShards", "4")
    try {
      val out = Curation.shardBalanceFrom(spark, docsTok).collect()
      assert(out.length == 4)
      val totals = out.map(_.getAs[Long]("total_tokens"))
      assert(totals.sum == sizes.sum, "token mass conserved")
      // serpentine puts exactly one giant per shard: pass 0 deals
      // 1000→s0, 900→s1, 800→s2, 700→s3
      val maxes = out.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("max_doc_tokens")).toMap
      assert(maxes == Map(0L -> 1000L, 1L -> 900L, 2L -> 800L, 3L -> 700L))
      // and the spread is tight: with 64 docs over 4 shards each shard
      // gets 16 docs; imbalance only from the giants' 100-token steps
      assert(totals.max - totals.min <= 300L, s"spread: ${totals.mkString(",")}")
    } finally spark.conf.unset("spark.graft.pack.balanceShards")
  }

  test("shard_balance: rank ties broken by doc_id — equal-size docs land deterministically") {
    import spark.implicits._
    val docsTok = (0L until 8L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
    spark.conf.set("spark.graft.pack.balanceShards", "4")
    try {
      val a = Curation.shardBalanceFrom(spark, docsTok).collect().map(_.toSeq)
      val b = Curation.shardBalanceFrom(spark, docsTok).collect().map(_.toSeq)
      assert(a.sameElements(b))
      assert(a.forall(r => r(1) == 2L && r(2) == 200L))
    } finally spark.conf.unset("spark.graft.pack.balanceShards")
  }

  // ---- similarity_histogram -----------------------------------------------

  test("source_dedup_matrix ≡ the minhash pair list rolled up by unordered source pair") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val expected = pairs.groupBy { case (a, b, _) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }.map { case (k, v) => k -> ((v.length.toLong, v.map(_._3).max)) }
    val out = Dedup.sourceDedupMatrix(spark, sf).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("max_jaccard")))).toMap
    assert(expected.nonEmpty, "corpus must carry near-dup pairs for a non-vacuous matrix")
    assert(out == expected)
    // every cell is unordered-canonical: source_a <= source_b
    assert(out.keys.forall { case (a, b) => a <= b })
  }

  test("similarity_histogram: buckets describe exactly the candidate population the τ filter acts on") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, base + " one", "en", "web"),
      (2L, base + " two", "en", "web"),        // high-Jaccard pair with 1
      (3L, "totally different words everywhere nothing shared with others", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val hist = Dedup.similarityHistogram _
    val dir = java.nio.file.Files.createTempDirectory("graft_simh").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = hist(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    // the 1~2 pair is the only LSH candidate, landing in a top band
    assert(total == 1L, s"rows: ${rows.mkString(";")}")
    assert(rows.head.getAs[Long]("bucket") >= 15L)
    // and the histogram population = the pair query's candidates: the
    // tau-filtered pair count can never exceed the histogram total
    val pairs = Dedup.dedupMinhashLsh(spark, dir).count()
    assert(pairs <= total)
    Dedup.releaseIntermediates()
  }

  test("minhash_recall_report ≡ the truth/detection pair tables rolled up by hand; accounting holds") {
    val rep = graft.operators.Dedup.minhashRecallReport(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_detected"),
          r.getAs[Long]("recall_bp"))).toMap
    Dedup.releaseIntermediates()
    assert(rep.nonEmpty && rep.values.map(_._1).sum > 0,
      "the shipped corpus must carry above-tau truth pairs")
    rep.values.foreach { case (t, d, bp) =>
      assert(d <= t, "detection can never exceed truth")
      assert(bp == d * 10000 / t, "recall_bp is the pure integer formula")
    }
    // hand rollup from the report's own composition: truth candidates =
    // the rare-shingle-join population, gated and bucketed on the
    // FULL-set intersection computed here from the collected shingle
    // sets (r12: the same verify arithmetic detection uses); detection =
    // dedup_minhash_lsh's pair set
    val tau = Dedup.MinHashTau
    val (sets, _) = Dedup.lshCandidatesOf(graft.sources.Tables.documents(spark, sf))
    val hs = sets.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("hs").toSet).toMap
    val candIds = Dedup.shingleJoinPairsOf(sets)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    Dedup.releaseIntermediates()
    val truth = candIds.flatMap { case (a, b) =>
      val inter = (hs(a) & hs(b)).size.toLong
      val uni = hs(a).size.toLong + hs(b).size.toLong - inter
      val jac = BigDecimal(inter.toDouble / uni)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (jac >= tau) Some(((a, b), (inter, uni))) else None
    }
    val det = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    Dedup.releaseIntermediates()
    val expected = truth.groupBy { case (_, (i, u)) => 20 * i / u }
      .map { case (bucket, rows) =>
        bucket -> (rows.length.toLong, rows.count(p => det.contains(p._1)).toLong)
      }
    assert(rep.view.mapValues(v => (v._1, v._2)).toMap == expected,
      s"report $rep vs hand rollup $expected")
  }

  test("topic_mix_report ≡ the cell assignment joined to sources, rolled up by hand; shares account per source") {
    val rep = graft.operators.Clustering.topicMixReport(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("cell")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("src_docs"),
          r.getAs[Long]("share_bp"))).toMap
    Dedup.releaseIntermediates()
    assert(rep.nonEmpty)
    // per-source accounting: cell counts partition the source total; the
    // integer shares obey the floor formula and sum into (10000 - cells,
    // 10000]
    rep.groupBy(_._1._1).foreach { case (src, cells) =>
      val total = cells.values.head._2
      assert(cells.values.map(_._1).sum == total, s"$src cells must partition")
      cells.foreach { case ((_, _), (n, t, bp)) => assert(bp == n * 10000 / t) }
      val bpSum = cells.values.map(_._3).sum
      assert(bpSum <= 10000 && bpSum > 10000 - cells.size,
        s"$src share_bp sum $bpSum out of floor-division range")
    }
    // hand rollup over the same seam the operator composes
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val cellsOf = graft.operators.Clustering.assignedCellsOf(
      graft.sources.Tables.embeddings(spark, sf)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Number]("cell").longValue)
    Dedup.releaseIntermediates()
    val joined = cellsOf.flatMap { case (id, cell) => docs.get(id).map(s => (s, cell)) }
    val expected = joined.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rep.view.mapValues(_._1).toMap == expected)
  }

  // ---- contamination_report -----------------------------------------------

  test("contamination_report: per-source totals agree with the per-doc sweeps it composes") {
    val rep = operators.Curation.contaminationReport(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_exact"),
          r.getAs[Long]("n_fuzzy"), r.getAs[Long]("n_sem"), r.getAs[Long]("n_any"))).toMap
    rep.values.foreach { case (n, ex, fz, sm, any) =>
      assert(any <= n && ex <= any && fz <= any && sm <= any,
        s"ordering: $n $ex $fz $sm $any")
      assert(any <= ex + fz + sm, "union bound")
    }
    // cross-check totals against the composed sweeps under the SAME eval
    // predicate the report uses (one benchmark set across all THREE rungs
    // — the train grain is identical on every side, so the joins are
    // lossless by construction)
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val isEval = col("doc_id") % operators.Curation.FuzzyEvalMod === 0
    val exact = operators.Curation.decontaminateFrom(docs, isEval)
      .select(col("doc_id"), col("contaminated"))
    val fuzzy = operators.Curation.decontaminateFuzzyFrom(docs, isEval)
      .select(col("doc_id"), col("contaminated").as("fz"))
    val both = exact.join(fuzzy, "doc_id")
    assert(rep.values.map(_._1).sum == both.count())
    assert(rep.values.map(_._2).sum ==
      both.filter(col("contaminated")).count())
    val sem = operators.Curation.decontaminateSemanticFrom(
      graft.sources.Tables.embeddings(spark, sf),
      col("vec_id") % operators.Curation.FuzzyEvalMod === 0)
    assert(rep.values.map(_._4).sum == sem.filter(col("contaminated")).count())
    operators.Intermediates.release()
  }

  test("contamination_report: a train doc without an embedding row stays in the population (sm = false), never drops (r11 advice)") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val full = operators.Curation.contaminationReportFrom(docs, embs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_sem"))).toMap
    operators.Intermediates.release()
    // drop the embedding rows of an arbitrary slice of NON-eval docs: the
    // semantic rung loses its verdict there, but the report's train-doc
    // population is defined by the DOCUMENT table and must not shrink
    val gap = col("vec_id") % operators.Curation.FuzzyEvalMod =!= 0 &&
      col("vec_id") % 3 === 1
    val holey = operators.Curation.contaminationReportFrom(docs, embs.filter(!gap))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_sem"))).toMap
    operators.Intermediates.release()
    assert(holey.view.mapValues(_._1).toMap == full.view.mapValues(_._1).toMap,
      "n_train_docs must be the document population, not the embedded subset")
    // and a doc with no embedding row can only LOWER n_sem, never error
    holey.foreach { case (s, (_, sm)) => assert(sm <= full(s)._2) }
  }

  test("quality_gate_report: the four cells partition every source and agree with the composed filters") {
    import org.apache.spark.sql.functions._
    val rep = operators.Curation.qualityGateReport(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_both"), r.getAs[Long]("n_c4_only"),
          r.getAs[Long]("n_gopher_only"), r.getAs[Long]("n_neither"))).toMap
    rep.values.foreach { case (n, b, c, g, x) =>
      assert(b + c + g + x == n, s"cells must partition: $n vs ${b + c + g + x}")
    }
    val docs = graft.sources.Tables.documents(spark, sf)
    val c4 = operators.Curation.qualityFilterOf(docs)
      .select(col("doc_id"), col("keep").as("c4"))
    val gp = operators.Curation.gopherQualityOf(docs)
      .select(col("doc_id"), col("keep").as("gp"))
    val joined = docs.select(col("doc_id"), col("source"))
      .join(c4, "doc_id").join(gp, "doc_id").collect()
    val expected = joined.groupBy(_.getAs[String]("source")).map { case (s, rows) =>
      val cells = rows.map(r => (r.getAs[Boolean]("c4"), r.getAs[Boolean]("gp")))
      s -> (rows.length.toLong,
        cells.count(c => c._1 && c._2).toLong, cells.count(c => c._1 && !c._2).toLong,
        cells.count(c => !c._1 && c._2).toLong, cells.count(c => !c._1 && !c._2).toLong)
    }
    assert(rep == expected)
    // the matrix is non-vacuous: the two rule sets disagree somewhere
    assert(rep.values.map(v => v._3 + v._4).sum > 0,
      "corpus must carry docs the two rule sets split on")
  }

  // ---- source_drift_report ------------------------------------------------

  test("source_drift_report: planted churn lands on the right source with exact counts") {
    import spark.implicits._
    // carving: A = id%11≠0, B = id%13≠0, B text gains ' rev2' when id%7=0.
    // s1 {1,2,3}: in both snapshots, never mutated → pure steady state.
    // s2 {7,11,13,14}: 7 and 14 mutate (changed), 11 is A-absent (added),
    // 13 is B-absent (removed).
    val docs = Seq(
      (1L, "s1"), (2L, "s1"), (3L, "s1"),
      (7L, "s2"), (11L, "s2"), (13L, "s2"), (14L, "s2"))
      .map { case (id, src) => (id, "alpha beta", src) }
      .toDF("doc_id", "text", "source")
    val rep = graft.operators.CorpusOps.sourceDriftReportOf(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1 = rep("s1")
    assert(s1.getAs[Long]("n_docs_a") == 3 && s1.getAs[Long]("n_docs_b") == 3)
    assert(s1.getAs[Long]("n_added") == 0 && s1.getAs[Long]("n_removed") == 0
      && s1.getAs[Long]("n_changed") == 0 && s1.getAs[Long]("d_tokens") == 0)
    val s2 = rep("s2")
    assert(s2.getAs[Long]("n_docs_a") == 3 && s2.getAs[Long]("n_docs_b") == 3
      && s2.getAs[Long]("d_docs") == 0)
    assert(s2.getAs[Long]("n_added") == 1 && s2.getAs[Long]("n_removed") == 1
      && s2.getAs[Long]("n_changed") == 2)
    // ' rev2' adds one token to each of the two changed docs surviving in B
    assert(s2.getAs[Long]("tok_a") == 6 && s2.getAs[Long]("tok_b") == 8
      && s2.getAs[Long]("d_tokens") == 2)
  }

  test("source_drift_report: totals agree with the snapshots and the diff it composes") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rep = operators.CorpusOps.sourceDriftReport(spark, sf).collect()
    assert(rep.map(_.getAs[Long]("n_docs_a")).sum ==
      docs.filter(col("doc_id") % 11 =!= 0).count())
    assert(rep.map(_.getAs[Long]("n_docs_b")).sum ==
      docs.filter(col("doc_id") % 13 =!= 0).count())
    val byStatus = operators.CorpusOps.corpusDiff(spark, sf)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.map(_.getAs[Long]("n_added")).sum == byStatus.getOrElse("added", 0L))
    assert(rep.map(_.getAs[Long]("n_removed")).sum == byStatus.getOrElse("removed", 0L))
    assert(rep.map(_.getAs[Long]("n_changed")).sum == byStatus.getOrElse("changed", 0L))
    // composite quality is qint/1e5 ∈ (0, 1]
    rep.foreach { r =>
      val qa = r.getAs[Double]("avg_q_a")
      assert(qa > 0.0 && qa <= 1.0, s"avg_q_a out of range: $qa")
    }
  }

  // ---- ann_recall_report --------------------------------------------------

  test("embedding_drift: the re-encoded source's centroid moves exactly as the grid arithmetic says; stable source reads d2=0, cos=1") {
    import spark.implicits._
    // sY (ids 1,2,3): identical on both snapshots (no id hits %7/%11/%13)
    // sX (ids 7,8): id 7 is %7 ≡ 0 → snapshot B re-encodes it
    def vec(axis: Int): Seq[Float] = Seq.tabulate(8)(d => if (d == axis) 1.0f else 0f)
    val embs = Seq((1L, vec(0)), (2L, vec(0)), (3L, vec(0)),
      (7L, vec(0)), (8L, vec(1))).toDF("vec_id", "embedding")
    val docs = Seq((1L, "sY"), (2L, "sY"), (3L, "sY"), (7L, "sX"), (8L, "sX"))
      .toDF("doc_id", "source")
    val out = operators.CorpusOps.embeddingDriftOf(docs, embs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val sy = out("sY")
    assert(sy.getAs[Long]("n_a") == 3 && sy.getAs[Long]("n_b") == 3)
    assert(sy.getAs[Long]("d2_centroid") == 0L && sy.getAs[Double]("cos_centroid") == 1.0)
    // scala mirror of the exact grid arithmetic for sX
    val off = operators.CorpusOps.ReencodeGridOffset
    def mean(vals: Seq[Long]): Long =
      java.math.BigDecimal.valueOf(vals.sum.toDouble / vals.length)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val g = 1000000L
    val ca = Seq(mean(Seq(g, 0L)), mean(Seq(0L, g))) ++ Seq.fill(6)(0L)        // snapshot A
    val cbv = Seq(mean(Seq(g + off, 0L)), mean(Seq(0L, g))) ++ Seq.fill(6)(0L) // snapshot B
    val d2 = ca.zip(cbv).map { case (x, y) => (x - y) * (x - y) }.sum
    val dot = ca.zip(cbv).map { case (x, y) => x * y }.sum.toDouble
    val cos = java.math.BigDecimal.valueOf(dot /
      (math.sqrt(ca.map(x => x * x).sum.toDouble) * math.sqrt(cbv.map(x => x * x).sum.toDouble)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val sx = out("sX")
    assert(sx.getAs[Long]("d2_centroid") == d2, s"d2: ${sx.getAs[Long]("d2_centroid")} vs $d2")
    assert(sx.getAs[Double]("cos_centroid") == cos && cos < 1.0,
      s"cos: ${sx.getAs[Double]("cos_centroid")} vs $cos")
  }

  test("ann_recall_report: a planted cross-cell neighbor costs the IVF path exactly its basis points") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_recall").toString
    def vec(parts: (Int, Double)*): Seq[Float] =
      Seq.tabulate(8)(d => parts.toMap.getOrElse(d, 0.0).toFloat)
    // query 0 (label 0); same-cell 1,2,3; vec 4 sits in cell 1 but is the
    // NEAREST neighbor — the classic IVF boundary miss
    Seq(
      (0L, vec(0 -> 1.0), 0),
      (1L, vec(0 -> 0.95, 2 -> 0.31225), 0),
      (2L, vec(0 -> 0.90, 3 -> 0.43589), 0),
      (3L, vec(0 -> 0.80, 4 -> 0.6), 0),
      (4L, vec(0 -> 0.99, 5 -> 0.14107), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("spark.graft.ann.queries", "1")
    spark.conf.set("spark.graft.ann.topK", "3")
    try {
      val r = operators.Similarity.annRecallReport(spark, dir).collect()
      assert(r.length == 1)
      assert(r.head.getAs[Long]("n_exact") == 3L)
      // brute top-3 = {4, 1, 2}; IVF (cell 0 only) = {1, 2, 3} → 2 hits
      assert(r.head.getAs[Long]("n_hits") == 2L)
      assert(r.head.getAs[Long]("recall_bp") == 6666L)
    } finally {
      spark.conf.unset("spark.graft.ann.queries")
      spark.conf.unset("spark.graft.ann.topK")
    }
  }

  test("ann_recall_report: real-data recall is sane and n_exact = k for every query") {
    val rows = operators.Similarity.annRecallReport(spark, sf).collect()
    assert(rows.length == operators.Similarity.NumQueries)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == operators.Similarity.TopK.toLong)
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  // ---- events_distinct_users ----------------------------------------------

  test("events_distinct_users: approx HLL path stays inside 3×rsd of the exact count") {
    val exact = operators.Events.eventsDistinctUsers(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_users")).toMap
    val approx = operators.Events.eventsDistinctUsersApprox(spark, sf, rsd = 0.02).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_users")).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(1L, (ex * 0.06).toLong),
        s"$k: exact $ex vs approx $ap")
    }
  }

  // ---- events_stickiness --------------------------------------------------

  test("events_stickiness: a daily user scores 10000 bp; a one-day visitor dilutes MAU but not DAU") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stick").toString
    // user 1 active all 4 days; user 2 shows up once → n_days=4, sum_dau=5,
    // mau=2 → 5*10000 div 8 = 6250
    val rows = (0 until 4).map(d =>
      (d.toLong, new java.sql.Timestamp(d * 86400000L), 1L, "click", 1.0, "{}")) :+
      ((99L, new java.sql.Timestamp(2 * 86400000L), 2L, "click", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.eventsStickiness(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") == 4L && r.getAs[Long]("sum_dau") == 5L)
    assert(r.getAs[Long]("mau") == 2L)
    assert(r.getAs[Long]("stickiness_bp") == 6250L)
  }

  // ---- length_histogram ---------------------------------------------------

  test("length_histogram: decimal-digit buckets partition the corpus; boundaries land exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lenh").toString
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq(
      (1L, words(9), "en", "s", 0L),    // 9 tokens  → bucket 1
      (2L, words(10), "en", "s", 0L),   // 10 tokens → bucket 2
      (3L, words(99), "en", "s", 0L),   // 99 → bucket 2
      (4L, words(100), "en", "s", 0L))  // 100 → bucket 3
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = operators.CorpusOps.lengthHistogram(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"))).toMap
    assert(h(1L) == ((1L, 9L, 9L)))
    assert(h(2L) == ((2L, 10L, 99L)))
    assert(h(3L) == ((1L, 100L, 100L)))
    assert(h.values.map(_._1).sum == 4L)
  }

  // ---- lm_coverage_report -------------------------------------------------

  test("lm_coverage_report: level basis points partition every source's positions") {
    val rows = TextAnalysis.lmCoverageReport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, tri, big, uni) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tri"),
        r.getAs[Long]("n_big"), r.getAs[Long]("n_uni"))
      assert(tri + big + uni == nt, s"levels partition positions: $r")
      val (tbp, ubp) = (r.getAs[Long]("tri_bp"), r.getAs[Long]("uni_bp"))
      assert(tbp == tri * 10000 / nt && ubp == uni * 10000 / nt)
    }
    // doc totals roll up: summed n_tokens equals the per-doc operator's sum
    val perDocTotal = TextAnalysis.docPerplexitySbo(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == perDocTotal)
  }

  // ---- script_profile -----------------------------------------------------

  test("script_profile: planted Cyrillic/CJK/mixed rows count by code point; n_other closes the sum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_script").toString
    Seq(
      (1L, "hello world 42", "en", "web", 14L),
      (2L, "привет мир", "ru", "web", 10L),              // 9 Cyrillic + 1 space
      (3L, "日本語のテキスト", "ja", "cjk", 8L),            // 8 CJK-range chars
      (4L, "mixed текст with 中文!", "xx", "mixed", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.scriptProfile(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val web = rows("web")
    assert(web.getAs[Long]("n_latin") == 10L && web.getAs[Long]("n_digit") == 2L)
    assert(web.getAs[Long]("n_cyrillic") == 9L)
    val cjk = rows("cjk")
    assert(cjk.getAs[Long]("n_cjk") == 8L && cjk.getAs[Long]("n_other") == 0L)
    val mixed = rows("mixed")
    assert(mixed.getAs[Long]("n_cyrillic") == 5L && mixed.getAs[Long]("n_cjk") == 2L)
    assert(mixed.getAs[Long]("n_other") == 1L) // the '!'
    // every row: class counts + other == n_chars
    rows.values.foreach { r =>
      val known = Seq("n_latin", "n_digit", "n_space", "n_cyrillic", "n_greek",
        "n_arabic", "n_cjk", "n_other").map(r.getAs[Long]).sum
      assert(known == r.getAs[Long]("n_chars"), s"sum mismatch for $r")
    }
  }
}
