package graft

import graft.operators.{Curation, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Semantic invariants for the training-data curation operators
  * (quality filter, decontamination, packing, domain mix, clusters, BM25)
  * — checks the oracle can't express: cross-query consistency, planted
  * contamination, and an in-memory packing reference.
  */
class CurationSpec extends SparkSpec {

  test("quality_filter: every rule fires on the corpus and keep agrees with reasons") {
    val rows = Curation.qualityFilter(spark, sf).collect()
    val reasons = rows.flatMap(_.getAs[String]("reasons").split(",").filter(_.nonEmpty))
    for (r <- Seq("too_short", "too_long", "low_stopword", "repetitive"))
      assert(reasons.contains(r), s"rule $r never fired at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") == r.getAs[String]("reasons").isEmpty)
      val nw = r.getAs[Long]("n_words")
      if (r.getAs[String]("reasons").contains("too_short")) assert(nw < Curation.MinWords)
      if (r.getAs[String]("reasons").contains("too_long")) assert(nw > Curation.MaxWords)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "no doc survives the filter")
  }

  test("decontaminate: planted eval-set overlap is flagged, clean docs are not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (0L, shared, "en", "synthetic", shared.length.toLong), // eval (0 % 97 == 0)
      (1L, shared + " tail tail", "en", "synthetic", 50L),   // train, contaminated
      (2L, "alpha beta gamma delta epsilon zeta", "en", "synthetic", 40L), // clean
      (3L, "tiny doc", "en", "synthetic", 8L))               // < 5 words: 0 ngrams
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(0L), "eval doc must not appear in train output")
    assert(out(1L).getAs[Boolean]("contaminated") && out(1L).getAs[Long]("n_matched") > 0)
    assert(!out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_ngrams") == 0L &&
      out(3L).getAs[Double]("overlap_frac") == 0.0, "short doc must survive with 0 ngrams")
  }

  test("decontaminate_fuzzy: near-dup of an eval doc is flagged; one-ngram overlap is not") {
    import spark.implicits._
    val w = (0 until 30).map(i => s"w$i")
    val evalText  = w.mkString(" ")                         // eval doc
    val nearDup   = (w.dropRight(1) :+ "changed").mkString(" ") // ~0.9 jaccard vs eval
    // shares exactly the trigram "w10 w11 w12" with the eval doc, nothing else:
    // exact n-gram decontamination flags this; the fuzzy sweep must NOT
    val oneGram   = "a b c w10 w11 w12 d e f g h i j k l m n o p q r s t u v"
    val clean     = (0 until 30).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (0L, evalText), (1L, (0 until 30).map(i => s"e$i").mkString(" ")), // eval set
      (10L, nearDup), (11L, oneGram), (12L, clean))         // train set
      .toDF("doc_id", "text")
    val out = Curation.decontaminateFuzzyFrom(docs, col("doc_id") < 10L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "output must be exactly the train docs")
    val hit = out(10L)
    assert(hit.getAs[Boolean]("contaminated"))
    assert(hit.getAs[Long]("top_eval_id") == 0L)
    assert(hit.getAs[Double]("top_jaccard") >= Curation.FuzzyTau)
    assert(hit.getAs[Long]("n_eval_hits") >= 1L)
    assert(!out(11L).getAs[Boolean]("contaminated"),
      "single shared n-gram below tau must NOT be flagged by the fuzzy sweep")
    assert(out(11L).getAs[Double]("top_jaccard") == 0.0)
    assert(!out(12L).getAs[Boolean]("contaminated"))
  }

  test("decontaminate_semantic: paraphrase-level (embedding) leaks flag; orthogonal docs stay clean") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def axis(d: Int, scale: Double = 1.0): Seq[Float] =
      Seq.tabulate(8)(i => if (i == d) scale.toFloat else 0f)
    val diag = Seq.tabulate(8)(i =>
      if (i <= 1) (1.0 / math.sqrt(2)).toFloat else 0f)
    val embs = Seq(
      (100L, axis(0)),      // eval a: e0
      (200L, axis(1)),      // eval b: e1
      (1L, axis(0)),        // train: exact twin of eval a → cos 1.0
      (2L, diag),           // train: 45° between both evals → two hits at 0.7071
      (3L, axis(5))         // train: orthogonal → clean
    ).toDF("vec_id", "embedding")
    val isEval = col("vec_id") >= 100L
    val out = graft.operators.Curation.decontaminateSemanticFrom(embs, isEval)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    val t1 = out(1L)
    assert(t1.getAs[Boolean]("contaminated") && t1.getAs[Long]("n_sem_hits") == 1
      && t1.getAs[Long]("top_eval_id") == 100L && t1.getAs[Double]("top_cos") == 1.0)
    val t2 = out(2L)
    assert(t2.getAs[Boolean]("contaminated") && t2.getAs[Long]("n_sem_hits") == 2)
    // equal-cosine tie breaks to the lower eval id — the fuzzy rung's rule
    assert(t2.getAs[Long]("top_eval_id") == 100L
      && t2.getAs[Double]("top_cos") == 0.7071)
    val t3 = out(3L)
    assert(!t3.getAs[Boolean]("contaminated") && t3.getAs[Long]("n_sem_hits") == 0
      && t3.getAs[Double]("top_cos") == 0.0)
  }

  test("decontaminate_bloom: superset of exact flags, zero false negatives, bounded FPR") {
    val isEval = col("doc_id") % Curation.EvalIdMod === 0
    val docs = graft.sources.Tables.documents(spark, sf)
    val exact = Curation.decontaminateFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val bloom = Curation.decontaminateBloomFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(bloom.keySet == exact.keySet, "bloom sweep must cover the same train docs")
    for ((id, e) <- exact) {
      val b = bloom(id)
      assert(b.getAs[Long]("n_ngrams") == e.getAs[Long]("n_ngrams"),
        s"doc $id: n-gram universe must not depend on the membership structure")
      // no false negatives: every exact hit is a maybe-hit
      assert(b.getAs[Long]("n_maybe") >= e.getAs[Long]("n_matched"), s"false negative at doc $id")
      if (e.getAs[Boolean]("contaminated"))
        assert(b.getAs[Boolean]("contaminated_maybe"), s"exact-flagged doc $id escaped the sketch")
    }
    val cleanExact = exact.values.filter(!_.getAs[Boolean]("contaminated")).map(_.getAs[Long]("doc_id"))
    val falsePos = cleanExact.count(id => bloom(id).getAs[Boolean]("contaminated_maybe"))
    // 2^23 bits vs thousands of eval n-grams: doc-level FPR must be tiny
    assert(falsePos <= math.max(1, cleanExact.size / 100),
      s"$falsePos/${cleanExact.size} clean docs bloom-flagged — sketch too lossy at default sizing")
    assert(exact.values.exists(_.getAs[Boolean]("contaminated")), "corpus must exercise the hit path")
  }

  test("corpus_curate: funnel stage attribution, every lane feeding it, full-corpus clustering") {
    import spark.implicits._
    // realistic exact-sweep width so a paraphrase can clear it (GPT-3's 13)
    spark.conf.set("spark.graft.decontam.ngram", "13")
    try {
      // 60 mostly-distinct words; e1 = "the" keeps quality's stopword rule
      // happy on every derived doc
      val ew = (0 until 60).map(i => if (i == 1) "the" else s"e$i")
      val evalText = ew.mkString(" ")
      // changed words at 12/25/38/51: longest shared run is 12 < 13 (exact
      // sweep misses) but shingle-3 jaccard stays ≈ 0.66 ≥ tau 0.5 — the
      // paraphrased-benchmark leak only the fuzzy sweep catches
      val paraphrase = ew.zipWithIndex.map { case (w, i) =>
        if (Set(12, 25, 38, 51)(i)) s"chg$i" else w
      }.mkString(" ")
      // verbatim 13-gram lift from the eval doc + own tail: exact catch,
      // but jaccard vs the 60-word eval doc is far below tau
      val lift = (ew.take(13) ++ (0 until 10).map(i => s"own$i")).mkString(" ")
      val dupText = ((0 until 24).map(i => s"d$i") :+ "the").mkString(" ")
      val semA = ((0 until 24).map(i => s"sa$i") :+ "the").mkString(" ")
      val semB = ((0 until 24).map(i => s"sb$i") :+ "the").mkString(" ")
      val clean = ((0 until 24).map(i => s"c$i") :+ "the").mkString(" ")
      val docs = Seq(
        0L -> evalText,   // eval (excluded from output; clusters with 18)
        10L -> paraphrase, // fuzzy-only catch
        11L -> lift,       // exact catch
        12L -> dupText, 13L -> dupText, // exact dup pair: 13 drops
        14L -> semA, 15L -> semB,       // semantic pair via embeddings
        16L -> "tiny doc",              // quality fail
        17L -> clean,                   // survives everything
        18L -> evalText                 // exact copy of the EVAL doc
      ).toDF("doc_id", "text")
      val v = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
      val embs = Seq((14L, v), (15L, v)).toDF("vec_id", "embedding")
      val out = Curation.corpusCurateFrom(docs, embs, col("doc_id") === 0L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      graft.operators.Dedup.releaseIntermediates()
      assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L, 16L, 17L, 18L))
      def stage(id: Long) = out(id).getAs[String]("stage")
      assert(stage(10L) == "contam_fuzzy",
        s"paraphrase must clear the 13-gram sweep and hit the fuzzy one: ${out(10L)}")
      assert(!out(10L).getAs[Boolean]("contam_exact"))
      assert(stage(11L) == "contam_exact")
      assert(!out(11L).getAs[Boolean]("contam_fuzzy"),
        "13-word lift in a 23-word doc is far below fuzzy tau vs the 60-word eval doc")
      assert(stage(12L) == "kept" && stage(13L) == "duplicate")
      assert(stage(14L) == "kept" && stage(15L) == "duplicate",
        "semantic-only dup must drop through the embedding lane")
      assert(stage(16L) == "quality")
      assert(stage(17L) == "kept" && out(17L).getAs[Boolean]("kept"))
      // 18 exactly duplicates the eval doc: clustering runs over the FULL
      // corpus, so the eval doc 0 is the canonical and 18 is not dedup-kept
      // (stage reads contam_exact first — the flags, not the label, pin it)
      assert(!out(18L).getAs[Boolean]("dedup_keep") &&
        out(18L).getAs[Boolean]("contam_exact") && stage(18L) == "contam_exact")
      // kept ⇔ conjunction of the stage flags, on every row
      out.values.foreach { r =>
        assert(r.getAs[Boolean]("kept") ==
          (r.getAs[Boolean]("q_keep") && !r.getAs[Boolean]("contam_exact") &&
            !r.getAs[Boolean]("contam_fuzzy") && r.getAs[Boolean]("dedup_keep")))
      }
    } finally {
      spark.conf.unset("spark.graft.decontam.ngram")
      graft.operators.Dedup.releaseIntermediates()
    }
  }

  test("corpus_curate_delta ≡ the per-column composition of its three rungs on the crawl slice") {
    import graft.operators.{Curation, Dedup}
    val out = Curation.corpusCurateDelta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Dedup.releaseIntermediates()
    val docs = graft.sources.Tables.documents(spark, sf)
    val isD = col("doc_id") % Dedup.DeltaIdMod === 0
    val isEval = col("doc_id") % Curation.FuzzyEvalMod === 0
    val crawlIds = docs.filter(isD && !isEval).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.keySet == crawlIds, "one funnel row per crawl doc, nothing else")
    // quality rung ≡ the stateless per-doc filter on the crawl slice
    val q = Curation.qualityFilterOf(docs.filter(isD && !isEval)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    // contamination rungs ≡ the full-corpus sweeps restricted to crawl docs
    val ce = Curation.decontaminateFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    val cf = Curation.decontaminateFuzzyFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    Dedup.releaseIntermediates()
    // dedup rung ≡ dedup_keep_unified_delta's verdicts (keep = not 'dup')
    val dv = Dedup.dedupKeepUnifiedDelta(spark, sf).collect()
      .filter(_.getAs[String]("origin") == "delta")
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("status") != "dup")).toMap
    Dedup.releaseIntermediates()
    out.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("q_keep") == q(id), s"q_keep drift at $id")
      assert(r.getAs[Boolean]("contam_exact") == ce(id), s"contam_exact drift at $id")
      assert(r.getAs[Boolean]("contam_fuzzy") == cf(id), s"contam_fuzzy drift at $id")
      assert(r.getAs[Boolean]("dedup_keep") == dv.getOrElse(id, true),
        s"dedup_keep drift at $id")
      val expectedStage =
        if (!q(id)) "quality"
        else if (ce(id)) "contam_exact"
        else if (cf(id)) "contam_fuzzy"
        else if (!dv.getOrElse(id, true)) "duplicate"
        else "kept"
      assert(r.getAs[String]("stage") == expectedStage, s"stage drift at $id")
      assert(r.getAs[Boolean]("kept") == (expectedStage == "kept"))
    }
    // non-vacuity: the crawl slice must exercise a drop stage and a keep
    val stages = out.values.map(_.getAs[String]("stage")).toSet
    assert(stages.contains("kept") && stages.size >= 2, s"stages seen: $stages")
  }

  test("corpus_curate_delta_best: dedup rung ≡ the quality-argmax verdict; other rungs identical to the min-id funnel") {
    import graft.operators.{Curation, Dedup}
    val best = Curation.corpusCurateDeltaBest(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Dedup.releaseIntermediates()
    val minId = Curation.corpusCurateDelta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Dedup.releaseIntermediates()
    val bv = Dedup.dedupDeltaKeepBest(spark, sf).collect()
      .filter(_.getAs[String]("origin") == "delta")
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("status") != "dup")).toMap
    Dedup.releaseIntermediates()
    assert(best.keySet == minId.keySet, "same crawl slice in both funnels")
    best.foreach { case (id, r) =>
      val m = minId(id)
      assert(r.getAs[Boolean]("q_keep") == m.getAs[Boolean]("q_keep") &&
        r.getAs[Boolean]("contam_exact") == m.getAs[Boolean]("contam_exact") &&
        r.getAs[Boolean]("contam_fuzzy") == m.getAs[Boolean]("contam_fuzzy"),
        s"non-dedup rungs must be identical across keep variants at $id")
      assert(r.getAs[Boolean]("dedup_keep") == bv.getOrElse(id, true),
        s"dedup rung must follow the quality-argmax verdict at $id")
    }
    // the two keep rules genuinely disagree somewhere on the shipped corpus
    // (a cluster whose best member is not its min id)
    assert(best.exists { case (id, r) =>
      r.getAs[Boolean]("dedup_keep") != minId(id).getAs[Boolean]("dedup_keep") },
      "the corpus must carry a cluster where argmax-quality and min-id pick different survivors")
  }

  test("pack_sequences matches an in-memory concat-and-chop reference") {
    val rows = Curation.packSequences(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("seq_id") == cum / Curation.SeqBudget)
        assert(r.getAs[Long]("seq_offset") == cum % Curation.SeqBudget)
        assert(r.getAs[Long]("n_seqs") ==
          (cum + n - 1) / Curation.SeqBudget - cum / Curation.SeqBudget + 1)
        cum += n
      }
    }
    assert(rows.map(_.getAs[Long]("shard")).distinct.length == Curation.PackShards)
  }

  test("pack_manifest: sequences tile gap-free at exactly SeqBudget tokens bar the shard remainder") {
    val b = Curation.SeqBudget.toLong
    val rows = Curation.packManifest(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, seqs) =>
      val maxSeq = seqs.map(_.getAs[Long]("seq_id")).max
      // every seq_id 0..max present, full except the remainder
      assert(seqs.map(_.getAs[Long]("seq_id")).sorted.sameElements(0L to maxSeq))
      seqs.foreach { r =>
        val full = r.getAs[Long]("seq_id") < maxSeq
        assert(!full || r.getAs[Long]("seq_tokens") == b,
          s"non-final sequence not exactly $b tokens in shard $shard")
        assert(r.getAs[Long]("seq_tokens") <= b)
        // spans tile the sequence contiguously from offset 0
        val spans = r.getAs[String]("spans").split(" ").map { s =>
          val Array(doc, off, len) = s.split(":").map(_.toLong); (doc, off, len)
        }
        assert(spans.length == r.getAs[Long]("n_docs"))
        assert(spans.head._2 == 0L)
        spans.sliding(2).foreach {
          case Array((_, o1, l1), (_, o2, _)) => assert(o2 == o1 + l1)
          case _ => ()
        }
        assert(spans.map(_._3).sum == r.getAs[Long]("seq_tokens"))
      }
    }
    // agreement with pack_sequences: a doc appears in exactly n_seqs manifests
    val perDoc = rows.flatMap(r => r.getAs[String]("spans").split(" ")
      .map(_.split(":")(0).toLong)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    Curation.packSequences(spark, sf).collect().foreach { r =>
      assert(perDoc(r.getAs[Long]("doc_id")) == r.getAs[Long]("n_seqs"))
    }
  }

  test("domain_mix_sample: oversampled domain clamps to rate 1.0 and keeps every doc") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val src0Total = docs.filter(col("source") === "src0").count()
    val out = Curation.domainMixSample(spark, sf)
    val src0 = out.filter(col("source") === "src0").collect()
    assert(src0.length == src0Total, "src0 rate clamps at 1.0 -> all docs kept")
    src0.foreach(r => assert(r.getAs[Double]("rate") == 1.0))
    // the downweighted tail is actually sampled, not taken wholesale
    val otherKept = out.filter(!col("source").isin("src0", "src1")).count()
    val otherTotal = docs.filter(!col("source").isin("src0", "src1")).count()
    assert(otherKept > 0 && otherKept < otherTotal / 2)
    // hash-determinism: rerun is identical
    assert(out.collect().map(_.toString).sorted
      .sameElements(Curation.domainMixSample(spark, sf).collect().map(_.toString).sorted))
  }

  test("gopher_quality: each rule fires on its planted violator and only that rule") {
    import spark.implicits._
    val good = "the quick brown fox jumped over a lazy dog with energy and that should have been plenty good"
    val docs = Seq(
      (1L, good),                                          // passes everything
      (2L, "the quick a brown"),                           // too_short (4 < 10)
      (3L, ("the a " + Seq.fill(20)("ab cd e").mkString(" "))), // short_words (mean < 3)
      (4L, "the a " + Seq.fill(12)("extraordinarily").mkString(" ")), // long_words
      (5L, "the a " + Seq.fill(12)("x# y# #z# ##w#").mkString(" ")), // symbol_heavy
      (6L, "the a " + Seq.fill(15)("123 456 789").mkString(" ")), // low_alpha
      (7L, Seq.fill(15)("alpha beta gamma").mkString(" ")))  // few_stopwords
      .toDF("doc_id", "text")
    val out = Curation.gopherQualityOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), s"good doc rejected: ${out(1L)}")
    assert(out(1L).getAs[String]("reasons").isEmpty)
    def reasons(id: Long) = out(id).getAs[String]("reasons").split(",").toSet
    assert(reasons(2L) == Set("too_short"))
    assert(reasons(3L).contains("short_words"))
    assert(reasons(4L).contains("long_words"))
    assert(reasons(5L).contains("symbol_heavy"))
    assert(reasons(6L).contains("low_alpha"))
    assert(reasons(7L) == Set("few_stopwords"))
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("keep") == r.getAs[String]("reasons").isEmpty)
      assert(r.getAs[Long]("n_gstop") <= graft.operators.GraftConf.gopherStops.length)
    }
    // real corpus: filter is neither vacuous nor total
    val real = Curation.gopherQuality(spark, sf).collect()
    assert(real.exists(_.getAs[Boolean]("keep")) && real.exists(!_.getAs[Boolean]("keep")))
  }

  test("line_quality_filter: C4 line keeps and Gopher doc ratios fire per planted violator") {
    import spark.implicits._
    val docs = Seq(
      // prose: every line ≥3 words with terminal punctuation → kept doc
      (1L, "The first sentence is here.\nAnother good line follows it!\nIs this a question?"),
      // quoted terminal punctuation also keeps (the C4 closing-quote rule)
      (2L, "He said the words \"it works.\"\nShe replied that it would hold.'"),
      // a brace/javascript line drops but the doc survives on its prose
      (3L, "This page mixes prose with code.\nfunction f() { return 1; }\nPlease enable javascript to continue.\nThe prose however is long enough to keep."),
      // bullet-heavy listing page: every line a bullet → bullet_heavy
      (4L, "- first item\n- second item\n- third item\n• fourth item"),
      // teaser page: every line ends in an ellipsis → ellipsis_heavy
      // (the lines themselves pass the C4 keep — '...' ends in '.')
      (5L, "Read more about this story...\nThe article continues elsewhere…\nClick through for details..."),
      // short fragments: no line reaches 3 words + terminal → no_kept_lines
      (6L, "nav\nhome\nabout us"))
      .toDF("doc_id", "text")
    val out = Curation.lineQualityFilterOf(docs).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    def docReasons(id: Long) =
      byDoc(id).head.getAs[String]("reasons").split(",").filter(_.nonEmpty).toSet
    assert(byDoc(1L).forall(_.getAs[Boolean]("keep")) && docReasons(1L).isEmpty)
    assert(byDoc(1L).forall(_.getAs[Boolean]("line_keep")))
    assert(byDoc(2L).head.getAs[Boolean]("keep"), byDoc(2L).mkString("|"))
    // doc 3: the brace line and the javascript line are cut, prose kept
    val d3 = byDoc(3L).sortBy(_.getAs[Long]("idx"))
    assert(d3.map(_.getAs[Boolean]("line_keep")).toSeq ==
      Seq(true, false, false, true), d3.mkString("|"))
    assert(d3.head.getAs[Boolean]("keep"))
    assert(docReasons(4L) == Set("no_kept_lines", "bullet_heavy"), docReasons(4L))
    assert(byDoc(4L).head.getAs[Long]("n_bullet") == 4L)
    assert(docReasons(5L).contains("ellipsis_heavy"))
    assert(byDoc(5L).head.getAs[Long]("n_ellipsis") == 3L)
    assert(docReasons(6L) == Set("no_kept_lines"))
    // per-line counters agree with the doc verdict everywhere
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("n_kept") >= 1 &&
          r.getAs[Long]("n_bullet") * 100 <= r.getAs[Long]("n_lines") * 90 &&
          r.getAs[Long]("n_ellipsis") * 100 <= r.getAs[Long]("n_lines") * 30))
    }
    // synthetic corpus (no newlines, no punctuation): uniformly non-prose,
    // the honest verdict — never a throw, one row per doc
    val real = Curation.lineQualityFilter(spark, sf).collect()
    assert(real.nonEmpty && real.forall(r =>
      r.getAs[Long]("n_lines") == 1L && !r.getAs[Boolean]("keep")))

    // the ACT step rewrites per the same verdicts: every doc one row,
    // kept lines reassemble in order, failing docs empty entirely
    val cut = Curation.lineQualityCutOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Boolean]("keep"))).toMap
    assert(cut.keySet == (1L to 6L).toSet)
    // an all-kept doc round-trips byte-identically (the act-step contract)
    assert(cut(1L) == ((docs.filter($"doc_id" === 1L).head.getAs[String]("text"), true)))
    // doc 3 loses exactly its brace and javascript lines, order intact
    assert(cut(3L)._1 == "This page mixes prose with code.\n" +
      "The prose however is long enough to keep.", cut(3L)._1)
    // doc-verdict failures empty entirely, whatever their line verdicts
    assert(cut(4L) == (("", false)) && cut(5L) == (("", false)) &&
      cut(6L) == (("", false)), cut.toString)
  }

  test("domain_temperature_mix: temperature flattens the mixture toward the tail") {
    import spark.implicits._
    // planted skew: src_big 800 docs, src_mid 150, src_tail 50
    val planted = ((1L to 800L).map(i => (i, "t", "src_big")) ++
      (1001L to 1150L).map(i => (i, "t", "src_mid")) ++
      (2001L to 2050L).map(i => (i, "t", "src_tail")))
      .toDF("doc_id", "text", "source")
    val counts = Map("src_big" -> 800L, "src_mid" -> 150L, "src_tail" -> 50L)
    val n = counts.values.sum.toDouble
    val out = Curation.domainTemperatureMixOf(planted).collect()
    val bySrc = out.groupBy(_.getAs[String]("source")).map { case (s, rows) => s -> rows.head }
    assert(bySrc.keySet == counts.keySet, "every source must survive sampling")
    val qs = bySrc.map { case (s, r) => s -> r.getAs[Double]("q") }
    assert(math.abs(qs.values.sum - 1.0) < 1e-3, s"q sums to ${qs.values.sum}")
    // alpha = 0.5 flattening: tail boosted above natural share, head shrunk
    assert(qs("src_tail") > counts("src_tail") / n, s"tail not boosted: $qs")
    assert(qs("src_mid") > counts("src_mid") / n, s"mid not boosted: $qs")
    assert(qs("src_big") < counts("src_big") / n, s"head not flattened: $qs")
    // but flattening preserves ORDER: bigger source keeps bigger share
    assert(qs("src_big") > qs("src_mid") && qs("src_mid") > qs("src_tail"))
    // rates monotone non-increasing in source size (alpha < 1)
    val rates = counts.keys.toSeq.sortBy(counts).map(s => bySrc(s).getAs[Double]("rate"))
    assert(rates == rates.sorted.reverse, s"rates not monotone in size: $rates")
    // sampled kept-counts track budget*q: each source within 3x of target
    counts.keys.foreach { s =>
      val kept = out.count(_.getAs[String]("source") == s)
      val target = Curation.MixBudget * qs(s)
      assert(kept <= counts(s) && kept > 0, s"$s kept $kept")
      assert(kept < 3 * target + 5, s"$s kept $kept vs target $target")
    }
    // deeper temperature (alpha 0.25) flattens harder
    spark.conf.set("spark.graft.mix.tempSqrts", "2")
    try {
      val flat = Curation.domainTemperatureMixOf(planted).collect()
        .filter(_.getAs[String]("source") == "src_big")
      assert(flat.nonEmpty && flat.head.getAs[Double]("q") < qs("src_big"),
        "alpha 0.25 must shrink the head share below alpha 0.5's")
    } finally spark.conf.unset("spark.graft.mix.tempSqrts")
    // real corpus: deterministic rerun
    val real = Curation.domainTemperatureMix(spark, sf).collect().map(_.toString).sorted
    assert(real.sameElements(Curation.domainTemperatureMix(spark, sf).collect().map(_.toString).sorted))
  }

  test("dedup_clusters: components are consistent with the minhash pair graph") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = Dedup.dedupClusters(spark, sf).collect()
    val comp = clusters.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every edge is intra-cluster
    pairs.foreach { case (a, b) => assert(comp(a) == comp(b), s"edge ($a,$b) split") }
    // cluster id is the min member; exactly one canonical per cluster
    val byCluster = clusters.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min == cid)
      assert(members.count(_.getAs[Boolean]("is_canonical")) == 1)
      members.foreach(m => assert(m.getAs[Long]("cluster_size") == members.length))
      assert(members.length >= 2, "singleton node can't come from a pair graph")
    }
    Dedup.releaseIntermediates()
    spark.catalog.clearCache()
  }

  test("dedup_keep: cleaned corpus = uniques + exactly one canonical per cluster") {
    val docsN = graft.sources.Tables.documents(spark, sf).count()
    val clusters = graft.operators.Dedup.dedupClusters(spark, sf).collect()
    val kept = graft.operators.Dedup.dedupKeep(spark, sf).collect()
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds.size == kept.length)
    // every cluster contributes exactly its canonical; non-canonicals dropped
    clusters.foreach { c =>
      val id = c.getAs[Long]("doc_id")
      assert(keptIds.contains(id) == c.getAs[Boolean]("is_canonical"))
    }
    // count reconciliation: n_kept = n_docs − (cluster members − clusters)
    val members = clusters.length
    val nClusters = clusters.map(_.getAs[Long]("cluster_id")).distinct.length
    assert(kept.length == docsN - (members - nClusters))
    // status tags agree with membership
    kept.foreach { r =>
      val inCluster = clusters.exists(_.getAs[Long]("doc_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("status") == (if (inCluster) "canonical" else "unique"))
      assert(r.getAs[Long]("cluster_size") >= 1)
    }
  }

  test("bm25_search: ranked top-k with scores consistent with a scala reference") {
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.length).sum / n
    def tf(ws: Array[String], t: String) = ws.count(_ == t)
    val dfs = Similarity.QueryTerms.map(t => t -> docs.values.count(ws => tf(ws, t) > 0)).toMap
    def score(ws: Array[String]): Double = Similarity.QueryTerms.map { t =>
      val idf = BigDecimal(math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val f = tf(ws, t)
      idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (ws.length / avgdl)))
    }.sum
    val rows = Similarity.bm25Search(spark, sf).collect()
    assert(rows.length == Similarity.Bm25TopK)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to Similarity.Bm25TopK))
    val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)), "scores must be non-increasing by rank")
    rows.foreach { r =>
      val expected = score(docs(r.getAs[Long]("doc_id")))
      assert(math.abs(r.getAs[Double]("score") - expected) < 2e-4,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Double]("score")} vs $expected")
    }
  }
}
