package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** pii_audit / doc_repetition / dup_substrings: the shipped corpus is
  * synthetic word-soup, so PII semantics are exercised on PLANTED rows here
  * (the corpus-level query proves only the all-clean shape); repetition and
  * cross-doc window semantics are asserted against hand-computed values.
  */
class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPiiCol: planted emails/phones/IPs redact exactly, order-sensitively") {
    val rows = Seq(
      "mail bob.smith+x@corp-site.co.uk now",
      "call 555-123-4567 or 555 123 4567 today",
      "host 10.0.0.1 and 192.168.255.3",
      // email domain has dots: must become [EMAIL], never a partial [IP]
      "ping alice@10.0.0.1.example.com ok",
      "none here 12345")
      .toDF("text")
    val got = rows.select(TextAnalysis.scrubPiiCol(col("text")).as("s")).as[String].collect()
    assert(got(0) == "mail [EMAIL] now")
    assert(got(1) == "call [PHONE] or [PHONE] today")
    assert(got(2) == "host [IP] and [IP]")
    assert(got(3) == "ping [EMAIL] ok")
    assert(got(4) == "none here 12345")
  }

  test("piiCountsOf: per-category counts on planted rows; audit rolls up per source") {
    val docs = Seq(
      (1L, "a@b.co and c@d.io plus 1.2.3.4", "srcA"),
      (2L, "call 555-123-4567", "srcA"),
      (3L, "clean text only", "srcB"))
      .toDF("doc_id", "text", "source")
    val c = TextAnalysis.piiCountsOf(docs)
      .select("doc_id", "n_emails", "n_phones", "n_ipv4")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(c(1L) == ((2L, 0L, 1L)))
    assert(c(2L) == ((0L, 1L, 0L)))
    assert(c(3L) == ((0L, 0L, 0L)))

    val audit = TextAnalysis.piiAudit(spark, sf).collect()
    assert(audit.nonEmpty)
    // synthetic corpus is clean: every source reports zero PII but real doc counts
    audit.foreach { r =>
      assert(r.getAs[Long]("docs_with_pii") == 0L && r.getAs[Long]("n_emails") == 0L)
      assert(r.getAs[Long]("n_docs") > 0L)
    }
  }

  test("doc_repetition: hand-computed top bigram and duplicated-trigram fraction") {
    // "x y x y x y" (11 chars): bigrams = [x y, y x, x y, y x, x y] → top "x y"×3
    // trigrams = [x y x, y x y, x y x, y x y] → both dup ⇒ dup3_chars = 2*5 + 2*5 = 20
    // (overlapping occurrences can push the fraction past 1.0 — it's a
    // repetition score, not a coverage measure)
    val docs = Seq((1L, "x y x y x y", 11L), (2L, "p q r s", 7L))
      .toDF("doc_id", "text", "n_chars")
    val out = graft.operators.TextAnalysis.docRepetitionOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[String]("top_bigram") == "x y" && r1.getAs[Long]("top_bigram_n") == 3L)
    assert(r1.getAs[Double]("top2_char_frac") == math.rint(3 * 3 / 11.0 * 10000) / 10000)
    assert(r1.getAs[Double]("dup3_char_frac") == math.rint(20 / 11.0 * 10000) / 10000)
    val r2 = out(2L)
    // all bigrams distinct: count 1, lexicographically smallest wins the tie
    assert(r2.getAs[Long]("top_bigram_n") == 1L && r2.getAs[String]("top_bigram") == "p q")
    assert(r2.getAs[Double]("dup3_char_frac") == 0.0)
  }

  test("doc_repetition survives 1-word docs (no bigrams → zero-frac row, not a crash)") {
    val docs = Seq((7L, "lone", 4L)).toDF("doc_id", "text", "n_chars")
    val r = graft.operators.TextAnalysis.docRepetitionOf(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("top_bigram") == "" && r(0).getAs[Long]("top_bigram_n") == 0L)
    assert(r(0).getAs[Double]("top2_char_frac") == 0.0 && r(0).getAs[Double]("dup3_char_frac") == 0.0)
  }

  test("doc_repetition: a zero-length doc yields defined zero fractions, never null/NaN") {
    val docs = Seq((8L, "", 0L)).toDF("doc_id", "text", "n_chars")
    val r = graft.operators.TextAnalysis.docRepetitionOf(docs).collect()
    assert(r.length == 1)
    val (f1, f2) = (r(0).getAs[Double]("top2_char_frac"), r(0).getAs[Double]("dup3_char_frac"))
    assert(!r(0).isNullAt(r(0).fieldIndex("top2_char_frac")) && f1 == 0.0 && f2 == 0.0)
  }

  test("dup_substrings: planted cross-doc window found; within-doc repeats alone excluded") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words
    val docs = Seq(
      (1L, s"one two $shared tail1"),
      (2L, s"$shared other words here"),
      (3L, s"$shared middle $shared"), // within-doc repeat, also cross-doc
      (4L, "solo solo solo solo solo solo solo solo solo")) // 9 words, within-doc only
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.dupSubstringsOf(docs).collect()
    val byGram = out.map(r => r.getAs[String]("g") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).toMap
    assert(byGram.contains(shared), s"expected planted window in ${byGram.keys}")
    assert(byGram(shared) == ((3L, 4L))) // docs 1,2,3; doc 3 twice
    // doc 4's repeated window never crosses documents → must be absent
    assert(!byGram.keys.exists(_.startsWith("solo")))
    // corpus-level query returns the conf-bounded top-N with planted dups present
    val corpus = TextAnalysis.dupSubstrings(spark, sf).collect()
    assert(corpus.nonEmpty && corpus.length <= graft.operators.GraftConf.dupTopN)
    corpus.foreach(r => assert(r.getAs[Long]("n_docs") >= 2L))
  }

  test("dedup_substrings_cut: first occurrence survives, later occurrences cut, accounting exact") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words
    val docs = Seq(
      (1L, s"one two $shared tail1"),
      (2L, s"$shared other words here"),
      (3L, "untouched text with completely fresh vocabulary nothing shared"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.dedupSubstringsCutOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 holds the globally first occurrence (min (doc_id, offset)) — intact
    assert(out(1L).getAs[String]("clean_text") == s"one two $shared tail1")
    assert(out(1L).getAs[Long]("n_words_cut") == 0L)
    // doc 2's occurrence is cut: exactly the 8 covered words removed
    assert(out(2L).getAs[String]("clean_text") == "other words here")
    assert(out(2L).getAs[Long]("n_words_cut") == 8L)
    assert(out(2L).getAs[Long]("n_chars_cut") == shared.split(" ").map(_.length).sum.toLong)
    // untouched doc passes through whole
    assert(out(3L).getAs[Long]("n_words_cut") == 0L &&
      out(3L).getAs[String]("clean_text").startsWith("untouched"))
  }

  test("dedup_substrings_cut: re-running dup_substrings on the output finds zero duplicated windows") {
    val cleaned = TextAnalysis.dedupSubstringsCut(spark, sf)
      .select(col("doc_id"), col("clean_text").as("text"))
    // the reporter's threshold (cross-doc n_docs >= 2) must find NOTHING in
    // the cleaned corpus: every originally-duplicated window survives in at
    // most one document, and cuts did not manufacture new cross-doc windows
    val residue = graft.operators.TextAnalysis.dupSubstringsOf(cleaned).collect()
    assert(residue.isEmpty, s"residual duplicated windows: ${residue.take(3).mkString("; ")}")
  }

  test("text knobs at non-default values: plan and oracle SQL track the conf") {
    try {
      spark.conf.set("spark.graft.text.dupWindowWords", "6")
      spark.conf.set("spark.graft.text.dupTopN", "7")
      assert(graft.operators.GraftConf.dupWindowWords == 6)
      val sql = TextAnalysis.dupSubstringsSql
      assert(sql.contains("len(ws) >= 6") && sql.contains("LIMIT 7"))
      val rows = TextAnalysis.dupSubstrings(spark, sf).collect()
      assert(rows.length <= 7 && rows.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.text.dupWindowWords")
      spark.conf.unset("spark.graft.text.dupTopN")
    }
  }

  test("doc_perplexity: rare-token doc scores strictly worse; uniform corpus scores ln(V)") {
    val docs = Seq(
      (1L, "the the the the the the the the"),       // all common tokens
      (2L, "the the the the the the the zyzzyva"))   // one rare token
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.docPerplexityOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    // 'the' appears 15/16 times, 'zyzzyva' once: doc 2's mean NLL is higher
    assert(out(2L) > out(1L), s"rare-token doc must score worse: $out")
    // hand-check doc 1: every token logp = ln(15/16) rounded at 6, mean = -that
    val expect1 = math.rint(-math.rint(math.log(15.0 / 16.0) * 1e6) / 1e6 * 1e4) / 1e4
    assert(out(1L) == expect1, s"got ${out(1L)} want $expect1")
  }

  test("doc_perplexity_bigram: pair structure separates docs the unigram model ties") {
    // corpus of repeated "a b" bigrams plus two probe docs with IDENTICAL
    // unigram multisets: doc 20 keeps the corpus-typical a-b alternation,
    // doc 21 scrambles it into a-a / b-b runs the corpus never produces
    val background = (1L to 10L).map(i => (i, "a b a b a b a b"))
    val docs = (background ++ Seq(
      (20L, "a b a b a b a b"),
      (21L, "a a a a b b b b"))).toDF("doc_id", "text")
    val uni = graft.operators.TextAnalysis.docPerplexityOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    val bi = graft.operators.TextAnalysis.docPerplexityBigramOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"), r.getAs[Double]("nll"))).toMap
    assert(uni(20L) == uni(21L), "unigram scorer must tie the probe docs (same multiset)")
    assert(bi(20L)._2 < bi(21L)._2,
      s"corpus-typical bigram order must score strictly better: $bi")
    assert(bi.values.forall(_._1 == 8L))
    // single-token doc: unigram term only, no bigram rows, still scored
    val solo = Seq((1L, "only"), (2L, "only two")).toDF("doc_id", "text")
    val s = graft.operators.TextAnalysis.docPerplexityBigramOf(solo).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(s == Map(1L -> 1L, 2L -> 2L))
  }

  test("winnowing: detection guarantee, noise threshold, density band") {
    import graft.operators.{GraftConf, TextAnalysis}
    val k = GraftConf.winnowK
    val w = GraftConf.winnowW
    // doc 1 and 2 share an exact (w+k-1)-word run — the guarantee length;
    // doc 3 shares only a (k-1)-word fragment — below the noise threshold
    val run = (1 to w + k - 1).map(i => s"shared$i").mkString(" ")
    val frag = (1 until k).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, run + " " + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"b$i").mkString(" ") + " " + run),
      (3L, frag + " " + (1 to 15).map(i => s"c$i").mkString(" ")),
      (4L, (1 to 15).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowMatchesOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("n_shared")).toMap
    assert(pairs.contains((1L, 2L)), s"guaranteed match missed: $pairs")
    assert(pairs.keySet == Set((1L, 2L)),
      s"sub-threshold or disjoint docs must not pair: $pairs")
    // fingerprints are a subset of the doc's own gram hashes (selection,
    // not invention): every selected fp collides only on true shared grams
    val fps = TextAnalysis.docWinnowOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(fps(4L).getAs[Long]("n_fps") >= 1)
    fps.values.foreach { r =>
      assert(r.getAs[Long]("n_fps") <= r.getAs[Long]("n_grams"))
    }
    // real corpus: density tracks the published 2/(w+1) expectation
    val real = TextAnalysis.docWinnow(spark, sf).collect()
    val dens = real.filter(_.getAs[Long]("n_grams") >= 3L * w)
      .map(_.getAs[Double]("density"))
    assert(dens.nonEmpty)
    val mean = dens.sum / dens.length
    val expect = 2.0 / (w + 1)
    assert(mean > expect * 0.6 && mean < expect * 1.8,
      s"mean density $mean far from 2/(w+1) = $expect")
    // matches exist on the real corpus (it plants duplicated phrases)
    assert(TextAnalysis.winnowMatches(spark, sf).count() > 0)
  }

  test("winnow_spans: a planted guarantee-length run is localized from fingerprints only") {
    import graft.operators.{GraftConf, TextAnalysis}
    val k = GraftConf.winnowK
    val w = GraftConf.winnowW
    // the shared run sits at a KNOWN word offset in each doc; everything
    // else is doc-unique vocabulary, so any reported span must come from
    // the run's fingerprints alone
    val run = (1 to w + k - 1).map(i => s"shared$i").mkString(" ")
    val pre1 = 7; val pre2 = 12
    val docs = Seq(
      (1L, (1 to pre1).map(i => s"a$i").mkString(" ") + " " + run + " " +
        (1 to 9).map(i => s"x$i").mkString(" ")),
      (2L, (1 to pre2).map(i => s"b$i").mkString(" ") + " " + run),
      (3L, (1 to 20).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = TextAnalysis.winnowSpansOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    // run occupies gram positions [pre+1, pre+w] (w grams fully inside the
    // run) — every reported span must overlap that range, and each doc
    // with the run must report at least one such span; the disjoint doc
    // reports nothing
    def overlaps(s: (Long, Long, Long), lo: Long, hi: Long): Boolean =
      s._2 <= hi && s._3 >= lo
    val d1 = spans.filter(_._1 == 1L)
    val d2 = spans.filter(_._1 == 2L)
    assert(d1.nonEmpty && d1.forall(overlaps(_, pre1 + 1, pre1 + w + k - 1)),
      s"doc 1 spans $d1 must localize the run at words [${pre1 + 1}, ${pre1 + w + k - 1}]")
    assert(d2.nonEmpty && d2.forall(overlaps(_, pre2 + 1, pre2 + w + k - 1)),
      s"doc 2 spans $d2 must localize the run at words [${pre2 + 1}, ${pre2 + w + k - 1}]")
    assert(!spans.exists(_._1 == 3L), s"disjoint doc must report no span: $spans")
    // span word-extents stay inside their documents and starts are positive
    assert(spans.forall(s => s._2 >= 1 && s._3 >= s._2))
  }

  test("winnow_cut: non-first doc loses a bite of the planted run, first doc and bystanders intact") {
    import graft.operators.{GraftConf, TextAnalysis}
    val k = GraftConf.winnowK
    val w = GraftConf.winnowW
    val run = (1 to w + k - 1).map(i => s"shared$i").mkString(" ")
    val t1 = run + " " + (1 to 9).map(i => s"a$i").mkString(" ")
    val t3 = (1 to 20).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, t1),
      (2L, (1 to 11).map(i => s"b$i").mkString(" ") + " " + run),
      (3L, t3))
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowCutOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_words_cut"))).toMap
    // doc 1 holds every first occurrence of the run's fingerprints — intact
    assert(out(1L) == ((t1, 0L)), s"first doc must keep everything: ${out(1L)}")
    // doc 2: the guarantee puts >= 1 shared fingerprint inside the run, so
    // its k-word extent is cut — and only run words are ever fingerprint-
    // matched, so the b-prefix survives
    assert(out(2L)._2 >= k, s"non-first doc must lose >= $k words: ${out(2L)}")
    assert((1 to 11).forall(i => out(2L)._1.contains(s"b$i")), s"prefix cut: ${out(2L)}")
    assert(out(2L)._1.split(" ").count(_.startsWith("shared")) <= (w + k - 1) - k)
    // disjoint doc passes through byte-identical
    assert(out(3L) == ((t3, 0L)), s"bystander modified: ${out(3L)}")
  }

  test("packedOccKey fast path: keep-first lanes bit-identical under struct and packed keys") {
    import graft.operators.TextAnalysis
    // the synthetic corpus satisfies the doc_id < 2^43 precondition, so
    // both key representations must order — and therefore keep — alike
    def snap(): (Seq[String], Seq[String], Seq[String]) = (
      TextAnalysis.winnowCut(spark, sf).collect().map(_.toString).toSeq,
      TextAnalysis.dedupSubstringsCut(spark, sf).collect().map(_.toString).toSeq,
      TextAnalysis.dedupLines(spark, sf).collect().map(_.toString).toSeq)
    val slow = snap()
    spark.conf.set("spark.graft.dedup.packedOccKey", "true")
    try {
      val fast = snap()
      assert(fast._1 == slow._1, "winnow_cut drifted under the packed key")
      assert(fast._2 == slow._2, "dedup_substrings_cut drifted under the packed key")
      assert(fast._3 == slow._3, "dedup_lines drifted under the packed key")
    } finally spark.conf.unset("spark.graft.dedup.packedOccKey")
  }

  test("perplexity_buckets: labels are monotone in nll and cuts are sample order statistics") {
    // 9 docs with strictly increasing rarity (doc k repeats a common token
    // 8 times then carries k distinct rare tokens), all in the sample
    // (sampleMod divides every id via id = 3k)
    val docs = (1 to 9).map { k =>
      val rare = (1 to k).map(j => s"rare_${k}_$j").mkString(" ")
      (3L * k, s"c c c c c c c c $rare")
    }.toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis.perplexityBucketsOf(docs).collect()
    graft.operators.Dedup.releaseIntermediates()
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Double]("nll"), r.getAs[String]("bucket"))).toMap
    assert(byId.size == 9)
    // monotone: every head nll <= every middle nll <= every tail nll
    def nlls(b: String) = byId.values.filter(_._2 == b).map(_._1)
    assert(nlls("head").nonEmpty && nlls("middle").nonEmpty && nlls("tail").nonEmpty)
    assert(nlls("head").max <= nlls("middle").min)
    assert(nlls("middle").max <= nlls("tail").min)
    // with n=9 distinct nll values the cuts are ranks 3 and 6 (ceil thirds):
    // exactly 3 docs per bucket
    assert(Seq("head", "middle", "tail").map(b => nlls(b).size) == Seq(3, 3, 3))
  }

  test("ccnet_filter: cuts are PER-LANGUAGE order statistics; unsampled docs still label") {
    // Two languages, three global-frequency tiers each (2 sampled docs per
    // tier; ids are multiples of 3 = the sample). Within each language the
    // ceil-third ranks land exactly on the tier boundaries, so the
    // expected bucket per doc is hand-derivable: tier1 → head,
    // tier2 → middle, tier3 → tail. Doc 1 (1 % 3 != 0, unsampled) shares
    // aa's tier-2 word and must still label middle through the broadcast
    // thresholds.
    val docs = Seq(
      (0L, "c c c c", "aa"), (3L, "c c c c", "aa"),
      (6L, "m m", "aa"), (9L, "m m", "aa"),
      (12L, "r", "aa"), (15L, "r", "aa"),
      (1L, "m m", "aa"),
      (18L, "cc cc cc cc cc cc", "bb"), (21L, "cc cc cc cc cc cc", "bb"),
      (24L, "mm mm mm", "bb"), (27L, "mm mm mm", "bb"),
      (30L, "rr", "bb"), (33L, "rr", "bb")
    ).toDF("doc_id", "text", "lang")
    val rows = graft.operators.TextAnalysis.ccnetFilterOf(docs).collect()
    graft.operators.Dedup.releaseIntermediates()
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("bucket"), r.getAs[Boolean]("keep"))).toMap
    val expected = Map[Long, String](
      0L -> "head", 3L -> "head", 6L -> "middle", 9L -> "middle",
      12L -> "tail", 15L -> "tail", 1L -> "middle",
      18L -> "head", 21L -> "head", 24L -> "middle", 27L -> "middle",
      30L -> "tail", 33L -> "tail")
    assert(byId.keySet == expected.keySet)
    expected.foreach { case (id, b) =>
      assert(byId(id)._1 == b, s"doc $id: expected $b, got ${byId(id)._1}")
      assert(byId(id)._2 == (b != "tail"), s"keep must be bucket != tail for doc $id")
    }
  }

  test("ccnet_filter: total, deterministic, and every corpus language cuts into all three buckets") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = graft.operators.TextAnalysis.ccnetFilter(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    val b = graft.operators.TextAnalysis.ccnetFilter(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == docs.count(), "every doc gets a verdict row")
    val perLang = a.groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[String]("bucket")).toSet }
    perLang.foreach { case (l, buckets) =>
      assert(buckets == Set("head", "middle", "tail"),
        s"lang $l should cut into all three buckets, got $buckets")
    }
  }

  test("doc_perplexity_kn: continuation diversity beats raw frequency (the 'francisco' reversal)") {
    // 'francisco' is the more frequent unigram (6 vs 5) but completes only
    // 2 distinct contexts; 'y' completes 5. Scoring docs that differ only
    // in that final word: JM's unigram interpolation prefers the frequent
    // word, KN's continuation probability prefers the diverse one.
    val docs = ((1 to 5).map(i => (i.toLong, "san francisco")) ++
      Seq((6L, "p y"), (7L, "q y"), (8L, "r y"), (9L, "s y"),
        (10L, "t francisco"), (11L, "t y"))).toDF("doc_id", "text")
    val kn = TextAnalysis.docPerplexityKnOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    val jm = TextAnalysis.docPerplexityBigramOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(kn(11L) < kn(10L), s"KN must prefer the high-continuation word: $kn")
    assert(jm(10L) < jm(11L), s"JM prefers the frequent word — the reversal KN fixes: $jm")
  }

  test("dedup_lines: corpus-wide keep-first at tumbling-unit granularity") {
    spark.conf.set("spark.graft.linedd.chunkWords", "2")
    try {
      val docs = Seq(
        (1L, "a b c d"), // chunks [a b][c d] — both first occurrences
        (2L, "a b x y"), // [a b] dup of doc1 -> cut; [x y] kept
        (3L, "c d"),     // [c d] dup of doc1 -> whole doc cut
        (4L, "p q p q"), // WITHIN-doc dup: second [p q] cut
        (5L, "x y z"))   // [x y] dup of doc2; tail unit [z] kept
        .toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis.dedupLinesOf(docs).collect().map(r =>
        r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chunks_cut"))).toMap
      assert(out(1L) == (("a b c d", 2L, 0L)))
      assert(out(2L) == (("x y", 2L, 1L)))
      assert(out(3L) == (("", 1L, 1L)))
      assert(out(4L) == (("p q", 2L, 1L)))
      assert(out(5L) == (("z", 2L, 1L)))
    } finally spark.conf.unset("spark.graft.linedd.chunkWords")
  }

  test("dedup_lines_report: per-source cut accounting matches the act step's rule") {
    spark.conf.set("spark.graft.linedd.chunkWords", "2")
    try {
      val docs = Seq(
        (1L, "a b c d", "srcA"), // both units first occurrences
        (2L, "a b x y", "srcB"), // [a b] cut
        (3L, "c d", "srcB"))     // [c d] cut
        .toDF("doc_id", "text", "source")
      val out = graft.operators.TextAnalysis.dedupLinesReportOf(docs).collect().map(r =>
        r.getAs[String]("source") ->
          (r.getAs[Long]("n_units"), r.getAs[Long]("n_units_cut"), r.getAs[Long]("cut_pct"))).toMap
      assert(out("srcA") == ((2L, 0L, 0L)))
      assert(out("srcB") == ((3L, 2L, 66L))) // 2*100 div 3 — truncating
    } finally spark.conf.unset("spark.graft.linedd.chunkWords")
  }

  test("doc_entropy: hand-computed Shannon entropy; constant doc scores zero") {
    val docs = Seq(
      (1L, "x x y y"),   // H = ln 2
      (2L, "a b c d"),   // H = ln 4
      (3L, "z z z"))     // H = 0
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.docEntropyOf(docs).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"), r.getAs[Double]("entropy"))).toMap
    assert(out(1L) == ((4L, 2L, 0.6931)))
    assert(out(2L) == ((4L, 4L, 1.3863)))
    assert(out(3L) == ((3L, 1L, 0.0)))
    // the repetitive doc is strictly lower-entropy than the varied one
    assert(out(1L)._3 < out(2L)._3)
  }

  test("ngram_novelty: planted half-novel crawl doc prices exactly; short doc emits NULL bp, never drops") {
    // seen corpus (ids not ≡ 0 mod noveltyMod) carries grams of 'a b c d e';
    // the new doc re-serves 'a b c' / 'b c d' / 'c d e' and adds three
    // novel grams → 3 of 6 distinct trigrams novel = 5000 bp exactly
    val mod = graft.operators.GraftConf.noveltyMod
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (mod.toLong, "a b c d e x y z"),
      (2L * mod, "a b"))                    // too short for one trigram
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.ngramNoveltyOf(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out.keySet == Set(mod.toLong, 2L * mod),
      "every new-crawl doc is scored, nothing else")
    assert(out(mod.toLong) == ((6L, 3L, Some(5000L))), s"got ${out(mod.toLong)}")
    assert(out(2L * mod) == ((0L, 0L, None)), "gram-less doc stays with NULL bp")
    // real corpus: population = every %mod doc, bp within [0, 10000]
    val real = graft.operators.TextAnalysis.ngramNovelty(spark, sf).collect()
    val expectIds = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % mod === 0).count()
    assert(real.length == expectIds)
    real.foreach { r =>
      Option(r.get(3)).map(_.asInstanceOf[Long]).foreach(bp =>
        assert(bp >= 0L && bp <= 10000L))
    }
  }

  test("ngramNoveltyBloomFrom: conservative lower bound on exact novelty, zero false novelty, bounded FPR loss") {
    import graft.operators.{GraftConf, TextAnalysis}
    val mod = GraftConf.noveltyMod
    val docs = graft.sources.Tables.documents(spark, sf)
    val isNew = col("doc_id") % mod === 0
    val exact = TextAnalysis.ngramNoveltyOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toMap
    val bloom = TextAnalysis.ngramNoveltyBloomFrom(docs, isNew).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel_min"))).toMap
    assert(bloom.keySet == exact.keySet, "sketch sweep must cover the same crawl docs")
    var lostNovel = 0L; var totalNovel = 0L
    for ((id, (ng, novel)) <- exact) {
      val (bg, bnovel) = bloom(id)
      assert(bg == ng, s"doc $id: gram universe must not depend on the membership structure")
      // no false NOVELTY: a sketch-missed gram is definitely novel, so the
      // sketch count can undercount (false positives) but never exceed
      assert(bnovel <= novel, s"doc $id: sketch reported novelty above exact")
      lostNovel += novel - bnovel; totalNovel += novel
    }
    assert(totalNovel > 0, "corpus must exercise the novel path")
    // 2^23 bits vs this corpus's gram count: FPR-driven undercount is tiny
    assert(lostNovel <= math.max(1L, totalNovel / 100),
      s"$lostNovel/$totalNovel novel grams lost to sketch noise — too lossy at default sizing")
  }

  test("dedup_lines: untouched docs round-trip their text exactly") {
    val orig = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.operators.TextAnalysis.dedupLines(spark, sf).collect()
    assert(out.length == orig.size)
    out.foreach { r =>
      if (r.getAs[Long]("n_chunks_cut") == 0L)
        assert(r.getAs[String]("clean_text") == orig(r.getAs[Long]("doc_id")))
    }
    // the synthetic corpus shares 12-word windows rarely but not never at
    // unit boundaries — the invariant that matters: cut accounting stays
    // inside the unit count
    out.foreach(r => assert(r.getAs[Long]("n_chunks_cut") <= r.getAs[Long]("n_chunks")))
  }
}
