package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** `dedup_keep_unified` semantics: the union edge set (exact + MinHash +
  * SRP embedding) feeds ONE connected-components pass and ONE keep-list.
  * What the per-lane keep-lists get wrong — and this one must get right:
  *
  *  1. a doc similar ONLY in embedding space (no shingle overlap) must drop
  *     here, while the lexical-only keep-list keeps it;
  *  2. lanes must BRIDGE: lexical a~b plus semantic b~c is one 3-doc
  *     cluster with one canonical, not two 2-doc clusters keeping two docs;
  *  3. exact dups too short to shingle (MinHash-invisible) must still drop.
  */
class DedupUnifiedSpec extends SparkSpec {

  private def basis(i: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)

  /** cos(basis(i), near(i, j)) = 0.98 — a planted semantic near-dup. */
  private def near(i: Int, j: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 0.98 else if (d == j) 0.19899749371 else 0.0)

  private val lex = "alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four"

  // disjoint vocabulary from `lex` so clusters A and C never touch lexically
  private val lex2 = "amber birch cedar dogwood elm fir ginkgo hawthorn ironwood " +
    "juniper katsura larch maple nutmeg oak pine quince rowan spruce teak " +
    "umbrella vine walnut xylem yew zelkova red green blue gold"

  private def corpus: (DataFrame, DataFrame) = {
    val docs = Seq(
      // cluster A: lexical near-dup pair (long shared prefix)
      (1L, lex + " ending", "en", "web"),
      (2L, lex + " different", "en", "web"),
      // cluster B: semantic-ONLY pair — zero shared words
      (3L, "spark catalyst optimizer rewrites logical plans before physical selection", "en", "web"),
      (4L, "pasta garlic butter basil dinner recipe cooking notes tonight", "en", "web"),
      // cluster C: lexical 5~6 bridged to semantic 6~7
      (5L, lex2 + " bridgehead", "en", "wiki"),
      (6L, lex2 + " bridgetail", "en", "wiki"),
      (7L, "entirely fresh vocabulary about mountain weather patterns and snowfall", "en", "wiki"),
      // unique doc
      (8L, "solitary document sharing no structure with anything else present here", "en", "web"),
      // exact dups too short to shingle (2 words < shingleWords=3)
      (9L, "hello world", "en", "crawl"),
      (10L, "hello world", "en", "crawl"))
    val embs = Seq(
      1L -> basis(0), 2L -> basis(1),
      3L -> basis(10), 4L -> near(10, 40),   // semantic-only pair
      5L -> basis(2),
      6L -> basis(11), 7L -> near(11, 41),   // the semantic bridge
      8L -> basis(3), 9L -> basis(4), 10L -> basis(5))
    import spark.implicits._
    (docs.toDF("doc_id", "text", "lang", "source"),
      embs.map { case (id, e) => (id, e) }.toDF("vec_id", "embedding"))
  }

  test("semantic-only dup drops in unified keep but survives the lexical-only keep") {
    val (docs, embs) = corpus
    val unified = Dedup.dedupKeepUnifiedFrom(docs, embs).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    // doc 4 is a dup of 3 ONLY in embedding space
    assert(!unified.contains(4L), s"semantic dup must drop, kept: ${unified.keySet}")
    assert(unified(3L) == ("canonical", 2L))
    // the lexical-only keep-list cannot see it
    val lexicalOnly = Dedup.dedupKeepFrom(docs,
        Dedup.clustersFromPairs(Dedup.minhashPairsOf(docs).select("doc_a", "doc_b")))
      .collect().map(_.getLong(0)).toSet
    assert(lexicalOnly.contains(4L),
      "planting broken: doc 4 should be lexically invisible")
    Dedup.releaseIntermediates()
  }

  test("lanes bridge transitively: lexical 5~6 + semantic 6~7 = one cluster, one canonical") {
    val (docs, embs) = corpus
    val rows = Dedup.dedupKeepUnifiedFrom(docs, embs).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(rows(5L) == ("canonical", 3L), s"got ${rows.get(5L)}")
    assert(!rows.contains(6L) && !rows.contains(7L))
    Dedup.releaseIntermediates()
  }

  test("dedup_keep_best keeps the highest-quality member, not the min id") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // three lexical near-dups sharing a long base; doc 12 gets extra
    // DISTINCT vocabulary → strictly higher type-token/length composite
    val base = lex // 30 words, all distinct
    val docs = Seq(
      (10L, base + " t t t t t t t t", "en", "web"),     // repeated filler: low ttr
      (11L, base + " u u u u u u u u", "en", "web"),
      (12L, base + " quartz ember drift loom vale crane moss pike", "en", "web"),
      (13L, "standalone text unrelated to the cluster in every word choice", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val scores = TextAnalysis.qualityIntScoreOf(docs)
    val clusters = Dedup.clustersFromPairs(
      Dedup.minhashPairsOf(docs).select("doc_a", "doc_b"))
    val best = Dedup.dedupKeepBestFrom(docs, clusters, scores).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    // sanity: the three formed one cluster, and the planted best is doc 12
    assert(best.keySet == Set(12L, 13L), s"kept: ${best.keySet}")
    assert(best(12L) == ("best", 3L) && best(13L) == ("unique", 1L))
    // min-id keep would have chosen doc 10 — the two policies must disagree
    val minId = Dedup.dedupKeepFrom(docs, clusters).collect().map(_.getLong(0)).toSet
    assert(minId.contains(10L) && !minId.contains(12L))
    Dedup.releaseIntermediates()
  }

  test("media lane: same-payload same-modality docs pair; modality partitions byte-twins") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq(
      (9L, "hello world", "en", "crawl"),  // modality 0
      (10L, "hello world", "en", "crawl"), // modality 1 — same bytes, other media type
      (12L, "same clip bytes here", "en", "crawl"), // modality 0
      (15L, "same clip bytes here", "en", "crawl"), // modality 0 — the planted media pair
      (14L, "unrelated payload content entirely", "en", "crawl"))
      .toDF("doc_id", "text", "lang", "source")
    val edges = Dedup.mediaEdgesOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 12~15 pair; 9~10 must NOT (different modality despite identical bytes)
    assert(edges == Set((12L, 15L)), s"got $edges")
    // and the lane is wired into the unified tagged edge set
    val embs = Seq(9L, 10L, 12L, 14L, 15L)
      .map(i => (i, Seq.tabulate(64)(d => if (d == i.toInt % 64) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val tagged = Dedup.taggedPairsOf(docs, embs)
      .filter(org.apache.spark.sql.functions.col("lane") === "media").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.releaseIntermediates()
    assert(tagged == Set((12L, 15L)))
  }

  test("dedup_media: canonical-hash groups on the corpus — canonical is min id, modality-pure") {
    import graft.operators.Multimodal
    val groups = Multimodal.dedupMedia(spark, sf).collect()
    assert(groups.nonEmpty, "media dedup vacuous at this sf — payload canonicalization broken")
    groups.foreach { g =>
      val members = g.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length == g.getAs[Long]("n_docs") && members.length > 1)
      assert(members.min == g.getAs[Long]("canonical_doc"))
      // modality purity: every member derives the group's modality
      val mods = members.map(_ % 3).toSet
      assert(mods.size == 1, s"mixed-modality media group: $g")
    }
  }

  test("winnow lane: doc-in-doc containment pairs where Jaccard misses; bystanders don't") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // doc 2 is a 20-word span quoted wholesale inside 60-word doc 1:
    // Jaccard = 20/60 — below the MinHash tau — but every winnow
    // fingerprint of doc 2 is selected in doc 1 too (all its windows are
    // windows of doc 1), so containment is ~100%
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 20).map(i => s"l$i").mkString(" ") + " " + span + " " +
        (21 to 40).map(i => s"l$i").mkString(" ")),
      (2L, span),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val contain = TextAnalysis.dedupWinnowContainOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("c_pct")).toMap
    assert(contain.contains((1L, 2L)), s"containment pair missed: $contain")
    assert(contain((1L, 2L)) >= graft.operators.GraftConf.winnowTauPct.toLong)
    assert(contain.keySet == Set((1L, 2L)), s"bystander paired: $contain")
    // the Jaccard lane structurally misses this pair
    val mh = Dedup.minhashPairsOf(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!mh.contains((1L, 2L)), s"minhash unexpectedly paired: $mh")
    // and the lane reaches the unified tagged edge set
    val embs = Seq(1L, 2L, 3L)
      .map(i => (i, Seq.tabulate(64)(d => if (d == i.toInt) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val tagged = Dedup.taggedPairsOf(docs, embs)
      .filter(org.apache.spark.sql.functions.col("lane") === "winnow").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.releaseIntermediates()
    assert(tagged == Set((1L, 2L)))
  }

  test("dedup_lanes_report: combination counts sum to the distinct union pair count") {
    val report = Dedup.dedupLanesReport(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Dedup.releaseIntermediates()
    // valid = every non-empty sorted combination of the five lanes
    val lanes = Seq("exact", "media", "minhash", "srp", "winnow")
    val valid = (1 to lanes.size).flatMap(lanes.combinations)
      .map(_.mkString("+")).toSet
    assert(report.keySet.subsetOf(valid), s"unexpected combos: ${report.keySet -- valid}")
    // the corpus plants both lexical and embedding near-dups, so both
    // families must appear, and totals must tile the union exactly
    assert(report.keys.exists(_.contains("minhash")) && report.keys.exists(_.contains("srp")))
    val docs = graft.sources.Tables.documents(spark, sf)
    val union = Dedup.exactEdgesOf(docs).select("doc_a", "doc_b")
      .unionByName(Dedup.mediaEdgesOf(docs))
      .unionByName(Dedup.minhashPairsOf(docs).select("doc_a", "doc_b"))
      .unionByName(Dedup.srpPairsOf(graft.sources.Tables.embeddings(spark, sf))
        .selectExpr("id_a as doc_a", "id_b as doc_b"))
      .unionByName(graft.operators.TextAnalysis.dedupWinnowContainOf(docs)
        .select("doc_a", "doc_b"))
      .distinct().count()
    assert(report.values.sum == union)
    Dedup.releaseIntermediates()
  }

  test("exact dups below shingle width drop via the exact lane; uniques survive") {
    val (docs, embs) = corpus
    val rows = Dedup.dedupKeepUnifiedFrom(docs, embs).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(rows(9L) == ("canonical", 2L) && !rows.contains(10L))
    assert(rows(8L) == ("unique", 1L))
    // lexical pair (1, 2) still handled exactly as dedup_keep would
    assert(rows(1L) == ("canonical", 2L) && !rows.contains(2L))
    Dedup.releaseIntermediates()
  }
}
