package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder semantics on planted corpora: frequency-weighted
  * argmax, lexicographic tie-break, greedy non-overlapping application,
  * exhaustion before the merge budget, and encode token accounting.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }.toDF("doc_id", "text")

  test("first merge is the frequency-weighted argmax pair") {
    val (_, merges) = Bpe.bpeTrainedOf(docs("xy xy xy zw"))
    assert(merges.head == (("x", "y", 3L)))
  }

  test("count ties break lexicographically on (left, right)") {
    // (d,b) and (c,a) both weigh 1 — (c,a) sorts first
    val (_, merges) = Bpe.bpeTrainedOf(docs("db ca"))
    assert(merges.head._1 == "c" && merges.head._2 == "a")
  }

  test("merges apply greedily left-to-right, non-overlapping, and chain") {
    // "aaaa": (a,a) appears at 3 positions -> merge 1 = (a,a,3); greedy
    // non-overlap gives [aa,aa]; merge 2 = (aa,aa,1); then no pairs remain
    // anywhere, so the loop exhausts at 2 merges despite the budget of 8.
    val (vocab, merges) = Bpe.bpeTrainedOf(docs("aaaa"))
    assert(merges == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
    val enc = vocab.select("enc").as[String].collect().head
    assert(enc == "||aaaa||")
  }

  test("pair-free corpus learns nothing; encode falls back to one token per char") {
    val d = docs("a b a")
    val (_, merges) = Bpe.bpeTrainedOf(d)
    assert(merges.isEmpty)
    val out = Bpe.bpeEncodeOf(d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_words") == 3L)
    assert(out.head.getAs[Long]("n_bpe_tokens") == 3L)
  }

  test("encode re-prices every word under the learned merges") {
    // word weights: abab x3, cd x1. (a,b) w=6 -> [ab,ab]; then (ab,ab)
    // w=3 -> [abab]; then (c,d) w=1 -> [cd]; exhausted at 3 merges.
    val d = docs("abab abab cd", "abab")
    val (_, merges) = Bpe.bpeTrainedOf(d)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b"), ("ab", "ab"), ("c", "d")))
    val out = Bpe.bpeEncodeOf(d).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    assert(out(1L) == ((3L, 3L))) // abab + abab + cd -> one token each
    assert(out(2L) == ((1L, 1L)))
  }

  test("bpe_vocab on a planted corpus: fully-merged words become whole-word symbols") {
    // after (a,b), (ab,ab), (c,d) the vocabulary collapses to two symbols
    val (vocab, _) = Bpe.bpeTrainedOf(docs("abab abab cd", "abab"))
    val syms = vocab
      .select(col("w"),
        explode(filter(split(col("enc"), "\\|\\|"), x => x =!= lit(""))).as("sym"))
      .groupBy("sym").sum("w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(syms == Map("abab" -> 3L, "cd" -> 1L))
  }

  test("bpe_fertility: the under-represented language fragments into more tokens per word") {
    // corpus dominated by 'hi' words: merges learn (h,i) first and exhaust
    // on the majority language; the minority 'wxyz' words never merge and
    // price at 4 tokens per word vs 1 — exactly the skew fertility reports
    spark.conf.set("spark.graft.bpe.merges", "1")
    try {
      val docs = Seq(
        (1L, "hi hi hi hi", "en"), (2L, "hi hi", "en"),
        (3L, "wxyz wxyz", "xx"))
        .toDF("doc_id", "text", "lang")
      val tok = Bpe.bpeTokensOf(docs)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("n_bpe_tokens")).as("t"), sum(col("n_words")).as("w"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      graft.operators.Dedup.releaseIntermediates()
      assert(tok("en") == ((6L, 6L)))   // fertility 1.0
      assert(tok("xx") == ((8L, 2L)))   // fertility 4.0
    } finally spark.conf.unset("spark.graft.bpe.merges")
  }

  test("stored merge table: encodeFrom is bit-equal to the in-memory encode; drift fails fast") {
    val path = java.nio.file.Files.createTempDirectory("bpe_idx").toString + "/merges"
    Bpe.writeMerges(spark, sf, path)
    val docs = graft.sources.Tables.documents(spark, sf)
    val direct = Bpe.bpeEncodeOf(docs).collect().map(_.toString).sorted
    graft.operators.Dedup.releaseIntermediates()
    val stored = Bpe.encodeFrom(spark, path, docs).collect().map(_.toString).sorted
    assert(stored.sameElements(direct))
    // conf drift: a table trained at merges=8 must not silently serve merges=5
    spark.conf.set("spark.graft.bpe.merges", "5")
    try {
      val e = intercept[IllegalStateException](Bpe.encodeFrom(spark, path, docs))
      assert(e.getMessage.contains("merges=8") && e.getMessage.contains("merges=5"))
    } finally spark.conf.unset("spark.graft.bpe.merges")
  }

  test("pack_sequences_bpe: packing invariants hold under the learned token price") {
    val out = graft.operators.Curation.packSequencesBpe(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    val enc = Bpe.bpeEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    graft.operators.Dedup.releaseIntermediates()
    val budget = graft.operators.GraftConf.packSeqTokens
    assert(out.length == enc.size)
    out.foreach { r =>
      // the packed price IS the encode's price, and the chop arithmetic holds
      assert(r.getAs[Long]("n_tokens") == enc(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("seq_offset") < budget)
      val spanSeqs = (r.getAs[Long]("seq_offset") + r.getAs[Long]("n_tokens") - 1) / budget + 1
      assert(r.getAs[Long]("n_seqs") == spanSeqs)
    }
  }

  test("corpus run: rank-complete table, new_sym = left || right, budget respected") {
    val t = Bpe.bpeTrain(spark, sf).collect()
    assert(t.nonEmpty && t.length <= graft.operators.GraftConf.bpeMerges)
    t.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[String]("new_sym") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      assert(r.getAs[Long]("weight") >= 1L)
    }
    graft.operators.Dedup.releaseIntermediates()
  }
}
