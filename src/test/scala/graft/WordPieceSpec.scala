package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftConf, Unigram, WordPiece}

/** `wordpiece_segment` vs a from-scratch greedy MaxMatch reference (a third
  * independent implementation next to the DuckDB doubling-unroll oracle),
  * plus the greedy-vs-Viterbi relationship `tokenizer_compare` reports.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch greedy longest-match-first over a collected inventory. */
  private def greedy(word: String, inv: Map[String, java.math.BigDecimal],
      P: Int): (List[String], java.math.BigDecimal) = {
    var pos = 0
    val out = scala.collection.mutable.ListBuffer[String]()
    var sc = java.math.BigDecimal.ZERO
    while (pos < word.length) {
      val j = (math.min(P, word.length - pos) to 1 by -1)
        .find(j => inv.contains(word.substring(pos, pos + j))).get
      val piece = word.substring(pos, pos + j)
      out += piece
      sc = sc.add(inv(piece))
      pos += j
    }
    (out.toList, sc)
  }

  private def round4(d: java.math.BigDecimal): Double =
    java.math.BigDecimal.valueOf(d.doubleValue)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  test("every corpus word segments exactly as from-scratch greedy MaxMatch under the same model") {
    val docs = sources.Tables.documents(spark, sf)
    val P = GraftConf.unigramMaxPiece
    val inv = Unigram.unigramModelOf(docs).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[java.math.BigDecimal]("lp")).toMap
    graft.operators.Dedup.releaseIntermediates()
    val got = WordPiece.wordpieceSegment(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    assert(got.nonEmpty)
    got.foreach { r =>
      val w = r.getAs[String]("word")
      val (seg, sc) = greedy(w, inv, P)
      assert(r.getAs[String]("segmentation").split("\\|").toList == seg, s"word '$w'")
      assert(r.getAs[Long]("n_pieces") == seg.length, s"word '$w'")
      assert(r.getAs[Double]("score") == round4(sc), s"word '$w' score")
      assert(seg.mkString("") == w, s"word '$w': pieces must tile the word")
    }
  }

  test("greedy is suboptimal where MaxMatch commits early; Viterbi takes the better split") {
    // inventory prices ab|c badly and a|bc well: greedy still grabs 'ab'
    // first (longest match), the unigram DP finds the optimum
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val model = Seq(("ab", -1.0), ("c", -5.0), ("a", -1.5), ("bc", -1.0), ("b", -5.0))
      .toDF("piece", "lp0")
      .select(col("piece"), col("lp0").cast("decimal(18,6)").as("lp"))
    val wp = WordPiece.greedyWithModel(docs, model).collect().head
    graft.operators.Dedup.releaseIntermediates()
    assert(wp.getAs[String]("segmentation") == "ab|c")
    assert(wp.getAs[Double]("score") == -6.0)
    val uni = Unigram.segmentWithModel(docs, model).collect().head
    graft.operators.Dedup.releaseIntermediates()
    assert(uni.getAs[String]("segmentation") == "a|bc")
    assert(uni.getAs[Double]("score") == -2.5)
  }

  test("corpus-wide: greedy score never exceeds the Viterbi optimum under the shared model") {
    val uni = Unigram.unigramSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Double]("score")).toMap
    graft.operators.Dedup.releaseIntermediates()
    val wp = WordPiece.wordpieceSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Double]("score")).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(wp.keySet == uni.keySet)
    // scores are independently 4-dp rounded, so allow the half-ulp seam
    wp.foreach { case (w, s) => assert(s <= uni(w) + 0.0001, s"word '$w'") }
  }

  test("tokenizer_compare ≡ the two per-word piece tables rolled up over the corpus by language") {
    val docs = sources.Tables.documents(spark, sf)
    val uni = Unigram.unigramSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("n_pieces"), r.getAs[String]("segmentation"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    val wp = WordPiece.wordpieceSegment(spark, sf).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("n_pieces"), r.getAs[String]("segmentation"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    val L = GraftConf.unigramMaxWordLen
    val toks = docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= L).collect()
    val expected = toks.groupBy(_.getAs[String]("lang")).map { case (lang, rows) =>
      val words = rows.map(_.getAs[String]("w"))
      lang -> (words.length.toLong,
        words.map(w => uni(w)._1).sum, words.map(w => wp(w)._1).sum,
        words.distinct.count(w => uni(w)._2 != wp(w)._2).toLong)
    }
    val got = WordPiece.tokenizerCompare(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("uni_pieces"),
          r.getAs[Long]("wp_pieces"), r.getAs[Long]("n_diff_vocab"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(got == expected)
  }
}
