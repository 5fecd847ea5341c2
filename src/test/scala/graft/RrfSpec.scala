package graft

import graft.operators.Similarity

/** `hybrid_search_rrf` (Cormack et al. 2009): reciprocal-rank fusion of the
  * dense cosine list and the query-by-example BM25 list. The planted corpus
  * makes the two signals DISAGREE — the lexical winner shares no embedding
  * direction, the dense winner shares one word — and fusion must put the
  * both-lists doc first.
  */
class RrfSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def basis(i: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)

  private def tilt(i: Int, j: Int, t: Double): Seq[Double] =
    Seq.tabulate(64)(d =>
      if (d == i) math.sqrt(1.0 - t * t) else if (d == j) t else 0.0)

  test("fusion consensus: the doc on BOTH lists outranks each single-list winner") {
    import spark.implicits._
    // query doc 0; doc 5 = lexical-only hit (4 shared words, orthogonal
    // embedding), doc 6 = on both lists (1 shared word + cos .98), doc 7 =
    // dense-only (cos .92, no shared words), doc 8 = on neither.
    val docs = Seq(
      (0L, "alpha bravo charlie delta echo"),
      (5L, "alpha bravo charlie delta foxtrot"),
      (6L, "alpha zulu yankee xray whiskey"),
      (7L, "one two three four five"),
      (8L, "six seven eight nine ten")
    ).toDF("doc_id", "text")
    val embs = Seq(
      0L -> basis(0), 5L -> basis(5), 6L -> tilt(0, 40, 0.2),
      7L -> tilt(0, 41, 0.4), 8L -> basis(8)
    ).toDF("vec_id", "embedding")
    withConf("spark.graft.ann.queries" -> "1", "spark.graft.rrf.depth" -> "2") {
      val rows = Similarity.hybridSearchRrfOf(docs, embs).collect()
        .map(r => (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
        .sortBy(_._1)
      // dense list = {6 (r1), 7 (r2)}; lexical = {5 (r1), 6 (r2)}
      assert(rows.map(_._2).toSeq == Seq(6L, 5L, 7L), s"got $rows")
      val byDoc = rows.map(r => r._2 -> r).toMap
      assert(byDoc(6L)._3 == Some(1L) && byDoc(6L)._4 == Some(2L))
      assert(byDoc(5L)._3 == None && byDoc(5L)._4 == Some(1L))
      assert(byDoc(7L)._3 == Some(2L) && byDoc(7L)._4 == None)
      // exact scaled-integer fusion arithmetic
      val S = 1000000000000000L
      assert(byDoc(6L)._5 == S / 61 + S / 62)
      assert(byDoc(5L)._5 == S / 61)
      assert(byDoc(7L)._5 == S / 62)
    }
  }

  test("real corpus: rrf_s matches the integer formula and ranks are (score desc, id)") {
    val rows = Similarity.hybridSearchRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
    assert(rows.nonEmpty)
    val S = 1000000000000000L
    val k = Similarity.RrfK
    val depth = Similarity.RrfDepth
    rows.foreach { case (q, _, d, rd, rl, s) =>
      assert(rd.nonEmpty || rl.nonEmpty)
      assert(rd.forall(_ <= depth) && rl.forall(_ <= depth))
      val expect = rd.map(r => S / (k + r)).getOrElse(0L) +
        rl.map(r => S / (k + r)).getOrElse(0L)
      assert(s == expect, s"($q,$d) rrf_s $s != $expect")
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(r => (-r._6, r._3)).map(_._3).toSeq
      assert(g.sortBy(_._2).map(_._3).toSeq == sorted, s"query $q rank order")
      assert(g.length <= 2 * depth)
    }
  }
}
