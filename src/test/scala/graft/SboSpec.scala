package graft

import graft.operators.TextAnalysis

/** `doc_perplexity_sbo` (Brants et al. 2007 Stupid Backoff): trigram count
  * ratios with α-penalized backoff, trained on the doc_id-modulus slice.
  * Corpus-typical word ORDER must outscore the same bag of words scrambled
  * (the trigram level sees order; backoff pays α per level), every position
  * is scored at exactly one level, and OOV words stay finite via the
  * +1-smoothed unigram floor.
  */
class SboSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // train slice (even ids, default sboTrainMod = 2)
      (0L, "the cat sat on the mat the cat sat on the mat", "en", "web"),
      (2L, "dogs bark loud", "en", "web"),
      // score: exact train phrasing — every position >= 3 is a trigram hit
      (1L, "the cat sat on the mat", "en", "web"),
      // score: the SAME word multiset scrambled — no trigram of it occurs
      // in train, so every tail position backs off
      (3L, "mat the on cat sat the", "en", "web"),
      // score: fully OOV words — unigram floor only, still finite
      (5L, "zebra quagga okapi", "en", "web"),
      // score: single-token doc — position 1 only
      (7L, "solo", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("levels partition positions; in-order text outscores its scrambled twin") {
    val rows = TextAnalysis.docPerplexitySboOf(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    rows.foreach { case (id, (n, tri, big, uni, _)) =>
      assert(tri + big + uni == n, s"doc $id levels don't partition")
    }
    // exact train phrasing: 6 tokens = 1 uni (pos 1) + 1 big (pos 2) + 4 tri
    assert(rows(1L)._1 == 6L && rows(1L)._2 == 4L &&
      rows(1L)._3 == 1L && rows(1L)._4 == 1L, s"got ${rows(1L)}")
    // scrambled twin: zero trigram hits
    assert(rows(3L)._2 == 0L, s"scrambled doc hit a trigram: ${rows(3L)}")
    // word order is what separates them — same multiset, strict nll gap
    assert(rows(1L)._5 < rows(3L)._5,
      s"in-order ${rows(1L)._5} !< scrambled ${rows(3L)._5}")
    // OOV doc: all unigram, finite score
    assert(rows(5L) == ((3L, 0L, 0L, 3L, rows(5L)._5)))
    assert(!rows(5L)._5.isNaN && !rows(5L)._5.isInfinite)
    // single-token doc scores its one position at the unigram level
    assert(rows(7L)._1 == 1L && rows(7L)._4 == 1L)
  }

  test("real corpus: partition identity holds and the trigram level is reachable") {
    val rows = TextAnalysis.docPerplexitySbo(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, tri, big, uni) => tri + big + uni == n })
    // the held-out LM is non-degenerate both ways: some positions score at
    // the trigram level, some back off
    assert(rows.exists(_._2 > 0L), "no trigram hits anywhere")
    assert(rows.exists(r => r._3 + r._4 > 0L), "backoff never fired")
  }
}
