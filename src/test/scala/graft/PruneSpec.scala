package graft

import graft.operators.{Dedup, Selection}

/** `prototype_prune` (Sorscher et al. 2022): per-trained-cell difficulty
  * ranking drops the floor(pct·n/100) most prototypical (closest to
  * centroid) members; the keep decision is an exact integer
  * cross-multiply, floor semantics, ties to lower vec_id.
  */
class PruneSpec extends SparkSpec {

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

  test("planted cell: the closest-to-centroid prefix drops, singletons survive") {
    import spark.implicits._
    // cell 0 holds {0, 2, 3, 4} at strictly increasing distance from the
    // trained centroid (0 closest, 4 an orthogonal outlier); cell 1 is the
    // singleton seed vec 1. At dropPct=50, floor(50·4/100)=2 → vecs 0 and 2
    // drop, 3 and 4 survive; the singleton survives (floor(0.5)=0).
    val embs = Seq(
      0L -> basis(0),
      1L -> basis(1),
      2L -> tilt(0, 40, 0.10),
      3L -> tilt(0, 41, 0.20),
      4L -> basis(2)
    ).toDF("vec_id", "embedding")
    withConf("spark.graft.kmeans.k" -> "2",
        "spark.graft.prune.dropPct" -> "50") {
      val rows = Selection.prototypePruneOf(embs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .sortBy(_._1)
      val cell0 = rows.filter(_._2 == rows.find(_._1 == 0L).get._2)
      assert(cell0.map(_._1).toSet == Set(0L, 2L, 3L, 4L))
      assert(cell0.forall(_._4 == 4L))
      val kept = rows.filter(_._5).map(_._1).toSet
      assert(kept == Set(1L, 3L, 4L), s"kept $kept")
      // ranks are the planted distance order
      assert(cell0.sortBy(_._3).map(_._1).toSeq == Seq(0L, 2L, 3L, 4L))
      Dedup.releaseIntermediates()
    }
  }

  test("real corpus: per-cell keep count is exactly n - floor(pct*n/100), drops are the low-d2 prefix") {
    val pct = Selection.PruneDropPct
    val rows = Selection.prototypePrune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val n = members.length
      assert(members.head._5 == n)
      val dropped = members.filterNot(_._6)
      assert(dropped.length == pct * n / 100,
        s"cell $cell dropped ${dropped.length} of $n at pct=$pct")
      // the dropped set is exactly the lowest (d2, vec_id) ranks
      val ordered = members.sortBy(m => (m._3, m._1)).map(_._1).toSeq
      assert(dropped.map(_._1).toSet == ordered.take(dropped.length).toSet)
      // rank column agrees with the (d2, vec_id) order
      assert(members.sortBy(_._4).map(_._1).toSeq == ordered)
    }
    Dedup.releaseIntermediates()
  }
}
