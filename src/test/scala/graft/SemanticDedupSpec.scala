package graft

import graft.operators.Dedup

/** `dedup_semantic` (SemDeDup, Abbas et al. 2023): k-means cells block the
  * cosine pair graph, connected components form the duplicate groups, and
  * the keep rule is the paper's — the member FURTHEST from its cluster
  * centroid survives (least prototypical), not the lowest id.
  */
class SemanticDedupSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def basis(i: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)

  /** basis(i) tilted toward dim j by angle ~asin(t) — unit length, so
    * cosine to basis(i) is sqrt(1-t²) and larger t sits further from a
    * centroid near basis(i).
    */
  private def tilt(i: Int, j: Int, t: Double): Seq[Double] =
    Seq.tabulate(64)(d =>
      if (d == i) math.sqrt(1.0 - t * t) else if (d == j) t else 0.0)

  test("keep rule: the furthest-from-centroid member survives, not the min id") {
    import spark.implicits._
    // one semantic group planted around basis(0) with monotonically
    // increasing tilt: vec 0 is the closest to the trained centroid, vec 3
    // the furthest — SemDeDup must keep 3, while a min-id rule keeps 0.
    // vec 1 seeds the second cell; vec 4 shares cell 0 but is orthogonal
    // to everything (a singleton group).
    val embs = Seq(
      0L -> basis(0),
      1L -> basis(1),
      2L -> tilt(0, 40, 0.10),
      3L -> tilt(0, 41, 0.20),
      4L -> basis(2)
    ).toDF("vec_id", "embedding")
    withConf("spark.graft.kmeans.k" -> "2") {
      val rows = Dedup.dedupSemanticOf(embs).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .sortBy(_._1)
      val byGroup = rows.groupBy(_._2)
      // the planted trio is one group (id 0 is the min member id)
      assert(byGroup(0L).map(_._1).toSet == Set(0L, 2L, 3L),
        s"expected group {0,2,3}, got ${rows.mkString(", ")}")
      assert(byGroup(0L).forall(_._3 == 3L))
      // SemDeDup keeps the least prototypical member — vec 3, NOT min id 0
      assert(byGroup(0L).collect { case (id, _, _, true) => id }.toSeq == Seq(3L))
      // singletons keep themselves
      assert(rows.filter(r => Set(1L, 4L)(r._1))
        .forall(r => r._2 == r._1 && r._3 == 1L && r._4))
      Dedup.releaseIntermediates()
    }
  }

  test("real corpus: one keeper per group, chosen by (max d2, min id)") {
    val rows = Dedup.dedupSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._3).foreach { case (gid, members) =>
      assert(members.head._4 == members.length,
        s"group $gid size ${members.head._4} != ${members.length}")
      // group id is the min member id (CC min-label convention)
      assert(gid == members.map(_._1).min)
      // exactly one keeper: the max-d2 member, ties to lower vec_id
      val expected = members.minBy { case (id, d2, _, _, _) => (-d2, id) }._1
      assert(members.collect { case (id, _, _, _, true) => id }.toSeq == Seq(expected),
        s"group $gid keeper != argmax d2")
    }
    Dedup.releaseIntermediates()
  }
}
