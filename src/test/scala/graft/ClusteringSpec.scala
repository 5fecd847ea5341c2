package graft

import graft.operators.Clustering

/** `kmeans_train` vs a from-scratch in-memory Lloyd reference — a THIRD
  * independent implementation (next to the DuckDB oracle) of the same exact
  * integer-grid algorithm, compared assignment-for-assignment.
  */
class ClusteringSpec extends SparkSpec {

  /** Mirror of the engines' round-half-up on the shortest decimal repr of a
    * double (java BigDecimal.valueOf = Double.toString).
    */
  private def gridRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  test("kmeans_train matches an in-memory exact Lloyd reference") {
    val rows = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
    val vecs: Array[(Long, Array[Long])] = rows.map { r =>
      val arr = r.getSeq[Float](1).map(f => gridRound(f.toDouble * Clustering.Scale)).toArray
      (r.getAs[Long]("vec_id"), arr)
    }.sortBy(_._1)

    def d2(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def assign(cents: Map[Long, Array[Long]]): Array[(Long, Long, Long)] =
      vecs.map { case (id, v) =>
        val (cid, dist) = cents.toSeq.map { case (c, ce) => (c, d2(v, ce)) }
          .minBy { case (c, dist) => (dist, c) }
        (id, cid, dist)
      }

    val cent0: Map[Long, Array[Long]] =
      vecs.filter(_._1 < Clustering.K).map { case (id, v) => id -> v }.toMap
    val a1 = assign(cent0)
    val members = a1.groupBy(_._2)
    val cent2 = cent0.map { case (cid, old) =>
      members.get(cid) match {
        case Some(ms) =>
          val ids = ms.map(_._1).toSet
          val vs = vecs.filter(v => ids.contains(v._1)).map(_._2)
          val nv = Array.tabulate(old.length) { d =>
            gridRound(vs.map(_(d)).sum.toDouble / vs.length)
          }
          cid -> nv
        case None => cid -> old
      }
    }
    val expected = assign(cent2)

    val got = Clustering.kmeansTrain(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"), r.getAs[Long]("d2")))
    assert(got.sameElements(expected))
    // the clustering is non-degenerate: more than one cluster survives
    assert(got.map(_._2).distinct.length > 1)
  }

  test("trained IVF: nprobe=2 recall vs brute force ≥ nprobe=1, and positive") {
    import graft.operators.Similarity
    val exact = Similarity.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(np: Int): Double = {
      val got = Similarity.trainedIvfTopK(spark, sf, np).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"widening the probe lost recall: nprobe1=$r1 nprobe2=$r2")
    assert(r2 > 0.0)
  }

  test("cluster_topics: separated clusters are labeled from their own vocabulary only") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Two far-apart embedding groups with disjoint doc vocabularies; the
    // two lowest vec_ids (= the K=2 deterministic seeds) sit one per
    // group, so Lloyd converges to a pure A/B split by construction.
    def vec(axis: Int, j: Float): Seq[Float] =
      Seq.tabulate(8)(d => if (d == axis) 1.0f else if (d == axis + 1) j else 0f)
    val aIds = 0L +: (2L until 20L).toVector
    val bIds = 1L +: (20L until 38L).toVector
    val embs = (aIds.map(i => (i, vec(0, (i % 5) * 0.01f))) ++
      bIds.map(i => (i, vec(4, (i % 5) * 0.01f)))).toDF("vec_id", "embedding")
    val docs = (aIds.map(i => (i, "alpha apple anchor alpha")) ++
      bIds.map(i => (i, "bravo berry basket bravo"))).toDF("doc_id", "text")
    val avocab = Set("alpha", "apple", "anchor")
    val bvocab = Set("bravo", "berry", "basket")
    spark.conf.set("spark.graft.kmeans.k", "2")
    try {
      val cellOf = Clustering.assignedCellsOf(embs).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
      graft.operators.Dedup.releaseIntermediates()
      val cellsOfA = aIds.map(cellOf).toSet
      val cellsOfB = bIds.map(cellOf).toSet
      assert((cellsOfA & cellsOfB).isEmpty, "separated groups must not share a cell")
      val topics = Clustering.clusterTopicsOf(docs, embs).collect()
      graft.operators.Dedup.releaseIntermediates()
      assert(topics.nonEmpty)
      topics.foreach { r =>
        val cell = r.getAs[Long]("cell")
        val w = r.getAs[String]("word")
        if (cellsOfA(cell)) assert(avocab(w), s"A-cell $cell labeled with foreign term '$w'")
        else assert(bvocab(w), s"B-cell $cell labeled with foreign term '$w'")
      }
    } finally spark.conf.unset("spark.graft.kmeans.k")
  }

  test("embedding_outliers: a planted far vector flags; its tight cell-mates don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def vec(axis: Int, mag: Float): Seq[Float] =
      Seq.tabulate(8)(d => if (d == axis) mag else 0f)
    // cell A: 18 IDENTICAL vectors (all sit exactly at the cell median →
    // dd = 0, never flags even at MAD 0) + one 3× outlier (id 19 —
    // deliberately OUTSIDE the %3 sample: flagging must ride the
    // broadcast baseline, not sample membership); cell B: an identical
    // decoy group so the K=2 seeds (ids 0, 1) split purely
    val a = (Seq(0L) ++ (2L to 18L)).map(i => (i, vec(0, 1f))) :+ ((19L, vec(0, 3f)))
    val b = Seq((1L, vec(4, 1f))) ++ (21L to 29L).map(i => (i, vec(4, 1f)))
    val embs = (a ++ b).toDF("vec_id", "embedding")
    spark.conf.set("spark.graft.kmeans.k", "2")
    try {
      val out = Clustering.embeddingOutliersOf(embs).collect()
      graft.operators.Dedup.releaseIntermediates()
      val byId = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("outlier")).toMap
      assert(byId.size == embs.count())
      assert(byId(19L), "the 3x-magnitude vector must flag")
      ((Seq(0L) ++ (2L to 18L)) ++ (21L to 29L) :+ 1L).foreach(i =>
        assert(!byId(i), s"tight member $i must not flag"))
      // the flag is exactly the recorded inequality, row for row
      out.foreach { r =>
        val expected = !r.isNullAt(r.fieldIndex("mad4")) &&
          2L * math.abs(2L * r.getAs[Long]("d2") - r.getAs[Long]("med2")) >
            3L * r.getAs[Long]("mad4")
        assert(r.getAs[Boolean]("outlier") == expected, s"row $r")
      }
    } finally spark.conf.unset("spark.graft.kmeans.k")
  }

  test("cluster_topics: cells are the assignment's, ranks contiguous, scores non-increasing") {
    val assigned = Clustering.kmeansTrain(spark, sf).collect()
      .map(_.getAs[Long]("cluster")).toSet
    graft.operators.Dedup.releaseIntermediates()
    val topics = Clustering.clusterTopics(spark, sf).collect()
    graft.operators.Dedup.releaseIntermediates()
    assert(topics.map(_.getAs[Long]("cell")).toSet == assigned,
      "every non-empty cell gets topics (the synthetic corpus has no empty-text docs)")
    topics.groupBy(_.getAs[Long]("cell")).foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq,
        s"cell $c ranks not contiguous")
      assert(sorted.length <= graft.operators.GraftConf.tfidfTopK)
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"cell $c scores not non-increasing: $scores")
    }
  }
}
