package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** `dedup_keep_unified_delta`: the incremental unified keep-list must
  * reproduce the closure over (base-only unified edges ∪ delta-touching
  * full-corpus pairs) restricted to delta-touched components — at the
  * default carving AND an alternate mod-7 split (the per-lane delta
  * contract lifted to components) — and the contraction/expansion core
  * must merge base clusters through a delta doc and survive the
  * membership parquet round-trip.
  */
class DedupUnifiedDeltaSpec extends SparkSpec {

  private type KeepRow = (Long, Long, Long, String, String)

  private def toSet(rows: Array[org.apache.spark.sql.Row]): Set[KeepRow] =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
      r.getAs[Long]("cluster_size"), r.getAs[String]("origin"),
      r.getAs[String]("status"))).toSet

  /** Independent in-engine formulation: full closure over the union edge
    * set (no stored membership, no contraction), restricted to components
    * holding a delta doc, plus delta singletons.
    */
  private def referenceRestricted(docs: DataFrame, embs: DataFrame, m: Int): Set[KeepRow] = {
    val isD = col("doc_id") % m === 0
    val basePairs = Dedup.unifiedPairsOf(
      docs.filter(!isD), embs.filter(col("vec_id") % m =!= 0))
    val fullPairs = Dedup.unifiedPairsOf(docs, embs)
      .filter(col("doc_a") % m === 0 || col("doc_b") % m === 0)
    val cc = Dedup.clustersFromPairs(basePairs.unionByName(fullPairs).distinct())
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deltaIds = docs.filter(isD).select("doc_id").collect().map(_.getLong(0)).toSet
    Dedup.releaseIntermediates()
    val touched = cc.filter(p => deltaIds(p._1)).map(_._2).toSet
    val members = cc.filter(p => touched(p._2))
    val sizes = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val singles = deltaIds -- members.map(_._1).toSet
    val rows = members.map { case (id, c) =>
      (id, c, sizes(c), if (deltaIds(id)) "delta" else "base",
        if (id == c) "canonical" else "dup")
    } ++ singles.map(id => (id, id, 1L, "delta", "unique"))
    rows.toSet
  }

  test("dedup_keep_unified_delta ≡ full union-closure restricted to delta-touched components") {
    val got = toSet(Dedup.dedupKeepUnifiedDelta(spark, sf).collect())
    Dedup.releaseIntermediates()
    val want = referenceRestricted(Tables.documents(spark, sf),
      Tables.embeddings(spark, sf), Dedup.DeltaIdMod)
    assert(got.exists(_._4 == "base") && got.exists(_._4 == "delta"),
      "the corpus must carry cross-generation merges")
    assert(got == want,
      s"delta-only: ${(got -- want).take(5)}; full-only: ${(want -- got).take(5)}")
  }

  test("split invariance: the mod-7 carving through the From seam matches the same restriction") {
    val m = 7
    val docs = Tables.documents(spark, sf)
    val embs = Tables.embeddings(spark, sf)
    val isD = col("doc_id") % m === 0
    val baseDocs = docs.filter(!isD)
    val deltaDocs = docs.filter(isD)
    val baseEmbs = embs.filter(col("vec_id") % m =!= 0)
    val deltaEmbs = embs.filter(col("vec_id") % m === 0)
    val stored = Dedup.clustersFromPairs(Dedup.unifiedPairsOf(baseDocs, baseEmbs))
    val got = toSet(Dedup.dedupKeepUnifiedDeltaFrom(stored,
      Dedup.unifiedDeltaPairsOf(baseDocs, baseEmbs, deltaDocs, deltaEmbs),
      deltaDocs).collect())
    Dedup.releaseIntermediates()
    val want = referenceRestricted(docs, embs, m)
    assert(got == want,
      s"delta-only: ${(got -- want).take(5)}; full-only: ${(want -- got).take(5)}")
  }

  test("planted merge: a delta doc bridges two stored base clusters; membership survives parquet") {
    import spark.implicits._
    // stored: clusters {1,2} and {3,4}; delta doc 10 pairs with 2 and 3,
    // delta doc 20 untouched
    val stored = Seq((1L, 1L, 2L, true), (2L, 1L, 2L, false),
        (3L, 3L, 2L, true), (4L, 3L, 2L, false))
      .toDF("doc_id", "cluster_id", "cluster_size", "is_canonical")
    val deltaPairs = Seq((2L, 10L), (10L, 3L)).toDF("doc_a", "doc_b")
    val deltaDocs = Seq((10L, "x"), (20L, "y")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-unified-idx").toString
    stored.write.mode("overwrite").parquet(s"$dir/membership")
    val expected = Set[KeepRow](
      (1L, 1L, 5L, "base", "canonical"), (2L, 1L, 5L, "base", "dup"),
      (3L, 1L, 5L, "base", "dup"), (4L, 1L, 5L, "base", "dup"),
      (10L, 1L, 5L, "delta", "dup"), (20L, 20L, 1L, "delta", "unique"))
    val inMem = toSet(Dedup.dedupKeepUnifiedDeltaFrom(stored, deltaPairs, deltaDocs).collect())
    Dedup.releaseIntermediates()
    val viaParquet = toSet(Dedup.dedupKeepUnifiedDeltaFrom(
      spark.read.parquet(s"$dir/membership"), deltaPairs, deltaDocs).collect())
    Dedup.releaseIntermediates()
    assert(inMem == expected, s"got $inMem")
    assert(viaParquet == expected, "membership parquet round-trip must be verdict-identical")
  }
}
