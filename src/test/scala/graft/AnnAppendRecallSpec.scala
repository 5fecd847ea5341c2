package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{AnnIndex, Dedup}

/** `ann_append_recall_report`: the append lifecycle's
  * measure-before-trust read. `appendToIvfPq` encodes new crawls against
  * the ORIGINAL centroids/codebooks — a drifted crawl lands in cells the
  * quantizer never trained for with codes the codebooks can't represent,
  * and recall decays SILENTLY. The report (appended store vs fresh
  * rebuild, per query) must surface exactly that: a planted drifted
  * crawl shows the appended store's recall below the rebuilt store's.
  */
class AnnAppendRecallSpec extends SparkSpec {

  /** Unit vector: 0.98 toward axis `p` + 0.199 toward axis `q` —
    * cluster-mates share `p`, so their pairwise cos ≈ 0.96.
    */
  private def vec(p: Int, q: Int, sign: Double): Seq[Double] =
    Seq.tabulate(64)(d =>
      if (d == p) sign * 0.98
      else if (d == q) sign * 0.19899749371
      else 0.0)

  /** Base region: 5 clusters on axes 0..4 (queries 0..4 + 40 members
    * each). Drifted crawl: 5 clusters on NEGATIVE axes 32..36 (queries
    * 5..9 + 40 members each) — a region the base quantizer and codebooks
    * never saw.
    */
  private def corpus: (DataFrame, DataFrame) = {
    import spark.implicits._
    val baseQ = (0 until 5).map(i => (i.toLong, vec(i, 40 + i, 1.0)))
    val baseM = for (c <- 0 until 5; j <- 0 until 40)
      yield ((10 + c * 40 + j).toLong, vec(c, 40 + (j % 20), 1.0))
    val driftQ = (5 until 10).map(i => (i.toLong, vec(27 + i, 45 + i, -1.0)))
    val driftM = for (c <- 0 until 5; j <- 0 until 40)
      yield ((210 + c * 40 + j).toLong, vec(32 + c, 45 + (j % 20), -1.0))
    ((baseQ ++ baseM).toDF("vec_id", "embedding"),
      (driftQ ++ driftM).toDF("vec_id", "embedding"))
  }

  test("a drifted crawl appended to a stored index drops recall vs a fresh rebuild — surfaced per query") {
    val (base, drift) = corpus
    val all = base.unionByName(drift).localCheckpoint(true)

    val appended = java.nio.file.Files.createTempDirectory("graft-ann-append").toString
    AnnIndex.writeIvfPqFrom(base, appended)
    AnnIndex.appendToIvfPq(spark, appended, drift)
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-ann-rebuild").toString
    AnnIndex.writeIvfPqFrom(all, rebuilt)

    val report = AnnIndex.appendRecallReport(spark, appended, rebuilt, all)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Double]("recall_appended"), r.getAs[Double]("recall_rebuilt"),
          r.getAs[Double]("recall_drop")))
      .toMap
    Dedup.releaseIntermediates()

    assert(report.keySet == (0L until 10L).toSet,
      s"one row per standard query, got ${report.keySet}")
    // the drifted queries (5..9) expose the stale quantizer: the appended
    // store must lose to the rebuild on at least one, and never win on avg
    val driftRows = (5L until 10L).map(report)
    assert(driftRows.exists(_._3 > 0.0),
      s"planting broken: no drifted query shows a recall drop: $driftRows")
    val avgAppended = report.values.map(_._1).sum / report.size
    val avgRebuilt = report.values.map(_._2).sum / report.size
    assert(avgAppended < avgRebuilt,
      f"appended-store avg recall $avgAppended%.3f must trail the rebuild's $avgRebuilt%.3f")
    // control: the base-region queries were trained for — the append must
    // not have damaged them (their codes and cells are unchanged rows)
    val baseRows = (0L until 5L).map(report)
    assert(baseRows.forall(r => r._1 >= r._2 - 0.21),
      s"base-region queries should stay comparable across stores: $baseRows")
  }
}
