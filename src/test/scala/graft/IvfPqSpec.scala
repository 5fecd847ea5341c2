package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Clustering, Dedup, Similarity}
import graft.sources.Tables

/** `ann_topk_ivfpq` — the IVF × PQ composition. The variant differs from
  * `ann_topk_pq` ONLY in which pairs reach ADC (shared `pqIndexOf` /
  * `pqAdcRerank` plumbing), so the specs pin exactly that difference:
  * candidates are restricted to probed cells, the restriction is an
  * equi-join in the plan (never a corpus×queries cross), and the recall
  * cost of the restriction is measured against both baselines.
  */
class IvfPqSpec extends SparkSpec {

  private def exactNeighbors: Set[(Long, Long)] =
    Similarity.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  test("ivfpq recall@k vs exact is positive and within reach of the full-scan PQ baseline") {
    val exact = exactNeighbors
    val pq = Similarity.annTopKPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = Similarity.annTopKIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    Dedup.releaseIntermediates()
    val rPq = exact.intersect(pq).size.toDouble / exact.size
    val rIvfPq = exact.intersect(ivfpq).size.toDouble / exact.size
    info(f"recall@k vs exact: pq=$rPq%.3f ivfpq=$rIvfPq%.3f")
    assert(rIvfPq > 0.5, s"ivfpq recall $rIvfPq")
    // cell restriction costs recall vs the full ADC scan, but must stay in
    // the same regime — a collapse here means the cell join is wrong
    assert(rIvfPq >= rPq - 0.35, s"ivfpq $rIvfPq collapsed vs pq $rPq")
  }

  test("residual variant: recall vs exact in the same regime as cell-independent codes") {
    val exact = exactNeighbors
    val ivfpq = Similarity.annTopKIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpqR = Similarity.annTopKIvfPqR(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    Dedup.releaseIntermediates()
    val r0 = exact.intersect(ivfpq).size.toDouble / exact.size
    val rR = exact.intersect(ivfpqR).size.toDouble / exact.size
    info(f"recall@k vs exact: ivfpq=$r0%.3f ivfpq_r=$rR%.3f")
    assert(rR > 0.5, s"residual ivfpq recall $rR")
    // residual codes must not collapse vs the cell-independent baseline
    assert(rR >= r0 - 0.2, s"residual $rR collapsed vs non-residual $r0")
  }

  test("neighbors come only from the query's probed cells (the IVF restriction is real)") {
    val scaled = Clustering.scaledEmbOf(Tables.embeddings(spark, sf))
    val cents = Clustering.trainedCentroidsOf(scaled)
    val d = scaled.crossJoin(broadcast(cents))
      .withColumn("d2", expr("graft_l2sq(se, cemb)"))
    val cells = d.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
    val probed = d.filter(col("vec_id") < Similarity.NumQueries)
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= Similarity.NProbe)
      .select(col("vec_id"), col("cid"))
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val got = Similarity.annTopKIvfPq(spark, sf).collect()
    Dedup.releaseIntermediates()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(probed(q).contains(cells(n)),
        s"query $q returned neighbor $n from unprobed cell ${cells(n)} (probed ${probed(q)})")
    }
  }

  test("the cell restriction is an equi-join in the plan, not a filtered cross") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = Similarity.annTopKIvfPq(spark, sf).queryExecution.optimizedPlan
    val cellJoin = plan.collect {
      case j: Join if j.condition.exists(c =>
        c.toString.contains("pcell") && c.toString.contains("cell")) => j
    }
    assert(cellJoin.nonEmpty, "no pcell=cell equi-join found in the optimized plan")
    // every remaining cross is a broadcast of a K-row table (centroids /
    // ADC tables) — none may be corpus × queries
    val crosses = plan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    crosses.foreach { j =>
      assert(j.hint.toString.toLowerCase.contains("broadcast"),
        s"unhinted cross join in ivfpq plan: $j")
    }
  }
}
