package graft

import graft.operators.{Dedup, GraftConf, Similarity}

/** Plan contract for the ANN top-k cuts: every family trims per-query
  * candidates with `row_number().over(query window) <= k` + filter, and
  * on this Spark 4 build that must plan as WindowGroupLimit (bounded
  * per-partition top-k state, map-side Partial + Final) — NOT a full
  * per-partition sort materializing corpus-sized window partitions. This
  * is the plan property the 100 TB story rests on; pin it so a rewrite
  * that silently loses the pushdown fails here instead of in production.
  */
class AnnPlanSpec extends SparkSpec {

  private def groupLimits(plan: String): Seq[(String, Long)] =
    raw"WindowGroupLimit .*row_number\(\), (\d+), (Partial|Final)".r
      .findAllMatchIn(plan).map(m => (m.group(2), m.group(1).toLong)).toSeq

  test("ann_topk plans its per-query cut as WindowGroupLimit Partial+Final at topK") {
    val plan = Similarity.annTopK(spark, sf).queryExecution.executedPlan.toString
    Dedup.releaseIntermediates()
    val limits = groupLimits(plan)
    assert(limits.contains(("Partial", Similarity.TopK.toLong)) &&
      limits.contains(("Final", Similarity.TopK.toLong)),
      s"expected Partial+Final WindowGroupLimit(${Similarity.TopK}), got $limits\n${plan.take(1500)}")
  }

  test("ann_topk_bq plans BOTH cuts as WindowGroupLimit: Hamming pre-rank at bqRerank, final at topK") {
    val plan = Similarity.annTopKBq(spark, sf).queryExecution.executedPlan.toString
    Dedup.releaseIntermediates()
    val limits = groupLimits(plan)
    assert(limits.contains(("Final", GraftConf.annBqRerank.toLong)),
      s"Hamming pre-rank cut lost its WindowGroupLimit: $limits")
    assert(limits.contains(("Final", Similarity.TopK.toLong)),
      s"final cosine cut lost its WindowGroupLimit: $limits")
  }
}
