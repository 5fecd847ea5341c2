package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection

/** `dsir_select` — importance resampling must actually prefer target-like
  * pool docs, honor the budget, and break ties deterministically.
  */
class SelectionSpec extends SparkSpec {

  // target slice speaks vocabulary A; half the pool shares it, half is
  // disjoint — DSIR must rank the A-speakers strictly first
  private val vocabA = "transformer attention gradient descent optimizer " +
    "checkpoint tokenizer embedding pretraining corpus"
  private val vocabB = "harvest tractor meadow fencepost silo barnyard " +
    "plough furrow haystack scarecrow"

  private def planted = {
    import spark.implicits._
    val target = (0 until 5).map(i => (100L + i, vocabA, "de", "seed"))
    val likeTarget = (0 until 4).map(i => (200L + i, vocabA + " extra", "en", "crawl"))
    val unlike = (0 until 4).map(i => (300L + i, vocabB + " extra", "en", "crawl"))
    (target ++ likeTarget ++ unlike).toDF("doc_id", "text", "lang", "source")
  }

  test("target-vocabulary pool docs outrank disjoint-vocabulary docs") {
    val rows = Selection.dsirSelectOf(planted).collect()
    val rankOf = rows.map(r => r.getLong(0) -> r.getAs[Long]("rank")).toMap
    // all 8 pool docs selected (budget 50 > pool); target docs never appear
    assert(rankOf.keySet == (200L until 204L).toSet ++ (300L until 304L).toSet)
    val likeRanks = (200L until 204L).map(rankOf)
    val unlikeRanks = (300L until 304L).map(rankOf)
    assert(likeRanks.max < unlikeRanks.min,
      s"target-like docs must rank first: like=$likeRanks unlike=$unlikeRanks")
    // identical texts tie; ties break to lower doc_id → ranks follow ids
    assert(likeRanks == likeRanks.sorted)
  }

  test("budget caps the selection; ranking is deterministic across runs") {
    spark.conf.set("spark.graft.dsir.budget", "3")
    try {
      val a = Selection.dsirSelectOf(planted).collect().map(_.getLong(0)).toSeq
      val b = Selection.dsirSelectOf(planted).collect().map(_.getLong(0)).toSeq
      assert(a.length == 3 && a == b)
      // the 3 selected are target-like (the planted signal survives the cut)
      assert(a.forall(id => id >= 200L && id < 204L), s"selected $a")
    } finally spark.conf.unset("spark.graft.dsir.budget")
  }

  test("bucket ratio table stays within the conf bound and broadcasts") {
    val df = Selection.dsirSelect(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // the ratio + totals joins must be broadcast (the fixed-size-sketch
    // property that makes DSIR a one-scan corpus operator)
    assert(plan.toLowerCase.contains("broadcast"), "no broadcast in dsir plan")
    val n = df.count()
    assert(n > 0 && n <= Selection.DsirBudget)
  }
}
