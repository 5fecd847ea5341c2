package graft

import graft.operators.Dedup

/** Regression: `clustersFromPairs` over LOCAL-relation pair sets (planted
  * spec corpora, the contracted graphs of the incremental unified path)
  * used to throw `NoSuchElementException: key not found` inside
  * Catalyst's union-constraint rewrite; the CC loop now scopes constraint
  * propagation off (it infers nothing there — bare aggregates/equi-joins).
  */
class CcLocalRelationSpec extends SparkSpec {
  import spark.implicits._

  test("cc over a local-relation pair set labels the chain to its min") {
    val pairs = Seq((2L, 10L), (10L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.clustersFromPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    Dedup.releaseIntermediates()
    assert(out == Map(2L -> 2L, 3L -> 2L, 10L -> 2L))
  }

  test("cc over a checkpointed local pair set; constraint-propagation conf is restored") {
    val prev = spark.conf.getOption("spark.sql.constraintPropagation.enabled")
    val pairs = Seq((2L, 10L), (10L, 3L)).toDF("doc_a", "doc_b").localCheckpoint(true)
    val out = Dedup.clustersFromPairs(pairs).collect()
    Dedup.releaseIntermediates()
    assert(out.length == 3)
    assert(spark.conf.getOption("spark.sql.constraintPropagation.enabled") == prev,
      "clustersFromPairs must restore the session conf")
  }
}
