package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Curation, Similarity}

/** The `spark.graft.*` scale knobs: non-default settings must flow into BOTH
  * the Spark plan and the generated oracle SQL (so cross-engine parity holds
  * at any setting), and the operators must stay semantically correct at
  * cluster-scale values (e.g. 64 packing shards).
  */
class GraftConfSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("pack_sequences at 64 shards: invariant holds, oracle SQL tracks the conf") {
    withConf("spark.graft.pack.shards" -> "64", "spark.graft.pack.seqTokens" -> "128") {
      assert(Curation.PackShards == 64 && Curation.SeqBudget == 128)
      assert(Curation.packSequencesSql.contains("% 64") &&
        Curation.packSequencesSql.contains("// 128"))
      val rows = Curation.packSequences(spark, sf).collect()
      val shards = rows.map(_.getAs[Long]("shard")).distinct
      assert(shards.forall(s => s >= 0 && s < 64) && shards.length > 8)
      // per-shard packing invariant at the non-default budget
      rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
        var cum = 0L
        rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("seq_id") == cum / 128)
          assert(r.getAs[Long]("seq_offset") == cum % 128)
          cum += r.getAs[Long]("n_tokens")
        }
      }
    }
  }

  test("bm25 with a different term set: schema and SQL track the conf") {
    withConf("spark.graft.bm25.terms" -> "join,hash") {
      assert(Similarity.QueryTerms == Seq("join", "hash"))
      val out = Similarity.bm25Search(spark, sf)
      assert(out.columns.toSeq == Seq("rank", "doc_id", "tf_0", "tf_1", "score"))
      val rows = out.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getAs[Long]("tf_0") + r.getAs[Long]("tf_1") > 0))
      assert(Similarity.bm25SearchSql.contains("w = 'join'") &&
        Similarity.bm25SearchSql.contains("w = 'hash'"))
    }
  }

  test("malformed conf values fail loudly, not by corrupting generated SQL") {
    withConf("spark.graft.bm25.terms" -> "ok',bad") {
      intercept[IllegalArgumentException](Similarity.QueryTerms)
    }
    withConf("spark.graft.pack.shards" -> "0") {
      intercept[IllegalArgumentException](Curation.PackShards)
    }
  }

  test("kmeans at k=5, iters=3: output domain and generated CTE chain track the conf") {
    withConf("spark.graft.kmeans.k" -> "5", "spark.graft.kmeans.iters" -> "3") {
      val got = Clustering.kmeansTrain(spark, sf).collect()
      val clusters = got.map(_.getAs[Long]("cluster")).distinct
      assert(clusters.forall(c => c >= 0 && c < 5))
      val sql = Clustering.kmeansTrainSql
      assert(sql.contains("vec_id < 5"))
      assert(sql.contains("cent2") && !sql.contains("cent3")) // iters=3 → last centroid stage is cent2
      // ivf2's oracle shares the same generated quantizer CTEs
      assert(Similarity.annTopKIvf2Sql.contains("FROM cent2"))
    }
  }
}
