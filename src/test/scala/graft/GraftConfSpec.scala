package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Curation, Dedup, Similarity}

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

  test("dedup knobs at non-default values: plan and oracle SQL track the conf") {
    withConf(
      "spark.graft.dedup.shingleWords" -> "2",
      "spark.graft.dedup.hotShingleDf" -> "32",
      "spark.graft.dedup.bands" -> "8",
      "spark.graft.dedup.rowsPerBand" -> "2",
      "spark.graft.dedup.jaccardTau" -> "0.4",
      "spark.graft.dedup.minhashTau" -> "0.4",
      "spark.graft.dedup.hotBandDocs" -> "32") {
      assert(Dedup.ShingleWords == 2 && Dedup.MinHashK == 16 && Dedup.Bands == 8)
      val sql = Dedup.dedupMinhashLshSql
      assert(sql.contains("sig_15") && !sql.contains("sig_16")) // 8x2 perms
      assert(sql.contains("7 AS band_id"))
      assert(sql.contains(">= 0.4") && sql.contains("count(*) <= 32"))
      // relaxed tau + narrower shingles recall at least the default pairs
      val pairs = Dedup.dedupMinhashLsh(spark, sf).collect()
      assert(pairs.nonEmpty)
      pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.4))
      // the incremental path stays equivalent under non-default banding
      val delta = Dedup.dedupDelta(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      val full = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .filter(p => p._1 % Dedup.DeltaIdMod == 0 || p._2 % Dedup.DeltaIdMod == 0).toSet
      assert(delta == full)
    }
    withConf("spark.graft.dedup.ccMaxIters" -> "7") {
      assert(Dedup.CcMaxIters == 7)
    }
    withConf("spark.graft.dedup.cosineTau" -> "0.3") {
      assert(Dedup.dedupEmbeddingSql.contains(">= 0.3"))
      val p = Dedup.dedupEmbedding(spark, sf).collect()
      assert(p.nonEmpty)
      p.foreach(r => assert(r.getAs[Double]("cos") >= 0.3))
    }
  }

  test("ANN knobs at non-default values: result shape and oracle SQL track the conf") {
    withConf(
      "spark.graft.ann.queries" -> "5",
      "spark.graft.ann.topK" -> "3",
      "spark.graft.ann.nprobe" -> "1") {
      val rows = Similarity.annTopK(spark, sf).collect()
      assert(rows.length == 5 * 3)
      assert(Similarity.annTopKSql.contains("vec_id < 5") &&
        Similarity.annTopKSql.contains("rank <= 3"))
      assert(Similarity.annTopKIvf2Sql.contains("rn <= 1"))
      val ivf2 = Similarity.annTopKIvf2(spark, sf).collect()
      assert(ivf2.groupBy(_.getAs[Long]("query_id")).forall(_._2.length <= 3))
    }
  }

  test("quantLevels at a non-default value flows into the q8 path and its oracle SQL") {
    withConf("spark.graft.ann.quantLevels" -> "15") {
      assert(Similarity.annTopKQ8Sql.contains("/ CAST(15 AS DOUBLE)"))
      // coarser levels still rank the planted strong neighbors first
      val rows = Similarity.annTopKQ8(spark, sf).collect()
      assert(rows.length == Similarity.NumQueries * Similarity.TopK)
      rows.foreach(r => assert(r.getAs[Double]("cos_q8") <= 1.5))
    }
    withConf("spark.graft.ann.quantLevels" -> "128") {
      intercept[IllegalArgumentException](Similarity.annTopKQ8(spark, sf))
    }
  }

  test("pq knobs at non-default values: geometry, iterations and SQL track the conf") {
    withConf("spark.graft.ann.pqSubs" -> "4", "spark.graft.ann.pqK" -> "8",
             "spark.graft.ann.pqIters" -> "3", "spark.graft.ann.pqRerank" -> "10") {
      val sql = Similarity.annTopKPqSql
      assert(sql.contains("pqc2") && !sql.contains("pqc3"), "iters=3 → last round is pqc2")
      assert(sql.contains("crn <= 10") && sql.contains("len(se) // 4"))
      val rows = Similarity.annTopKPq(spark, sf).collect()
      graft.operators.Dedup.releaseIntermediates()
      assert(rows.length == Similarity.NumQueries * Similarity.TopK)
      assert(rows.forall(_.getAs[Double]("cos_pq") <= 1.0001))
    }
  }

  test("srp knobs at non-default values: signature width and banding track the conf") {
    // wider bands = the larger-corpus setting (value space 2^8 so the
    // hot-bucket cap doesn't saturate as n grows); NOT fewer-bit bands,
    // whose tiny value space the cap correctly nukes
    withConf("spark.graft.dedup.srpBits" -> "16", "spark.graft.dedup.srpBandBits" -> "8") {
      assert(Dedup.SrpBits == 16 && Dedup.SrpBandBits == 8)
      val sql = Dedup.dedupEmbeddingSrpSql
      assert(sql.contains("generate_series(0, 15)") && sql.contains("bit // 8"), sql.take(800))
      val p = Dedup.dedupEmbeddingSrp(spark, sf).collect()
      assert(p.nonEmpty)
      p.foreach(r => assert(r.getAs[Double]("cos") >= Dedup.CosineTau))
    }
    // width not divisible by band width fails loudly, not by silent truncation
    withConf("spark.graft.dedup.srpBits" -> "10", "spark.graft.dedup.srpBandBits" -> "4") {
      intercept[IllegalArgumentException](Dedup.dedupEmbeddingSrp(spark, sf))
    }
  }

  test("trainSampleMod non-default: quantizer trains on the id-grid sample, assignment covers the corpus") {
    withConf("spark.graft.kmeans.trainSampleMod" -> "4") {
      assert(Clustering.TrainSampleMod == 4)
      val sql = Clustering.kmeansTrainSql
      assert(sql.contains("% 4 = 0") && sql.contains("vec_id < 40"), sql.take(600))
      val rows = Clustering.kmeansTrain(spark, sf).collect()
      // every corpus vector is still assigned — sampling touches TRAINING only
      assert(rows.length == sources.Tables.embeddings(spark, sf).count())
      // seeds (and hence cluster ids) come from the sampled id grid
      val clusters = rows.map(_.getAs[Long]("cluster")).distinct
      assert(clusters.nonEmpty && clusters.forall(_ % 4 == 0))
      // downstream IVF consumers ride the same sampled quantizer
      assert(Similarity.annTopKIvf2(spark, sf).collect().nonEmpty)
    }
    // default emits the historical full-corpus SQL, no sample CTE
    assert(!Clustering.kmeansTrainSql.contains("evt"))
  }

  test("quality-filter bounds at non-default values: keep/reasons track the conf") {
    withConf(
      "spark.graft.quality.minWords" -> "10",
      "spark.graft.quality.maxWords" -> "60",
      "spark.graft.quality.minStopPct" -> "2",
      "spark.graft.quality.maxTopBigramPct" -> "15") {
      val sql = Curation.qualityFilterSql
      assert(sql.contains("n_words < 10") && sql.contains("n_words > 60") &&
        sql.contains("n_words * 2") && sql.contains("n_words * 15"))
      val rows = Curation.qualityFilter(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (nw, ns, bg) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_stop"), r.getAs[Long]("top_bg"))
        val expectKeep = !(nw < 10 || nw > 60 || ns * 100 < nw * 2 || bg * 100 > nw * 15)
        assert(r.getAs[Boolean]("keep") == expectKeep)
        assert(r.getAs[Boolean]("keep") == r.getAs[String]("reasons").isEmpty)
      }
      // the non-default bounds actually change at least one verdict
      assert(rows.exists(!_.getAs[Boolean]("keep")) && rows.exists(_.getAs[Boolean]("keep")))
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

  test("fuzzy-decontam and perplexity-bucket knobs flow into results and oracle SQL") {
    withConf("spark.graft.decontam.fuzzyTau" -> "0.25",
             "spark.graft.decontam.fuzzyEvalMod" -> "7",
             "spark.graft.decontam.ngram" -> "13",
             "spark.graft.ppl.sampleMod" -> "5") {
      assert(Curation.FuzzyTau == 0.25 && Curation.FuzzyEvalMod == 7)
      val fsql = Curation.decontaminateFuzzySql
      assert(fsql.contains("jaccard >= 0.25") && fsql.contains("% 7"))
      assert(Curation.ContamNgram == 13 &&
        Curation.decontaminateSql.contains("ws[i + 12]")) // 13-gram reaches the oracle
      assert(Curation.corpusCurateSql.contains("% 7"))    // curate tracks the fuzzy mod
      // non-default mod changes the train/eval split size on the real corpus
      val n = Curation.decontaminateFuzzy(spark, sf).count()
      graft.operators.Dedup.releaseIntermediates()
      assert(n == 500 - 500 / 7 - 1) // ids 0..499: 72 eval (0,7,...,497)
      assert(graft.operators.TextAnalysis.PplSampleMod == 5)
      assert(graft.operators.TextAnalysis.perplexityBucketsSql.contains("doc_id % 5 = 0"))
    }
  }
}
