package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup
import graft.streaming.StreamOps

/** Streaming unified dedup (`UnifiedDedupIndex`): the stream-fold over N
  * micro-batches must equal the batch `dedup_keep_unified_delta` +
  * `dedup_membership_apply` chain run crawl-by-crawl — per-batch verdicts
  * AND the advanced membership — and the final membership must land on
  * the full-corpus rebuild (the apply-associativity property riding the
  * stream).
  */
class StreamUnifiedSpec extends SparkSpec {

  private type KeepRow = (Long, Long, Long, String, String)
  private def verdictSet(rows: Array[org.apache.spark.sql.Row]): Set[KeepRow] =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
      r.getAs[Long]("cluster_size"), r.getAs[String]("origin"),
      r.getAs[String]("status"))).toSet
  private def memberSet(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select("doc_id", "cluster_id", "cluster_size", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet

  test("StoredUnifiedDedupIndex: restart resumes from the persisted store; replayed batchIds are no-ops") {
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val embs = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val m = Dedup.DeltaIdMod
    val isD = col("doc_id") % m === 0
    val isDV = col("vec_id") % m === 0
    val b1d = col("doc_id") % (2 * m) === 0
    val b1v = col("vec_id") % (2 * m) === 0
    val base = docs.filter(!isD)
    val baseE = embs.filter(!isDV)

    // arbiter: the uninterrupted batch chain
    val m0 = Dedup.clustersFromPairs(Dedup.unifiedPairsOf(base, baseE))
      .localCheckpoint(true)
    val v1 = Dedup.dedupKeepUnifiedDeltaFrom(m0,
        Dedup.unifiedDeltaPairsOf(base, baseE,
          docs.filter(b1d), embs.filter(b1v)), docs.filter(b1d))
      .localCheckpoint(true)
    val m1 = Dedup.membershipApply(m0, v1).localCheckpoint(true)
    val v2 = Dedup.dedupKeepUnifiedDeltaFrom(m1,
        Dedup.unifiedDeltaPairsOf(docs.filter(!isD || b1d), embs.filter(!isDV || b1v),
          docs.filter(isD && !b1d), embs.filter(isDV && !b1v)),
        docs.filter(isD && !b1d))
      .localCheckpoint(true)
    val want1 = verdictSet(v1.collect())
    val want2 = verdictSet(v2.collect())
    Dedup.releaseIntermediates()

    val path = java.nio.file.Files.createTempDirectory("graft-stored-stream").toString
    graft.operators.UnifiedDedupStore.write(base, baseE, path)
    Dedup.releaseIntermediates()

    // runner A processes micro-batch 0, then "dies"
    val runnerA = new StreamOps.StoredUnifiedDedupIndex(path)
    val got1 = verdictSet(runnerA.processBatch(
      docs.filter(b1d), embs.filter(b1v), 0L).collect())
    Dedup.releaseIntermediates()
    assert(got1 == want1,
      s"batch0 store-only: ${(got1 -- want1).take(5)}; chain-only: ${(want1 -- got1).take(5)}")

    // restart: a FRESH session state and a FRESH runner over the same path
    val spark2 = spark.newSession()
    val docs2 = sources.Tables.documents(spark2, sf).select("doc_id", "text")
    val embs2 = sources.Tables.embeddings(spark2, sf).select("vec_id", "embedding")
    val runnerB = new StreamOps.StoredUnifiedDedupIndex(path)
    // THE crash window the journal can only roll FORWARD: the membership
    // swap completed (its _crawl_ marker is present) but the crash hit
    // before the journal's .staged → .done rename. A replayed batch 0 sees
    // isApplied = false, recover() rolls the journal forward — and the
    // replay must STILL be a no-op (the store already holds the crawl;
    // re-applying would double every lane's rows)
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark2.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(s"$path/_journal/batch-0.done"),
      new Path(s"$path/_journal/batch-0.staged")), "window setup rename")
    assert(fs.exists(new Path(s"$path/membership/_crawl_batch-0")),
      "window precondition: the swap's marker is present")
    val laneBefore = spark2.read.parquet(s"$path/exact").count()
    val memBefore = memberSet(spark2.read.parquet(s"$path/membership"))
    val replayW = runnerB.processBatch(
      docs2.filter(b1d), embs2.filter(b1v), 0L)
    assert(replayW.isEmpty,
      "replay through the swap→journal crash window must deliver no verdicts")
    assert(spark2.read.parquet(s"$path/exact").count() == laneBefore,
      "crash-window replay must not double lane rows")
    assert(fs.exists(new Path(s"$path/_journal/batch-0.done")),
      "recover must roll the window forward to done")
    // crash replay AFTER a completed advance: foreachBatch re-delivers
    // batch 0 with its original id — the journaled advance makes it a no-op
    val replay = runnerB.processBatch(
      docs2.filter(b1d), embs2.filter(b1v), 0L)
    assert(replay.isEmpty, "replayed batchId must deliver no verdicts")
    assert(memberSet(spark2.read.parquet(s"$path/membership")) == memBefore,
      "replayed batchId must not advance the store")
    // then the NEXT batch resumes exactly where the dead runner stopped
    val got2 = verdictSet(runnerB.processBatch(
      docs2.filter(isD && !b1d), embs2.filter(isDV && !b1v), 1L).collect())
    Dedup.releaseIntermediates()
    assert(got2 == want2,
      s"batch1 store-only: ${(got2 -- want2).take(5)}; chain-only: ${(want2 -- got2).take(5)}")

    // the resumed store lands on the full-corpus rebuild
    val stored = memberSet(spark2.read.parquet(s"$path/membership"))
    val rebuild = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs)))
    Dedup.releaseIntermediates()
    assert(stored == rebuild,
      s"store-only: ${(stored -- rebuild).take(5)}; rebuild-only: ${(rebuild -- stored).take(5)}")
  }

  test("UnifiedDedupIndex: streamed batches ≡ batch delta+apply chain; final membership ≡ full rebuild") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val embs = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val m = Dedup.DeltaIdMod
    val isD = col("doc_id") % m === 0
    val isDV = col("vec_id") % m === 0
    val b1d = col("doc_id") % (2 * m) === 0
    val b1v = col("vec_id") % (2 * m) === 0

    // expected: the batch chain, crawl by crawl (batch1 then batch2)
    val base = docs.filter(!isD)
    val baseE = embs.filter(!isDV)
    val m0 = Dedup.clustersFromPairs(Dedup.unifiedPairsOf(base, baseE))
      .localCheckpoint(true)
    val v1 = Dedup.dedupKeepUnifiedDeltaFrom(m0,
        Dedup.unifiedDeltaPairsOf(base, baseE,
          docs.filter(b1d), embs.filter(b1v)), docs.filter(b1d))
      .localCheckpoint(true)
    val m1 = Dedup.membershipApply(m0, v1).localCheckpoint(true)
    val v2 = Dedup.dedupKeepUnifiedDeltaFrom(m1,
        Dedup.unifiedDeltaPairsOf(docs.filter(!isD || b1d), embs.filter(!isDV || b1v),
          docs.filter(isD && !b1d), embs.filter(isDV && !b1v)),
        docs.filter(isD && !b1d))
      .localCheckpoint(true)
    val m2 = memberSet(Dedup.membershipApply(m1, v2))
    Dedup.releaseIntermediates()
    val want1 = verdictSet(v1.collect())
    val want2 = verdictSet(v2.collect())
    assert(want1.nonEmpty && want2.nonEmpty, "both crawls must carry verdicts")

    // the stream: same two crawls as micro-batches
    val idx = new StreamOps.UnifiedDedupIndex(base, baseE)
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[KeepRow]]
    val mem = MemoryStream[(Long, String, Seq[Float])]
    val q = mem.toDF().toDF("doc_id", "text", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val bd = batch.select("doc_id", "text")
        val be = batch.select(col("doc_id").as("vec_id"), col("embedding"))
        got.synchronized { got += verdictSet(idx.processBatch(bd, be).collect()) }
        ()
      }
      .start()
    try {
      val rows = docs.filter(isD)
        .join(embs.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .as[(Long, String, Seq[Float])].collect()
      mem.addData(rows.filter(_._1 % (2 * m) == 0).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 % (2 * m) != 0).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.length == 2, s"expected two micro-batches, saw ${got.length}")
    assert(got(0) == want1,
      s"batch1 stream-only: ${(got(0) -- want1).take(5)}; batch-only: ${(want1 -- got(0)).take(5)}")
    assert(got(1) == want2,
      s"batch2 stream-only: ${(got(1) -- want2).take(5)}; batch-only: ${(want2 -- got(1)).take(5)}")
    val streamed = memberSet(idx.indexMembership)
    assert(streamed == m2, "streamed membership must equal the batch apply chain")
    val rebuild = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs)))
    Dedup.releaseIntermediates()
    assert(streamed == rebuild,
      s"stream-only: ${(streamed -- rebuild).take(5)}; rebuild-only: ${(rebuild -- streamed).take(5)}")
  }
}
