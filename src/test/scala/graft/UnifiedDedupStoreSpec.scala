package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, UnifiedDedupStore}
import graft.sources.Tables

/** The disk-backed per-crawl loop (`UnifiedDedupStore`): write the store,
  * feed two crawls through `processCrawl`, and the ADVANCED store —
  * membership write-back plus lane appends, all through parquet — must
  * answer exactly as a fresh build over base ∪ crawl1 ∪ crawl2; per-crawl
  * verdicts must equal the in-memory batch chain; conf drift between
  * build and crawl must fail fast, not under-pair.
  */
class UnifiedDedupStoreSpec extends SparkSpec {

  private def memberSet(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select("doc_id", "cluster_id", "cluster_size", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
  private def verdictSet(df: DataFrame): Set[(Long, Long, Long, String, String)] =
    df.select("doc_id", "cluster_id", "cluster_size", "origin", "status").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[String]("origin"),
        r.getAs[String]("status"))).toSet

  test("two crawls through the disk store ≡ batch chain per crawl; final membership ≡ full rebuild") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val m = Dedup.DeltaIdMod
    val isD = col("doc_id") % m === 0
    val isDV = col("vec_id") % m === 0
    val c1d = col("doc_id") % (2 * m) === 0
    val c1v = col("vec_id") % (2 * m) === 0
    val base = docs.filter(!isD)
    val baseE = embs.filter(!isDV)

    val path = java.nio.file.Files.createTempDirectory("graft-udstore").toString
    UnifiedDedupStore.write(base, baseE, path)
    Dedup.releaseIntermediates()

    // in-memory batch chain as the arbiter
    val m0 = Dedup.clustersFromPairs(Dedup.unifiedPairsOf(base, baseE))
      .localCheckpoint(true)
    val v1 = Dedup.dedupKeepUnifiedDeltaFrom(m0,
        Dedup.unifiedDeltaPairsOf(base, baseE,
          docs.filter(c1d), embs.filter(c1v)), docs.filter(c1d))
      .localCheckpoint(true)
    val m1 = Dedup.membershipApply(m0, v1).localCheckpoint(true)
    val v2 = Dedup.dedupKeepUnifiedDeltaFrom(m1,
        Dedup.unifiedDeltaPairsOf(docs.filter(!isD || c1d), embs.filter(!isDV || c1v),
          docs.filter(isD && !c1d), embs.filter(isDV && !c1v)),
        docs.filter(isD && !c1d))
      .localCheckpoint(true)
    val want1 = verdictSet(v1)
    val want2 = verdictSet(v2)
    Dedup.releaseIntermediates()

    val got1 = verdictSet(UnifiedDedupStore.processCrawl(spark, path,
      docs.filter(c1d), embs.filter(c1v)))
    Dedup.releaseIntermediates()
    assert(got1 == want1,
      s"crawl1 store-only: ${(got1 -- want1).take(5)}; batch-only: ${(want1 -- got1).take(5)}")

    val got2 = verdictSet(UnifiedDedupStore.processCrawl(spark, path,
      docs.filter(isD && !c1d), embs.filter(isDV && !c1v)))
    Dedup.releaseIntermediates()
    assert(got2 == want2,
      s"crawl2 store-only: ${(got2 -- want2).take(5)}; batch-only: ${(want2 -- got2).take(5)}")

    val stored = memberSet(spark.read.parquet(s"$path/membership"))
    val rebuild = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs)))
    Dedup.releaseIntermediates()
    assert(stored == rebuild,
      s"store-only: ${(stored -- rebuild).take(5)}; rebuild-only: ${(rebuild -- stored).take(5)}")

    // compaction is answer-preserving: a third crawl over the compacted
    // store pairs exactly as over the fragmented one
    val probe = docs.filter(isD).limit(5).localCheckpoint(true)
    val probeE = embs.filter(isDV).limit(5).localCheckpoint(true)
    val (ixFrag, memFrag) = UnifiedDedupStore.read(spark, path)
    val beforeCompact = verdictSet(Dedup.dedupKeepUnifiedDeltaFrom(memFrag,
      Dedup.unifiedDeltaPairsPrepared(ixFrag, probe, probeE), probe))
    Dedup.releaseIntermediates()
    UnifiedDedupStore.compact(spark, path)
    val (ixC, memC) = UnifiedDedupStore.read(spark, path)
    val afterCompact = verdictSet(Dedup.dedupKeepUnifiedDeltaFrom(memC,
      Dedup.unifiedDeltaPairsPrepared(ixC, probe, probeE), probe))
    Dedup.releaseIntermediates()
    assert(afterCompact == beforeCompact, "compaction changed store answers")
  }

  test("journaled advance: crash before the membership swap rolls back, after it rolls forward — never half-advanced") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val isC = col("doc_id") % 4 === 0
    val isCV = col("vec_id") % 4 === 0
    val base = docs.filter(!isC); val baseE = embs.filter(!isCV)
    val crawl = docs.filter(isC); val crawlE = embs.filter(isCV)

    val path = java.nio.file.Files.createTempDirectory("graft-udstore-journal").toString
    UnifiedDedupStore.write(base, baseE, path)
    Dedup.releaseIntermediates()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val memBefore = memberSet(spark.read.parquet(s"$path/membership"))
    def exactFiles(): Set[String] =
      fs.listStatus(new Path(s"$path/exact")).map(_.getPath.getName)
        .filterNot(_.startsWith("_")).toSet
    val lanesBefore = exactFiles()

    // crash window A: journal committed + some lane files moved in, but the
    // membership swap never ran (no _crawl_ marker) → recover must roll BACK
    val id = "crashcrawl"
    fs.mkdirs(new Path(s"$path/_journal"))
    fs.mkdirs(new Path(s"$path/_staging/$id/exact"))
    fs.create(new Path(s"$path/exact/crawl-$id-part-00000.parquet"), true).close()
    fs.create(new Path(s"$path/_journal/$id.staged"), true).close()
    UnifiedDedupStore.recover(spark, path)
    assert(exactFiles() == lanesBefore, "roll-back must delete the crawl's moved lane files")
    assert(!fs.exists(new Path(s"$path/_journal/$id.staged")), "roll-back must clear the journal")
    assert(!fs.exists(new Path(s"$path/_staging/$id")), "roll-back must clear staging")
    assert(memberSet(spark.read.parquet(s"$path/membership")) == memBefore,
      "roll-back must leave membership at its pre-crawl state")

    // the crawl then re-runs cleanly (processCrawl auto-recovers first)
    UnifiedDedupStore.processCrawl(spark, path, crawl, crawlE, "crawlA")
    Dedup.releaseIntermediates()
    val memAfter = memberSet(spark.read.parquet(s"$path/membership"))
    assert(fs.exists(new Path(s"$path/_journal/crawlA.done")), "a completed advance must journal done")
    assert(fs.exists(new Path(s"$path/membership/_crawl_crawlA")), "the swap must stamp its crawl marker")
    val lanesAfter = exactFiles()

    // crash window B: swap completed but the journal never flipped to done
    // → recover must roll FORWARD (finish + mark done), changing nothing
    fs.rename(new Path(s"$path/_journal/crawlA.done"), new Path(s"$path/_journal/crawlA.staged"))
    UnifiedDedupStore.recover(spark, path)
    assert(fs.exists(new Path(s"$path/_journal/crawlA.done")), "roll-forward must mark the journal done")
    assert(exactFiles() == lanesAfter, "roll-forward must not touch completed lane files")
    assert(memberSet(spark.read.parquet(s"$path/membership")) == memAfter,
      "roll-forward must not touch the swapped membership")

    // the recovered, advanced store answers exactly as a full rebuild
    val rebuild = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs)))
    Dedup.releaseIntermediates()
    assert(memAfter == rebuild,
      s"store-only: ${(memAfter -- rebuild).take(5)}; rebuild-only: ${(rebuild -- memAfter).take(5)}")
  }

  test("conf drift between store build and crawl fails fast (SRP band stamp)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-udstore-drift").toString
    UnifiedDedupStore.write(docs.filter(col("doc_id") % 2 === 0),
      embs.filter(col("vec_id") % 2 === 0), path)
    Dedup.releaseIntermediates()
    spark.conf.set("spark.graft.dedup.srpBits", "16")
    try {
      val e = intercept[IllegalStateException] {
        UnifiedDedupStore.processCrawl(spark, path,
          docs.filter(col("doc_id") % 2 === 1),
          embs.filter(col("vec_id") % 2 === 1)).collect()
      }
      assert(e.getMessage.toLowerCase.contains("srp"),
        s"drift error must name the SRP conf: ${e.getMessage}")
    } finally {
      spark.conf.unset("spark.graft.dedup.srpBits")
      Dedup.releaseIntermediates()
    }
  }
}
