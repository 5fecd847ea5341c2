package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Sinks

/** The DISK-BACKED per-crawl unified-dedup loop — the production
  * lifecycle the incremental operators compose into, as a stored-artifact
  * API (the parquet twin of [[graft.streaming]]'s in-memory
  * `UnifiedDedupIndex`):
  *
  *   1. [[write]] — base-index time: persist the five lane indexes
  *      ([[Dedup.unifiedIndexesOf]] — exact/media hash rows, MinHash
  *      sets + band table, raw embeddings, SRP band rows, winnow
  *      fingerprints) plus the cluster membership under one root,
  *   2. [[processCrawl]] — per crawl: pair the crawl against the STORE
  *      ([[Dedup.unifiedDeltaPairsPrepared]] — touched-key index probes,
  *      never a base rescan), contract onto the stored membership for a
  *      delta-sized CC ([[Dedup.dedupKeepUnifiedDeltaFrom]]), emit the
  *      verdicts, then ADVANCE the store: the membership write-back
  *      ([[Dedup.membershipApply]], swapped in atomically — the
  *      replacement reads the live table lazily while writing next to
  *      it) and an append of the crawl's rows to every lane index.
  *
  * After K crawls the store answers for base ∪ crawl₁..ₖ exactly as a
  * fresh build over the union would (the two-crawl associativity of the
  * apply step, spec-proven on THIS disk loop in UnifiedDedupStoreSpec).
  * Conf safety rides the lane indexes' own stamps: the MinHash band
  * table, SRP band rows and winnow fingerprints each carry their conf
  * fingerprint in column metadata through the parquet round-trip, and
  * the delta cores fail fast on drift — a store built under different
  * knobs refuses to answer rather than silently under-pairing.
  *
  * Scale: per-crawl IO is the crawl's own rows + touched index keys +
  * the membership table (near-dup rows only); the appends are new
  * parquet files (crash-safe, like [[PostingsIndex.appendToPostings]]);
  * compaction of the accumulated appends is the same maintenance story
  * as the postings/IVF-PQ compactors.
  */
object UnifiedDedupStore {

  private val Lanes = Seq("exact", "media", "mhsets", "mhbands",
    "embs", "srpbands", "winnowfps")

  private def laneFrames(ix: Dedup.UnifiedIndexes): Seq[(String, DataFrame)] =
    Seq("exact" -> ix.exact, "media" -> ix.media, "mhsets" -> ix.sets,
      "mhbands" -> ix.bands, "embs" -> ix.embs, "srpbands" -> ix.srpBands,
      "winnowfps" -> ix.winnowFps)

  /** Base-index build: lane indexes + membership under `path`. */
  def write(docs: DataFrame, embs: DataFrame, path: String): Unit = {
    laneFrames(Dedup.unifiedIndexesOf(docs, embs)).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name")
    }
    Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs))
      .write.mode("overwrite").parquet(s"$path/membership")
  }

  /** The stored lane indexes + membership. */
  def read(spark: SparkSession, path: String): (Dedup.UnifiedIndexes, DataFrame) = {
    def t(name: String) = spark.read.parquet(s"$path/$name")
    (Dedup.UnifiedIndexes(t("exact"), t("media"), t("mhsets"), t("mhbands"),
      t("embs"), t("srpbands"), t("winnowfps")),
      spark.read.parquet(s"$path/membership"))
  }

  /** One crawl through the store: verdicts out, store advanced. The
    * verdicts materialize (eager localCheckpoint) BEFORE any store
    * mutation, so the returned frame stays valid and the write-back can
    * never read a half-advanced store.
    */
  def processCrawl(spark: SparkSession, path: String,
      crawlDocs: DataFrame, crawlEmbs: DataFrame): DataFrame = {
    val (ix, membership) = read(spark, path)
    val pairs = Dedup.unifiedDeltaPairsPrepared(ix, crawlDocs, crawlEmbs)
    val verdicts = Dedup.dedupKeepUnifiedDeltaFrom(membership, pairs, crawlDocs)
      .localCheckpoint(true)
    // membership write-back: the replacement scans the live table lazily
    // while writing next to it, then swaps in atomically
    Sinks.swapIn(spark, s"$path/membership")(
      Dedup.membershipApply(membership, verdicts))
    // lane appends: the crawl's rows land as new parquet files, same
    // derivations as the base build (unifiedIndexesOf is the ONE source)
    laneFrames(Dedup.unifiedIndexesOf(crawlDocs, crawlEmbs)).foreach {
      case (name, df) => df.write.mode("append").parquet(s"$path/$name")
    }
    verdicts
  }

  /** COMPACT every lane of the store (K crawl appends → K file sets per
    * lane): one bounded-file rewrite per lane via the shared rename
    * dance. The membership table is already replaced wholesale per crawl
    * (swapIn), so only the append-only lanes accumulate files.
    */
  def compact(spark: SparkSession, path: String): Unit =
    Lanes.foreach(name => Sinks.compactSwap(spark, s"$path/$name")(identity))
}
