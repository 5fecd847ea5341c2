package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, UnifiedDedupStore}
import graft.sources.Tables

/** `dedup_membership_retract` + `UnifiedDedupStore.retract`: takedown /
  * right-to-be-forgotten for the stored dedup membership. The retract
  * algebra must equal a full rebuild over the corpus minus the erased
  * set — including the two shapes min-id pass-through can never fake:
  * removing a CUT VERTEX must SPLIT its component, and removing a star
  * hub (the min-id canonical of an exact group) must RE-ELECT, not
  * disconnect. The disk loop must compose: write → crawl → retract →
  * crawl, ending exactly where a fresh build over (base ∪ c1 ∪ c2) ∖ S
  * lands.
  */
class DedupMembershipRetractSpec extends SparkSpec {

  private def memberSet(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select("doc_id", "cluster_id", "cluster_size", "is_canonical").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical"))).toSet

  private def basis(i: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
  private def near(i: Int, j: Int): Seq[Double] =
    Seq.tabulate(64)(d => if (d == i) 0.98 else if (d == j) 0.19899749371 else 0.0)

  private val lex = "alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four"

  /** Planted graph: {4,5,6} lexical near-dups, 6~7 semantic (the CUT
    * VERTEX bridge), 7=8 exact — one 5-doc component. {30,31,32} exact
    * triple whose min id 30 is the star hub. {40,41} untouched exact
    * pair. 50 unique.
    */
  private def corpus: (DataFrame, DataFrame) = {
    import spark.implicits._
    val semText = "entirely fresh vocabulary about mountain weather patterns and snowfall"
    val docs = Seq(
      (4L, lex + " ending", "en", "web"),
      (5L, lex + " different", "en", "web"),
      (6L, lex + " third variant", "en", "web"),
      (7L, semText, "en", "wiki"),
      (8L, semText, "en", "wiki"),
      (30L, "hello world", "en", "crawl"),
      (31L, "hello world", "en", "crawl"),
      (32L, "hello world", "en", "crawl"),
      (40L, "goodbye world", "en", "crawl"),
      (41L, "goodbye world", "en", "crawl"),
      (50L, "solitary document sharing no structure with anything else", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val embs = Seq(
      4L -> basis(0), 5L -> basis(1), 6L -> basis(11), 7L -> near(11, 41),
      8L -> basis(20), 30L -> basis(21), 31L -> basis(22), 32L -> basis(23),
      40L -> basis(24), 41L -> basis(25), 50L -> basis(26))
      .toDF("vec_id", "embedding")
    (docs, embs)
  }

  test("cut-vertex split + hub re-election: retract ≡ full rebuild over corpus ∖ S") {
    import spark.implicits._
    val (docs, embs) = corpus
    val stored = Dedup.clustersFromPairs(Dedup.unifiedPairsOf(docs, embs))
      .localCheckpoint(true)
    // sanity: the bridge really is load-bearing — one 5-doc component
    val before = memberSet(stored)
    assert(before.count(_._2 == 4L) == 5,
      s"planting broken: {4..8} must be ONE component via the 6~7 bridge: $before")
    assert(before.filter(m => Set(30L, 31L, 32L)(m._1)).map(_._2) == Set(30L))

    val s = Seq(6L, 30L).toDF("doc_id")
    val ix = Dedup.unifiedIndexesOf(docs, embs)
    val got = memberSet(Dedup.membershipRetractFrom(stored, ix, s))
    val want = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(
      docs.filter(!col("doc_id").isin(6L, 30L)),
      embs.filter(!col("vec_id").isin(6L, 30L)))))
    Dedup.releaseIntermediates()
    assert(got == want, s"retract-only: ${got -- want}; rebuild-only: ${want -- got}")
    // the component SPLIT: {4,5} and {7,8} are now separate clusters
    assert(got.filter(m => Set(4L, 5L)(m._1)).map(_._2) == Set(4L))
    assert(got.filter(m => Set(7L, 8L)(m._1)).map(_._2) == Set(7L))
    // the star hub re-elected: {31,32} survives with canon 31
    assert(got.filter(m => Set(31L, 32L)(m._1)) ==
      Set((31L, 31L, 2L, true), (32L, 31L, 2L, false)))
    // untouched cluster passes through byte-identically
    assert(got.filter(m => Set(40L, 41L)(m._1)) ==
      before.filter(m => Set(40L, 41L)(m._1)))
    // erased docs are gone
    assert(!got.exists(m => m._1 == 6L || m._1 == 30L))
  }

  test("disk loop composes: write → crawl → retract → crawl ≡ rebuild over (base ∪ c1 ∪ c2) ∖ S") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val m = Dedup.DeltaIdMod
    val isD = col("doc_id") % m === 0
    val isDV = col("vec_id") % m === 0
    val c1d = col("doc_id") % (2 * m) === 0
    val c1v = col("vec_id") % (2 * m) === 0

    val path = java.nio.file.Files.createTempDirectory("graft-udstore-retract").toString
    UnifiedDedupStore.write(docs.filter(!isD), embs.filter(!isDV), path)
    Dedup.releaseIntermediates()
    UnifiedDedupStore.processCrawl(spark, path, docs.filter(c1d), embs.filter(c1v))
    Dedup.releaseIntermediates()

    // erase a slice that includes stored canonicals and clustered docs
    val isS = col("doc_id") % 21 === 0
    val isSV = col("vec_id") % 21 === 0
    UnifiedDedupStore.retract(spark, path,
      docs.filter(isS).select("doc_id"), "takedown1")
    Dedup.releaseIntermediates()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$path/_journal/takedown1.done")),
      "a completed retraction must journal done")
    // every lane is scrubbed: no retracted id survives in any index
    Seq("exact" -> "doc_id", "media" -> "doc_id", "mhsets" -> "doc_id",
      "mhbands" -> "doc_id", "embs" -> "vec_id", "srpbands" -> "vec_id",
      "winnowfps" -> "doc_id").foreach { case (lane, key) =>
      val left = spark.read.parquet(s"$path/$lane")
        .filter(col(key) % 21 === 0).count()
      assert(left == 0, s"lane $lane still holds $left retracted rows")
    }

    // a later crawl pairs against the scrubbed store
    UnifiedDedupStore.processCrawl(spark, path,
      docs.filter(isD && !c1d && !isS), embs.filter(isDV && !c1v && !isSV))
    Dedup.releaseIntermediates()

    val stored = memberSet(spark.read.parquet(s"$path/membership"))
    val rebuild = memberSet(Dedup.clustersFromPairs(Dedup.unifiedPairsOf(
      docs.filter(!isS), embs.filter(!isSV))))
    Dedup.releaseIntermediates()
    assert(stored == rebuild,
      s"store-only: ${(stored -- rebuild).take(5)}; rebuild-only: ${(rebuild -- stored).take(5)}")
  }
}
