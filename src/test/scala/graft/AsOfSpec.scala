package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup}
import graft.sources.Tables

class AsOfSpec extends SparkSpec {

  test("events_asof_join: one row per purchase; click is at or before it") {
    val a = AsOf.eventsAsofJoin(spark, sf)
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(a.count() == purchases)
    assert(a.filter(col("click_us") > col("ts_us")).count() == 0)
    assert(a.filter(col("gap_sec") < 0).count() == 0)
    // matched clicks really are click events
    val clickIds = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).toSet
    a.filter(col("click_event").isNotNull).select("click_event").collect()
      .foreach(r => assert(clickIds.contains(r.getLong(0))))
  }

  test("events_asof_join: the matched click is the LATEST one ≤ purchase ts") {
    val events = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "user_id", "event_type", "ts_us").collect()
    val clicksByUser = events.filter(_.getAs[String]("event_type") == "click")
      .groupBy(_.getAs[Long]("user_id"))
    val results = AsOf.eventsAsofJoin(spark, sf).collect()
    results.take(200).foreach { r =>
      val user = r.getAs[Long]("user_id")
      val pts = r.getAs[Long]("ts_us")
      val expected = clicksByUser.getOrElse(user, Array())
        .filter(_.getAs[Long]("ts_us") <= pts)
        .sortBy(c => (c.getAs[Long]("ts_us"), c.getAs[Long]("event_id")))
        .lastOption.map(_.getAs[Long]("event_id"))
      val got = if (r.isNullAt(r.fieldIndex("click_event"))) None
                else Some(r.getAs[Long]("click_event"))
      assert(got == expected, s"user $user purchase ${r.getAs[Long]("event_id")}")
    }
  }

  test("dedup_simhash_pairs: hamming verified ≤ tau and catches hamming-0 planted dups") {
    val p = Dedup.dedupSimhashPairs(spark, sf).collect()
    assert(p.nonEmpty)
    val sig = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    p.foreach { r =>
      val ham = java.lang.Long.bitCount(sig(r.getAs[Long]("doc_a")) ^ sig(r.getAs[Long]("doc_b")))
      assert(ham == r.getAs[Long]("hamming") && ham <= Dedup.SimHamMax)
    }
    // completeness at hamming 0: identical-signature pairs are emitted
    // exactly (never through banding); exhaustively check they're all there
    val found = p.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ids = sig.keys.toSeq.sorted
    for (a <- ids; b <- ids if a < b && sig(a) == sig(b))
      assert(found.contains((a, b)), s"missing identical-signature pair ($a,$b)")
  }

  test("dedup_simhash_pairs: a dup cluster LARGER than HotBandDocs keeps all hamming-0 pairs") {
    // regression: the old plan banded raw docs, so a >64-doc identical-
    // signature cluster overflowed every band bucket and lost even its
    // hamming-0 pairs; identical signatures now pair exactly, pre-banding
    import spark.implicits._
    val clusterSize = Dedup.HotBandDocs + 6
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_reg").toString
    val clusterText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val cluster = (0L until clusterSize.toLong).map(i =>
      (i, clusterText, "en", "synthetic", clusterText.length.toLong))
    val noise = (100L until 120L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", "en", "synthetic", 30L))
    (cluster ++ noise).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupSimhashPairs(spark, dir).collect()
    val found = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    for (a <- 0L until clusterSize.toLong; b <- (a + 1) until clusterSize.toLong)
      assert(found.contains((a, b)), s"missing in-cluster pair ($a,$b)")
    pairs.filter(r => r.getAs[Long]("doc_b") < clusterSize)
      .foreach(r => assert(r.getAs[Long]("hamming") == 0L))
    Dedup.releaseIntermediates()
    spark.catalog.clearCache()
  }
}
