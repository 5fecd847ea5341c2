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

  test("events_asof_next: one row per click; matched purchase is the EARLIEST one ≥ click ts") {
    val a = AsOf.eventsAsofNext(spark, sf)
    val clicks = Tables.events(spark, sf).filter(col("event_type") === "click").count()
    assert(a.count() == clicks)
    assert(a.filter(col("purchase_us") < col("ts_us")).count() == 0)
    assert(a.filter(col("latency_sec") < 0).count() == 0)
    val events = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "user_id", "event_type", "ts_us").collect()
    val purchByUser = events.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id"))
    a.collect().take(200).foreach { r =>
      val user = r.getAs[Long]("user_id")
      val cts = r.getAs[Long]("ts_us")
      // earliest purchase at-or-after; equal-instant ties to lowest event_id
      val expected = purchByUser.getOrElse(user, Array())
        .filter(_.getAs[Long]("ts_us") >= cts)
        .sortBy(p => (p.getAs[Long]("ts_us"), p.getAs[Long]("event_id")))
        .headOption.map(_.getAs[Long]("event_id"))
      val got = if (r.isNullAt(r.fieldIndex("purchase_event"))) None
                else Some(r.getAs[Long]("purchase_event"))
      assert(got == expected, s"user $user click ${r.getAs[Long]("event_id")}")
    }
  }

  test("events_asof_next: planted same-instant conversion, no-later-purchase null, equal-ts tie") {
    import spark.implicits._
    val rows = Seq(
      // user 1: click t=10 converts at t=20 (not the earlier t=5 purchase);
      //         click t=25 converts at t=30
      (1L, 1L, "click", 10L), (2L, 1L, "purchase", 5L),
      (3L, 1L, "purchase", 20L), (4L, 1L, "purchase", 30L),
      (5L, 1L, "click", 25L),
      // user 2: same-instant purchase converts at latency 0; duplicate
      //         equal-ts purchases tie to the LOWER event_id
      (6L, 2L, "click", 40L), (8L, 2L, "purchase", 40L), (7L, 2L, "purchase", 40L),
      // user 3: click after the last purchase → never converts
      (9L, 3L, "purchase", 50L), (10L, 3L, "click", 60L)
    ).map { case (id, u, t, s) => (id, u, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-asofn").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AsOf.eventsAsofNext(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("purchase_event"))) None
         else Some((r.getAs[Long]("purchase_event"), r.getAs[Long]("latency_sec"))))).toMap
    assert(out(1L) == Some((3L, 10L)), s"click 1 must convert at t=20: ${out(1L)}")
    assert(out(5L) == Some((4L, 5L)))
    assert(out(6L) == Some((7L, 0L)), s"same-instant tie must pick event 7: ${out(6L)}")
    assert(out(10L) == None, "a click after the last purchase never converts")
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
