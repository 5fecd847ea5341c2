package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Events
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, Session}

class EventsSpec extends SparkSpec {

  test("events_windowed: totals add up to the event count") {
    val w = Events.eventsWindowed(spark, sf)
    val total = w.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == sources.Tables.events(spark, sf).count())
  }

  test("events_sessionize: sessions partition each user's events; gaps respected") {
    val s = Events.eventsSessionize(spark, sf)
    val total = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == sources.Tables.events(spark, sf).count())
    // session_idx dense from 1; durations non-negative
    val bad = s.groupBy("user_id")
      .agg(min("session_idx").as("mn"), max("session_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.count() == 0)
    assert(s.filter(col("duration_sec") < 0).count() == 0)
  }

  test("events_funnel: converted ≤ signups ≤ users") {
    val f = Events.eventsFunnel(spark, sf).collect()(0)
    assert(f.getAs[Long]("n_converted") <= f.getAs[Long]("n_signup"))
    assert(f.getAs[Long]("n_signup") <= f.getAs[Long]("n_users"))
    val conv = f.getAs[Double]("conversion")
    assert(conv >= 0.0 && conv <= 1.0)
  }

  test("events_top_users: sorted by spend, purchases ≤ events") {
    val t = Events.eventsTopUsers(spark, sf).collect()
    val vals = t.map(_.getAs[Double]("total_value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    t.foreach(r => assert(r.getAs[Long]("n_purchases") <= r.getAs[Long]("n_events")))
  }

  test("events_enrich_join: plan broadcasts the customer dim") {
    val plan = Events.eventsEnrichJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("events_retention: offset-0 retention is 1.0 and actives never exceed cohort") {
    val r = Events.eventsRetention(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_active") <= row.getAs[Long]("cohort_size"))
      val ret = row.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      assert(row.getAs[Long]("week_offset") >= 0)
    }
    // every user is active in their own first week
    r.filter(_.getAs[Long]("week_offset") == 0L)
      .foreach(row => assert(row.getAs[Long]("n_active") == row.getAs[Long]("cohort_size")))
    // cohort sizes cover every user exactly once
    val cohortTotal = r.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("cohort_size")).sum
    val nUsers = sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cohortTotal == nUsers)
  }

  test("events_session_paths: session totals agree with events_sessionize") {
    val p = Events.eventsSessionPaths(spark, sf).collect()
    assert(p.nonEmpty && p.length <= 20)
    val counts = p.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // each path's event count = path length; spot-check total sessions bound
    val nSessions = Events.eventsSessionize(spark, sf).count()
    assert(counts.sum <= nSessions)
    p.foreach(r => assert(r.getAs[String]("path").nonEmpty))
  }

  // ---- Structured Streaming variants ----

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("streaming windowedCounts: MemoryStream events land in hourly windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(30), 1, "click", 2.0),
        Event(3, ts(65), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
      assert(rows.map(_.getAs[Long]("n_events")).sum == 3)
      assert(rows.length == 2) // two hourly windows
    } finally q.stop()
  }

  test("streaming madAnomalyTapStream: live hours flag exactly as the batch audit would") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // baseline trained on 10 steady history hours at 3 events/hour
    val history = (for { h <- 0 until 10; i <- 0 until 3 }
      yield Event(h * 10L + i, ts(h * 60), 1L, "click", 1.0)).toDS().toDF()
    val baseline = Events.madBaselineOf(Events.hourlyCountsOf(
      history.withColumn("ts", col("ts"))))
    assert(baseline.collect().head.getAs[Long]("med2") == 6L) // median 3
    val mem = MemoryStream[Event]
    val q = StreamOps.madAnomalyTapStream(mem.toDF(), baseline)
      .writeStream.format("memory").queryName("madtap").outputMode("append").start()
    try {
      // hour 20: steady (3 events — no flag); hour 21: burst (30 events)
      mem.addData((0 until 3).map(i => Event(900L + i, ts(20 * 60 + i), 1L, "click", 1.0)): _*)
      mem.addData((0 until 30).map(i => Event(950L + i, ts(21 * 60 + i), 1L, "click", 1.0)): _*)
      // advance the watermark far enough to close both hourly windows
      mem.addData(Event(999L, ts(30 * 60), 1L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("madtap").collect()
      assert(rows.length == 1, s"only the burst hour flags: ${rows.mkString(";")}")
      assert(rows.head.getAs[Long]("cnt") == 30L)
      assert(rows.head.getAs[Long]("mad4") == 0L)
    } finally q.stop()
  }

  test("streaming sessionize: closed sessions match batch semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // opens a second session → first session closes
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(50), 1, "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess").as[Session].collect()
      assert(closed.length == 1)
      assert(closed(0).n_events == 2 && closed(0).sum_value == 3.0)
      assert(closed(0).session_start_us == StreamOps.micros(ts(0)))
      assert(closed(0).session_end_us == StreamOps.micros(ts(10)))
    } finally q.stop()
  }

  test("streaming dedup: duplicate events dropped within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(0), 1, "click", 1.0),  // exact dup of event 1
        Event(3, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("streaming deltaDedupStream: stream-static join vs stored band index ≡ batch") {
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % Dedup.DeltaIdMod =!= 0)
    val baseSets = Dedup.hashedShingleSetsOf(base).cache()
    val baseBands = Dedup.bandTableOf(baseSets).cache()
    val delta = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
    def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    // same code path over a batch DataFrame is the reference result
    val expected = toSet(StreamOps.deltaDedupStream(delta, baseBands, baseSets).collect())
    assert(expected.nonEmpty, "planted dups must straddle the snapshot split")
    // and it must agree with the batch incremental operator's delta×base lane
    val batchLane = toSet(Dedup.dedupDelta(spark, sf).collect())
      .filter(p => (p._1 % Dedup.DeltaIdMod == 0) != (p._2 % Dedup.DeltaIdMod == 0))
    assert(expected == batchLane)
    // now the same delta docs arriving as a STREAM across two micro-batches
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.deltaDedupStream(
        mem.toDF().toDF("doc_id", "text"), baseBands, baseSets)
      .writeStream.format("memory").queryName("ddelta").outputMode("append").start()
    try {
      val rows = delta.as[(Long, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      assert(toSet(spark.table("ddelta").collect()) == expected)
    } finally { q.stop(); baseSets.unpersist(); baseBands.unpersist() }
  }

  test("streaming srpDedupStream: stateless SRP lane ≡ batch operator's delta×base pairs") {
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val emb = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val baseBands = Dedup.srpBandRows(base).cache()
    def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos"))).toSet
    // same code path over a batch frame is the reference result…
    val expected = toSet(StreamOps.srpDedupStream(delta, baseBands, base).collect())
    assert(expected.nonEmpty, "planted embedding near-dups must straddle the split")
    // …and must agree with the batch operator restricted to delta×base
    // (cap regimes coincide here: nothing is hot at spec scale)
    val batchCross = toSet(Dedup.dedupEmbeddingSrp(spark, sf).collect())
      .filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
    assert(expected == batchCross)
    // now the same delta vectors arriving as a STREAM in two micro-batches
    val mem = MemoryStream[(Long, Array[Double])]
    val q = StreamOps.srpDedupStream(
        mem.toDF().toDF("vec_id", "embedding"), baseBands, base)
      .writeStream.format("memory").queryName("srpd").outputMode("append").start()
    try {
      val rows = delta.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))")).as[(Long, Array[Double])].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      // a pair sharing several cool buckets/probes emits once per hit —
      // sinks chain dropDuplicates; the spec normalizes to a set
      assert(toSet(spark.table("srpd").collect()) == expected)
    } finally { q.stop(); baseBands.unpersist() }
  }

  test("IncrementalDedupIndex: streamed lanes ≡ one-shot batch delta, incl. cross-batch intra-delta pair") {
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    // delta = the standard snapshot PLUS both ends of one known near-dup
    // pair, which the stream will deliver in SEPARATE micro-batches — the
    // cross-batch intra-delta case the single-query lane cannot see
    val pair = Dedup.dedupMinhashLsh(spark, sf).orderBy("doc_a", "doc_b").limit(1).collect().head
    val (pa, pb) = (pair.getAs[Long]("doc_a"), pair.getAs[Long]("doc_b"))
    val deltaIds = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
      .select("doc_id").as[Long].collect().toSet + pa + pb
    val base = docs.filter(!col("doc_id").isInCollection(deltaIds))
    val delta = docs.filter(col("doc_id").isInCollection(deltaIds))
    val baseSets = Dedup.hashedShingleSetsOf(base).cache()
    val baseBands = Dedup.bandTableOf(baseSets).cache()
    def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    // full-hindsight arbiter: the one-shot batch incremental core
    val expected = toSet(Dedup.dedupDeltaFrom(baseSets, baseBands, delta).collect())
    assert(expected.exists(p => p._1 == pa && p._2 == pb),
      "the chosen pair must be a delta-internal near-dup")
    val idx = new StreamOps.IncrementalDedupIndex(baseSets, baseBands)
    val collected = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        collected.synchronized { collected ++= toSet(idx.processBatch(batch).collect()) }
        ()
      }
      .start()
    try {
      val rows = delta.as[(Long, String)].collect()
      // pa rides micro-batch 1, pb micro-batch 2
      mem.addData(rows.filter(_._1 != pb).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 == pb).toIndexedSeq)
      q.processAllAvailable()
      assert(collected.toSet == expected,
        s"stream-only: ${collected.toSet -- expected}; batch-only: ${expected -- collected}")
    } finally { q.stop(); baseSets.unpersist(); baseBands.unpersist() }
  }

  test("IncrementalDedupIndex: a micro-batch flooding one bucket is capped like the batch path") {
    import spark.implicits._
    import graft.operators.Dedup
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // base holds ONE doc in the bucket; a burst of 5 identical docs arrives
    // in a single micro-batch → base+batch occupancy 6 > cap 3 → dropped
    // (the single-query lane's stored-index-only cap would have passed it)
    val base = Seq((1L, text)).toDF("doc_id", "text")
    val burst = (100L to 104L).map(i => (i, text)).toDF("doc_id", "text")
    val baseSets = Dedup.hashedShingleSetsOf(base)
    val baseBands = Dedup.bandTableOf(baseSets)
    try {
      spark.conf.set("spark.graft.dedup.hotBandDocs", "3")
      val idx = new StreamOps.IncrementalDedupIndex(baseSets, baseBands)
      assert(idx.processBatch(burst).collect().isEmpty,
        "base+batch bucket of 6 must be dropped at cap 3")
    } finally spark.conf.unset("spark.graft.dedup.hotBandDocs")
  }

  test("SimhashDedupIndex: streamed lane ≡ one-shot batch simhash delta, incl. cross-batch pair") {
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    // delta = the standard snapshot PLUS both ends of one known simhash
    // pair, delivered in SEPARATE micro-batches (the cross-batch case)
    val pair = Dedup.dedupSimhashPairs(spark, sf).orderBy("doc_a", "doc_b")
      .limit(1).collect().head
    Dedup.releaseIntermediates()
    val (pa, pb) = (pair.getAs[Long]("doc_a"), pair.getAs[Long]("doc_b"))
    val deltaIds = docs.filter(col("doc_id") % Dedup.DeltaIdMod === 0)
      .select("doc_id").as[Long].collect().toSet + pa + pb
    val base = docs.filter(!col("doc_id").isInCollection(deltaIds))
    val delta = docs.filter(col("doc_id").isInCollection(deltaIds))
    val baseSigs = Dedup.simhashIndexOf(base).cache()
    def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSet
    val expected = toSet(Dedup.dedupSimhashDeltaFrom(baseSigs, delta).collect())
    Dedup.releaseIntermediates()
    assert(expected.exists(p => p._1 == pa && p._2 == pb),
      "the chosen pair must be a delta-internal simhash pair")
    val idx = new StreamOps.SimhashDedupIndex(baseSigs)
    val collected = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        collected.synchronized { collected ++= toSet(idx.processBatch(batch).collect()) }
        ()
      }
      .start()
    try {
      val rows = delta.as[(Long, String)].collect()
      mem.addData(rows.filter(_._1 != pb).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 == pb).toIndexedSeq)
      q.processAllAvailable()
      assert(collected.toSet == expected,
        s"stream-only: ${collected.toSet -- expected}; batch-only: ${expected -- collected}")
    } finally { q.stop(); baseSigs.unpersist() }
  }

  test("simhash incremental core: a batch flooding one band bucket is capped on index ∪ batch occupancy") {
    import spark.implicits._
    import graft.operators.Dedup
    // planted signatures one bit apart: each burst sig flips a distinct
    // low bit of the base sig, so all six signatures share the three
    // untouched 16-bit bands (bucket occupancy 6) and every pair is
    // within hamming ≤ 3 of the base — the near lane finds them at the
    // default cap and must drop them once index ∪ batch occupancy
    // exceeds a tight cap (the [[SimhashDedupIndex]] stream tap runs
    // exactly this prepared core per micro-batch)
    val sig0 = 0x0f0f0f0f0f0f0f0fL
    val index = Seq((1L, sig0)).toDF("doc_id", "simhash")
    val batch = (0 until 5).map(i => (100L + i, sig0 ^ (1L << i)))
      .toDF("doc_id", "simhash")
    val open = Dedup.dedupSimhashDeltaPrepared(index, batch).collect()
    Dedup.releaseIntermediates()
    assert(open.exists(_.getAs[Long]("hamming") > 0),
      "the planted burst must produce near-lane pairs at the default cap")
    try {
      spark.conf.set("spark.graft.dedup.hotBandDocs", "1")
      val capped = Dedup.dedupSimhashDeltaPrepared(index, batch).collect()
      Dedup.releaseIntermediates()
      assert(!capped.exists(_.getAs[Long]("hamming") > 0),
        "near-lane pairs must be dropped when index+batch bucket occupancy exceeds the cap")
    } finally spark.conf.unset("spark.graft.dedup.hotBandDocs")
  }

  test("deltaDedupStream: hot-bucket cap on the stored index drops oversized buckets") {
    import spark.implicits._
    import graft.operators.Dedup
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = (1L to 6L).map(i => (i, text)).toDF("doc_id", "text")
    val delta = Seq((100L, text)).toDF("doc_id", "text")
    val baseSets = Dedup.hashedShingleSetsOf(base)
    val baseBands = Dedup.bandTableOf(baseSets)
    // identical docs ⇒ identical signatures ⇒ every band bucket holds all 6
    val normal = StreamOps.deltaDedupStream(delta, baseBands, baseSets).collect()
    assert(normal.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet ==
      (1L to 6L).map(i => (i, 100L)).toSet)
    try {
      spark.conf.set("spark.graft.dedup.hotBandDocs", "3")
      val capped = StreamOps.deltaDedupStream(delta, baseBands, baseSets).collect()
      assert(capped.isEmpty, "buckets of 6 must be dropped at cap 3")
    } finally spark.conf.unset("spark.graft.dedup.hotBandDocs")
  }

  test("streaming sessionize agrees with batch events_sessionize on real data") {
    import spark.implicits._
    // batch-drain variant over the real events table
    val events = sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val streamStyle = StreamOps.openSessions(events).collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).sorted
    val batch = Events.eventsSessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).sorted
    assert(streamStyle.sameElements(batch))
  }

  test("events_spike: every flagged bucket beats 1.5x its observed trailing mean") {
    val rows = Events.eventsSpike(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, n, s) = (r.getAs[Long]("cnt"), r.getAs[Long]("prev_n"), r.getAs[Long]("prev_sum"))
      assert(n >= 6 && 2 * cnt * n > 3 * s)
    }
    // spikes are rare: far fewer flagged buckets than hourly buckets exist
    val hourly = sources.Tables.events(spark, sf)
      .select(expr("unix_micros(date_trunc('HOUR', ts))").as("h"), col("event_type"))
      .distinct().count()
    assert(rows.length < hourly / 4)
  }

  test("events_percentiles: monotone quartiles; approx sketch stays inside its rank-error bound") {
    val exact = Events.eventsPercentiles(spark, sf).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (a, b, c, d) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(a <= b && b <= c && c <= d, s"non-monotone percentiles: $r")
    }
    // the scale path: for each approx percentile, the TRUE rank of the
    // returned value must be within 1/accuracy (+slack for interpolation
    // between discrete ranks) of the requested quantile
    val accuracy = 1000
    val approx = Events.eventsPercentilesApprox(spark, sf, accuracy).collect()
    val values = sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Double]("value")).sorted).toMap
    approx.foreach { r =>
      val vs = values(r.getAs[String]("event_type"))
      for ((p, colName) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")) {
        val v = r.getAs[Double](colName)
        val rank = vs.count(_ <= v).toDouble / vs.length
        val tol = 1.0 / accuracy + 2.0 / vs.length
        assert(rank >= p - tol && rank <= p + tol + 1.0 / accuracy,
          s"${r.getAs[String]("event_type")} $colName: approx $v has rank $rank vs target $p (n=${vs.length})")
      }
    }
  }

  test("events_attribution: last-touch pick ≡ all-pairs interval join reduced to its max") {
    val df = Events.eventsAttribution(spark, sf)
    // the user_id equi-key must carry the join — a keyless time-range plan
    // degenerates to a nested loop, the shape to refuse at 100 TB
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan.take(1500))
    val attr = df.collect()
    assert(attr.nonEmpty)
    attr.foreach { r =>
      val (p, c) = (r.getAs[Long]("purchase_us"), r.getAs[Long]("click_us"))
      assert(c <= p && c >= p - 3600000000L, s"click outside window: $r")
    }
    // the streaming interval join emits ALL in-window pairs; reducing it to
    // the per-purchase (click_us, click_id) max must equal attribution
    val allPairs = StreamOps.clickPurchaseJoin(sources.Tables.events(spark, sf))
      .select(col("purchase_id"), expr("unix_micros(click_ts)").as("click_us"),
        col("click_id")).collect()
    val lastTouch = allPairs.groupBy(_.getAs[Long]("purchase_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("click_us"), r.getAs[Long]("click_id"))).max)
      .toMap
    val got = attr.map(r => r.getAs[Long]("purchase_id") ->
      (r.getAs[Long]("click_us"), r.getAs[Long]("click_id"))).toMap
    assert(got == lastTouch)
  }

  test("streaming funnel: state expires on watermark, stages match the strict-order rule") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel_small").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "signup", 0.0),    // converts: purchase strictly later
        Event(2, ts(10), 1, "purchase", 5.0),
        Event(3, ts(0), 2, "purchase", 5.0),  // purchase BEFORE signup: no conversion
        Event(4, ts(10), 2, "signup", 0.0),
        Event(5, ts(0), 3, "signup", 0.0),    // signup only
        Event(6, ts(0), 4, "purchase", 1.0),  // purchase only
        Event(7, ts(0), 5, "signup", 0.0),    // same-instant purchase: strict >, no conversion
        Event(8, ts(0), 5, "purchase", 2.0))
      q.processAllAvailable()
      // push the watermark far past every user's last activity + expiry,
      // then one more batch so the timed-out state is processed
      mem.addData(Event(100, ts(100000), -1, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(101, ts(100001), -1, "click", 0.0))
      q.processAllAvailable()
      val closed = spark.table("funnel_small").as[StreamOps.FunnelClose]
        .collect().filter(_.user_id > 0).map(c => c.user_id -> c).toMap
      assert(closed.keySet == Set(1L, 2L, 3L, 4L, 5L), "every expired user emits exactly once")
      assert(closed(1L).converted)
      assert(!closed(2L).converted && closed(2L).signup_us == StreamOps.micros(ts(10)))
      assert(!closed(3L).converted)
      assert(closed(4L).signup_us == -1L && !closed(4L).converted)
      assert(!closed(5L).converted)
    } finally q.stop()
  }

  test("streaming funnel agrees with batch events_funnel on real data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (StreamOps.micros(e.ts), e.event_id))
    val mem = MemoryStream[Event]
    // expiry longer than the corpus' event-time span, so every user closes
    // exactly once — at the default 2h horizon users legitimately expire
    // and re-enter mid-stream, which the one-shot batch query can't express
    val q = StreamOps.funnel(mem.toDS(), expiry = "2000 hours")
      .writeStream.format("memory").queryName("funnel_real").outputMode("append").start()
    try {
      val (h1, h2) = events.splitAt(events.length / 2)
      mem.addData(h1.toSeq); q.processAllAvailable()
      mem.addData(h2.toSeq); q.processAllAvailable()
      val farUs = StreamOps.micros(events.last.ts) + 200L * 24 * 3600 * 1000000
      val far = new Timestamp(farUs / 1000)
      mem.addData(Event(-100, far, -1, "click", 0.0)); q.processAllAvailable()
      mem.addData(Event(-101, new Timestamp(farUs / 1000 + 1000), -1, "click", 0.0))
      q.processAllAvailable()
      val closed = spark.table("funnel_real").as[StreamOps.FunnelClose]
        .collect().filter(_.user_id >= 0)
      val batch = Events.eventsFunnel(spark, sf).collect()(0)
      assert(closed.length == batch.getAs[Long]("n_users"))
      assert(closed.count(_.signup_us >= 0) == batch.getAs[Long]("n_signup"))
      assert(closed.count(_.converted) == batch.getAs[Long]("n_converted"))
    } finally q.stop()
  }

  test("streaming clickPurchaseJoin: interval join attributes clicks within 1h only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.clickPurchaseJoin(mem.toDF())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 0.0),      // 00:00 — outside the 1h window
        Event(2, ts(100), 1, "click", 0.0),    // 01:40 — inside
        Event(3, ts(130), 1, "click", 0.0),    // 02:10 — inside
        Event(4, ts(150), 1, "purchase", 9.0), // 02:30
        Event(5, ts(150), 2, "purchase", 5.0)) // user 2 has no clicks
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      assert(rows.map(_.getAs[Long]("click_id")).sorted.sameElements(Array(2L, 3L)))
      assert(rows.forall(_.getAs[Long]("purchase_id") == 4L))
    } finally q.stop()
  }

  test("streaming curateStream ≡ batch quality + exact-contam verdicts, incl. via MemoryStream") {
    import spark.implicits._
    import graft.operators.Curation
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val isEval = col("doc_id") % Curation.FuzzyEvalMod === 0
    val train = docs.filter(!isEval).cache()
    val evalHashes = Curation.evalNgramHashesOf(docs, isEval).cache()
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_words"), r.getAs[Long]("n_stop"),
        r.getAs[Long]("top_bg"), r.getAs[Boolean]("q_keep"), r.getAs[String]("reasons"),
        r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_matched"),
        r.getAs[Boolean]("contam_exact"))).toMap
    // batch reference: quality columns from the explode→groupBy path,
    // contamination from the broadcast-join sweep
    val q = Curation.qualityFilterOf(train).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val c = Curation.decontaminateFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // same code path over a batch frame first (fast, exact compare)…
    val got = toMap(StreamOps.curateStream(train, evalHashes).collect())
    assert(got.keySet == q.keySet && got.keySet == c.keySet)
    got.foreach { case (id, (nw, ns, tb, keep, reasons, ng, nm, cx)) =>
      assert((nw, ns, tb, keep, reasons) == (q(id).getAs[Long]("n_words"),
        q(id).getAs[Long]("n_stop"), q(id).getAs[Long]("top_bg"),
        q(id).getAs[Boolean]("keep"), q(id).getAs[String]("reasons")),
        s"quality mismatch at doc $id")
      assert((ng, nm, cx) == (c(id).getAs[Long]("n_ngrams"),
        c(id).getAs[Long]("n_matched"), c(id).getAs[Boolean]("contaminated")),
        s"contam mismatch at doc $id")
    }
    // …then the same docs arriving as a stream in two micro-batches
    val mem = MemoryStream[(Long, String)]
    val sq2 = StreamOps.curateStream(mem.toDF().toDF("doc_id", "text"), evalHashes)
      .writeStream.format("memory").queryName("curate").outputMode("append").start()
    try {
      val rows = train.as[(Long, String)].collect()
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); sq2.processAllAvailable()
      mem.addData(b.toIndexedSeq); sq2.processAllAvailable()
      assert(toMap(spark.table("curate").collect()) == got)
    } finally { sq2.stop(); train.unpersist(); evalHashes.unpersist() }
  }

  test("streaming dsirScoreStream ≡ batch DSIR pool scores") {
    import spark.implicits._
    import graft.operators.Selection
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf)
    val ratios = Selection.dsirRatiosOf(docs).cache()
    val batch = Selection.dsirPoolScoresOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("score"))).toMap
    assert(batch.values.exists(_._2 != 0L), "all-zero scores: vacuous corpus")
    // pool docs arriving as a stream in two micro-batches score identically
    val pool = docs.filter(col("lang") =!= Selection.DsirTargetLang)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.dsirScoreStream(mem.toDF().toDF("doc_id", "text"), ratios)
      .writeStream.format("memory").queryName("dsirscores").outputMode("append").start()
    try {
      val (a, b) = pool.splitAt(pool.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("dsirscores").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_feats"), r.getAs[Long]("score"))).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (id, (nf, s)) =>
        val (bnf, bs) = batch(id)
        assert(nf == bnf && s == bs,
          s"doc $id: stream ($nf, $s) vs batch ($bnf, $bs)")
      }
    } finally { q.stop(); ratios.unpersist() }
  }

  test("streaming langIdNbStream ≡ batch NB scoring, incl. the no-in-vocab '' contract") {
    import spark.implicits._
    import graft.operators.Classify
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf)
    val m = Classify.LangIdEvalMod
    val tok = Classify.tokArrFor("chartri")
    val model = Classify.nbTrainOf(docs.filter(col("doc_id") % m =!= 0), tok)
    val classes = model.classes.cache()
    val sparse = model.sparse.cache()
    val evalDocs = docs.filter(col("doc_id") % m === 0).select("doc_id", "text")
    val batch = Classify.nbScoreAllOf(evalDocs, tok, model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch.values.exists(_.nonEmpty), "vacuous model: no prediction at all")
    // plus one planted doc too short for any trigram → must emit ''
    val rows = evalDocs.as[(Long, String)].collect() :+ ((888888L, "xy"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.langIdNbStream(mem.toDF().toDF("doc_id", "text"), classes, sparse)
      .writeStream.format("memory").queryName("lidstream").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("lidstream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
      assert((got - 888888L) == batch)
      assert(got(888888L) == "")
    } finally { q.stop(); classes.unpersist(); sparse.unpersist() }
  }

  test("streaming fuzzyContamStream rolls up to the batch fuzzy-decontamination rows") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    implicit val sq = spark.sqlContext
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val isEval = col("doc_id") % Curation.FuzzyEvalMod === 0
    val evalSets = Dedup.hashedShingleSetsOf(docs.filter(isEval)).cache()
    val evalBands = Dedup.bandTableOf(evalSets).cache()
    val batch = Curation.decontaminateFuzzyFrom(docs, isEval).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_eval_hits"), r.getAs[Long]("top_eval_id"),
          r.getAs[Double]("top_jaccard"))).toMap
    Dedup.releaseIntermediates()
    assert(batch.values.exists(_._1 > 0), "planted cross-set pairs must exist at this sf")
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.fuzzyContamStream(
        mem.toDF().toDF("doc_id", "text"), evalBands, evalSets)
      .writeStream.format("memory").queryName("fuzzyq").outputMode("append").start()
    try {
      val rows = docs.filter(!isEval).as[(Long, String)].collect()
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      // sink-side rollup of the hit stream (distinct first: a pair emits
      // once per shared band) must equal the batch operator's flagged rows
      val hits = spark.table("fuzzyq").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"),
          r.getAs[Double]("jaccard"))).distinct
      val rolled = hits.groupBy(_._1).map { case (id, hs) =>
        val top = hs.minBy(h => (-h._3, h._2))
        id -> (hs.length.toLong, top._2, top._3)
      }
      rolled.foreach { case (id, r) => assert(batch(id) == r, s"doc $id: $r vs ${batch(id)}") }
      assert(batch.filter(_._2._1 > 0).keySet == rolled.keySet,
        "every batch-flagged doc must surface in the stream")
    } finally { q.stop(); evalSets.unpersist(); evalBands.unpersist() }
  }

  test("events_seasonality: planted instants land in the right weekday/hour cells; grid partitions the log") {
    import spark.implicits._
    // 1970-01-01 (Thursday, epoch day 0) 00:10 → dow 3, hour 0;
    // 1970-01-05 (Monday) 09:30 → dow 0, hour 9; two copies of the latter
    val mk = (id: Long, us: Long) =>
      (id, 1L, "click", new java.sql.Timestamp(us / 1000L))
    val rows = Seq(
      mk(1L, 10L * 60 * 1000000),
      mk(2L, (4L * 86400 + 9L * 3600 + 30 * 60) * 1000000),
      mk(3L, (4L * 86400 + 9L * 3600 + 45 * 60) * 1000000)
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-season").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.eventsSeasonality(spark, dir).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")) -> r.getAs[Long]("n_events")).toMap
    assert(out == Map((3L, 0L) -> 1L, (0L, 9L) -> 2L))
    // real log: the grid partitions the event count exactly
    val grid = Events.eventsSeasonality(spark, sf).collect()
    assert(grid.map(_.getAs[Long]("n_events")).sum ==
      sources.Tables.events(spark, sf).count())
    assert(grid.forall(r => r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") <= 6
      && r.getAs[Long]("hour") >= 0 && r.getAs[Long]("hour") <= 23))
  }

  test("streaming semDecontamStream rolls up to the batch semantic-decontamination rows") {
    import spark.implicits._
    import graft.operators.Curation
    implicit val sq = spark.sqlContext
    val embs = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val isEval = col("vec_id") % Curation.FuzzyEvalMod === 0
    val batch = Curation.decontaminateSemanticFrom(embs, isEval).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_sem_hits"),
          if (r.isNullAt(2)) -1L else r.getAs[Long]("top_eval_id"),
          r.getAs[Double]("top_cos"))).toMap
    assert(batch.values.exists(_._1 > 0), "cross-set cosine hits must exist at this sf")
    val evalEmbs = embs.filter(isEval).cache()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.semDecontamStream(
        mem.toDF().toDF("vec_id", "embedding"), evalEmbs)
      .writeStream.format("memory").queryName("semq").outputMode("append").start()
    try {
      val rows = embs.filter(!isEval).as[(Long, Seq[Float])].collect()
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val hits = spark.table("semq").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("eval_id"),
          r.getAs[Double]("cos")))
      val rolled = hits.groupBy(_._1).map { case (id, hs) =>
        val top = hs.minBy(h => (-h._3, h._2))
        id -> (hs.length.toLong, top._2, top._3)
      }
      rolled.foreach { case (id, r) => assert(batch(id) == r, s"doc $id: $r vs ${batch(id)}") }
      assert(batch.filter(_._2._1 > 0).keySet == rolled.keySet,
        "every batch-flagged doc must surface in the stream, and only those")
    } finally { q.stop(); evalEmbs.unpersist() }
  }

  test("streaming winnowContainStream rolls up to the batch delta containment pairs") {
    import spark.implicits._
    import graft.operators.{Dedup, GraftConf, TextAnalysis}
    implicit val sq = spark.sqlContext
    val k = GraftConf.winnowK
    val w = GraftConf.winnowW
    val cap = GraftConf.winnowFpCap
    val span = (1 to 12).map(i => s"sp$i").mkString(" ")
    val hot = (1 to 12).map(i => s"hot$i").mkString(" ")
    // base: one doc embedding the span, bystanders, and `cap` docs all
    // carrying the hot span (its fingerprints hit df = cap → ineligible).
    // ids avoid multiples of 10 (the delta split), stream ids are ≡ 0 mod 10
    val hotIds = (21L to 40L).filter(_ % 10 != 0).take(cap.toInt)
    val base = (Seq(
      (1L, (1 to 15).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 5).map(i => s"p$i").mkString(" ") + " " + span + " " +
        (1 to 4).map(i => s"q$i").mkString(" ")),
      (3L, (1 to 15).map(i => s"c$i").mkString(" "))) ++
      hotIds.map(id => (id, hot + " " + (1 to 3).map(i => s"u${id}x$i").mkString(" "))))
      .toDF("doc_id", "text")
    // stream: S1 ⊂ base doc 2 (containment), S2 = the hot span (capped
    // away), S3 disjoint
    val streamRows = Seq((10L, span), (20L, hot), (40L, (1 to 14).map(i => s"z$i").mkString(" ")))
    val idx = TextAnalysis.winnowFpIndexOf(base).cache()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.winnowContainStream(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("winnowq").outputMode("append").start()
    try {
      mem.addData(streamRows.take(1)); q.processAllAvailable()
      mem.addData(streamRows.drop(1)); q.processAllAvailable()
      val hits = spark.table("winnowq").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("base_id"),
          r.getAs[Long]("fp"), r.getAs[Long]("nfd"), r.getAs[Long]("nf_base"))).distinct
      // sink-side rollup: pair → (n_shared, nf_min, c_pct), tau applied
      val rolled = hits.groupBy(h => (h._1, h._2)).flatMap { case ((d, b), hs) =>
        val nShared = hs.map(_._3).distinct.length.toLong
        val nfMin = math.min(hs.head._4, hs.head._5)
        if (nShared * 100 >= nfMin * GraftConf.winnowTauPct)
          Some((math.min(d, b), math.max(d, b)) -> (nShared, nShared * 100 / nfMin))
        else None
      }.toMap
      // batch reference: the delta path over the same base index + stream
      // docs as the crawl (delta×delta pairs excluded — none planted)
      val batch = TextAnalysis.winnowContainDeltaFrom(idx, streamRows.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          (r.getAs[Long]("n_shared"), r.getAs[Long]("c_pct"))).toMap
      Dedup.releaseIntermediates()
      assert(rolled.contains((2L, 10L)), s"containment pair missed: $rolled")
      assert(!rolled.keys.exists(p => p._1 == 20L || p._2 == 20L),
        s"hot-capped fingerprints must not pair: $rolled")
      assert(!rolled.keys.exists(p => p._1 == 40L || p._2 == 40L),
        s"disjoint doc paired: $rolled")
      assert(rolled == batch, s"stream $rolled vs batch $batch")
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming bpeTokensStream: stateless per-doc pricing equals the batch encode") {
    import spark.implicits._
    import graft.operators.Bpe
    implicit val sq = spark.sqlContext
    val docs = Seq((1L, "abab abab cd"), (2L, "abab"), (3L, "a b a"))
    val batchDf = docs.toDF("doc_id", "text")
    val (_, merges) = Bpe.bpeTrainedOf(batchDf)
    val expected = Bpe.bpeEncodeOf(batchDf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))
      .toSet
    graft.operators.Dedup.releaseIntermediates()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.bpeTokensStream(mem.toDF().toDF("doc_id", "text"),
        merges.map(m => (m._1, m._2)))
      .writeStream.format("memory").queryName("bpeq").outputMode("append").start()
    try {
      mem.addData(docs.take(1)); q.processAllAvailable()
      mem.addData(docs.drop(1)); q.processAllAvailable()
      val got = spark.table("bpeq").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))
        .toSet
      assert(got == expected, s"stream $got vs batch $expected")
      // the fully-merged word prices at ONE token through the same chain
      assert(got.find(_._1 == 2L).get._3 == 1L)
    } finally q.stop()
  }

  test("streaming exactDedupStream: per-arrival verdicts equal the batch incremental exact lane") {
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    val base = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    // arrivals: 10 re-serves base content (group canonical 1, n_base 2);
    // 11 is fresh content
    val streamRows = Seq((10L, "alpha beta gamma"), (11L, "zeta eta"))
    val idx = Dedup.exactHashIndexOf(base).cache()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.exactDedupStream(mem.toDF().toDF("doc_id", "text"), idx)
      .writeStream.format("memory").queryName("exactq").outputMode("append").start()
    try {
      mem.addData(streamRows.take(1)); q.processAllAvailable()
      mem.addData(streamRows.drop(1)); q.processAllAvailable()
      val got = spark.table("exactq").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("in_base"),
            Option(r.get(3)).map(_.asInstanceOf[Long]), r.getAs[Long]("n_base"))).toMap
      assert(got(10L) == ((true, Some(1L), 2L)))
      assert(got(11L) == ((false, None, 0L)))
      // agreement with the batch incremental path on the same carving:
      // every in_base arrival is exactly a batch 'dup_of_base' verdict
      // with the same canonical
      val batch = Dedup.dedupExactDeltaFrom(idx, streamRows.toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("status"), r.getAs[Long]("canonical_doc"))).toMap
      Dedup.releaseIntermediates()
      assert(batch(10L) == (("dup_of_base", 1L)))
      assert(batch(11L) == (("new", 11L)))
      got.foreach { case (id, (inBase, canon, _)) =>
        if (inBase) assert(batch(id)._1 == "dup_of_base" && canon.contains(batch(id)._2))
      }
    } finally { q.stop(); idx.unpersist() }
  }

  test("streaming lineDedupStream: sink rollup equals batch dedup_lines on the merged corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.graft.linedd.chunkWords", "2")
    try {
      val base = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
      // arriving docs (ids above base): 10 repeats base unit [a b] + fresh
      // tail; 11 repeats a unit WITHIN itself; 12 fully fresh
      val streamRows = Seq((10L, "a b x y"), (11L, "p q p q z"), (12L, "m n"))
      val idx = TextAnalysis.lineUnitIndexOf(base).cache()
      val mem = MemoryStream[(Long, String)]
      val q = StreamOps.lineDedupStream(mem.toDF().toDF("doc_id", "text"), idx)
        .writeStream.format("memory").queryName("lineddq").outputMode("append").start()
      try {
        mem.addData(streamRows.take(1)); q.processAllAvailable()
        mem.addData(streamRows.drop(1)); q.processAllAvailable()
        val cleaned = spark.table("lineddq").collect()
          .groupBy(_.getAs[Long]("doc_id")).map { case (d, rs) =>
            d -> rs.filter(r => !r.getAs[Boolean]("in_base") && !r.getAs[Boolean]("dup_in_doc"))
              .sortBy(_.getAs[Int]("idx")).map(_.getAs[String]("chunk")).mkString(" ")
          }
        // batch reference: dedup_lines over base ∪ arrivals (base ids are
        // lower, so corpus-wide keep-first agrees), restricted to arrivals
        // (no cross-arrival dups planted — those are the batch path's job)
        val batch = TextAnalysis.dedupLinesOf(base.union(streamRows.toDF("doc_id", "text")))
          .collect().filter(_.getAs[Long]("doc_id") >= 10L)
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
        assert(cleaned == batch, s"stream $cleaned vs batch $batch")
        assert(cleaned(10L) == "x y" && cleaned(11L) == "p q z" && cleaned(12L) == "m n")
      } finally q.stop()
      // chunk-width drift between index build and stream fails fast
      spark.conf.set("spark.graft.linedd.chunkWords", "3")
      val e = intercept[IllegalStateException](
        StreamOps.lineDedupStream(streamRows.toDF("doc_id", "text"), idx))
      assert(e.getMessage.contains("chunkWords=2") && e.getMessage.contains("chunkWords=3"))
      idx.unpersist()
    } finally spark.conf.unset("spark.graft.linedd.chunkWords")
  }
}
