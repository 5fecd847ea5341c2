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
    // completeness at hamming 0: byte-banding guarantees recall ≤ SimHamMax;
    // exhaustively check distance-0 pairs are all present
    val found = p.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ids = sig.keys.toSeq.sorted
    for (a <- ids; b <- ids if a < b && sig(a) == sig(b))
      assert(found.contains((a, b)), s"missing identical-signature pair ($a,$b)")
  }
}
