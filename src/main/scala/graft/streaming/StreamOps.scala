package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the event operators (SURVEY §2D,
  * test-only — exercised by MemoryStream specs, not the batch oracle).
  *
  * The batch operators in [[graft.operators.Events]] and these share
  * semantics: tumbling windows ≡ `window()` + watermark; gap sessionization
  * ≡ flatMapGroupsWithState keyed on user_id (same shuffle key as the batch
  * window partition).
  */
object StreamOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_value: Double)

  final case class SessionState(startUs: Long, endUs: Long,
      n: Long, total: Double)

  /** Timestamp → epoch micros (getTime is millis; nanos carries the
    * sub-second fraction — matches the batch unix_micros exactly).
    */
  def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Tumbling 1-hour windowed counts per event type with a 2-hour watermark
    * (late data beyond the watermark is dropped, state is bounded).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** In-stream exact deduplication: drop events whose content key was
    * already seen, with state bounded by the watermark (the streaming rung
    * of the dedup family — [[graft.operators.Dedup]] is the batch side).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("content_key",
        md5(concat_ws("|", col("user_id"), col("event_type"), col("value"))))
      // key is content alone — a retried event with a later timestamp still
      // dedups; state stays bounded because expiry follows the watermark
      .dropDuplicatesWithinWatermark("content_key")

  /** Streaming INCREMENTAL dedup: a stream of new documents near-dup-checked
    * against the STATIC persisted band index of the base corpus — the
    * streaming twin of [[graft.operators.Dedup.dedupDeltaFrom]]. The join is
    * stream-static, which Structured Streaming executes stateLESSly (the
    * static side is just re-scannable; no join state accumulates), so this
    * runs forever at crawl rates: per micro-batch the new docs are shingled,
    * MinHash-signed and banded (stateless projections), bucket-joined
    * against the stored index, and exact-Jaccard-verified against the
    * stored shingle sets.
    *
    * Semantics vs the batch path: this covers the delta×base lane
    * (delta-internal pairs need a stream-stream self-join — the batch
    * [[graft.operators.Dedup.dedupDelta]] owns that lane), and the
    * hot-bucket cap reads the STORED index occupancy (an unbounded stream
    * has no global delta counts; base-corpus occupancy is what production
    * stores alongside the index). A pair sharing several cool buckets is
    * emitted once per bucket — production chains `dropDuplicates` under a
    * watermark or per-sink dedup; the spec normalizes to a set.
    */
  def deltaDedupStream(deltaDocs: DataFrame, baseBands: DataFrame,
      baseSets: DataFrame): DataFrame = {
    import graft.operators.Dedup
    val cap = Dedup.HotBandDocs
    val cool = baseBands.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") <= cap)
      .select("band_id", "band_hash")
    // the stream side carries its shingle set THROUGH the banding
    // (keepSets): re-attaching it later would be a stream-stream self-join
    val d = Dedup.bandTableOf(Dedup.hashedShingleSetsOf(deltaDocs), keepSets = true)
      .withColumnRenamed("doc_id", "delta_id")
      .withColumnRenamed("hs", "sha")
    // keep the delta/base roles separate through the verify so every join
    // stays an equi-join; normalize to (doc_a < doc_b) only at the end
    d
      .join(baseBands.join(cool, Seq("band_id", "band_hash"))
          .withColumnRenamed("doc_id", "base_id"),
        Seq("band_id", "band_hash"))
      .join(baseSets.select(col("doc_id").as("base_id"), col("hs").as("shb")), "base_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")), 4))
      .filter(col("jaccard") >= Dedup.MinHashTau)
      .select(least(col("delta_id"), col("base_id")).as("doc_a"),
        greatest(col("delta_id"), col("base_id")).as("doc_b"), col("jaccard"))
  }

  /** Stream-stream interval join: each purchase joined to the clicks of the
    * same user in the preceding hour. Both sides carry watermarks, so the
    * join state (buffered clicks awaiting purchases and vice versa) is
    * BOUNDED — Spark evicts rows once the interval condition can no longer
    * match under the watermark. This is the attribution-join shape of a
    * streaming pipeline; the batch as-of join ([[graft.operators.AsOf]]) is
    * its offline twin.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  final case class FunnelClose(user_id: Long, signup_us: Long, converted: Boolean)

  final case class FunnelState(signupUs: Long, converted: Boolean, lastMs: Long)

  /** Streaming signup→purchase funnel with watermark expiry — the streaming
    * twin of the batch `events_funnel` ([[graft.operators.Events]]): per
    * user, track the earliest signup and whether any later purchase
    * followed; once the event-time watermark passes the user's last
    * activity plus the expiry horizon, the state times out and the user's
    * final funnel row is emitted (and the state removed — state size is
    * bounded by ACTIVE users, never by history, which is what makes this
    * run forever at production event rates).
    *
    * With events fed in event-time order, `converted` here ≡ the batch
    * rule `max(purchase_us) > min(signup_us)`: a purchase is compared
    * against the minimum signup seen so far, and any signup earlier than a
    * converting purchase sorts before it.
    */
  def funnel(events: Dataset[Event], expiry: String = "2 hours"): Dataset[FunnelClose] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", expiry)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelClose](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FunnelClose(userId,
              if (s.signupUs == Long.MaxValue) -1L else s.signupUs, s.converted))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var s = state.getOption.getOrElse(FunnelState(Long.MaxValue, converted = false, 0L))
            sorted.foreach { e =>
              val us = micros(e.ts)
              if (e.event_type == "signup" && us < s.signupUs) s = s.copy(signupUs = us)
              if (e.event_type == "purchase" && us > s.signupUs) s = s.copy(converted = true)
              s = s.copy(lastMs = math.max(s.lastMs, math.floorDiv(us, 1000L)))
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs, expiry)
            Iterator.empty
          }
      }
  }

  /** Gap-based sessionization with explicit state: emits a Session when the
    * gap since the last event exceeds `gapMinutes` (or on final timeout).
    * Same 30-min semantics as the batch `events_sessionize`.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // events within a micro-batch are not ordered; sort the batch
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            val us = micros(e.ts)
            cur match {
              case Some(s) if us - s.endUs <= gapUs =>
                cur = Some(SessionState(s.startUs, us, s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += Session(userId, s.startUs, s.endUs, s.n,
                  math.round(s.total * 100) / 100.0)
                cur = Some(SessionState(us, us, 1L, e.value))
              case None =>
                cur = Some(SessionState(us, us, 1L, e.value))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          closed.iterator
      }
  }

  /** Drain any open sessions (batch-style finalization used by the spec —
    * in production a timeout would close these).
    */
  def openSessions(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id).flatMapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var cur: Option[SessionState] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.endUs <= gapUs =>
            cur = Some(SessionState(s.startUs, us, s.n + 1, s.total + e.value))
          case Some(s) =>
            out += Session(userId, s.startUs, s.endUs, s.n, math.round(s.total * 100) / 100.0)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach(s => out += Session(userId, s.startUs, s.endUs, s.n,
        math.round(s.total * 100) / 100.0))
      out.iterator
    }
  }
}
