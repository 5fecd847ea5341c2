package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Property test: the distributed gap-sessionization agrees with a trivial
  * in-memory reference on arbitrary event streams (ScalaCheck-generated;
  * driven with explicit seeds — the scalatest/scalacheck bridge isn't in
  * the offline cache).
  */
class SessionizePropertySpec extends SparkSpec {

  private val gapMin = 30
  private val gapUs = gapMin * 60L * 1000000L

  /** Straight-line reference: sort, walk, split on gap. */
  private def referenceSessions(events: Seq[Event]): Seq[(Long, Long, Long, Long)] =
    events.groupBy(_.user_id).toSeq.flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (StreamOps.micros(e.ts), e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start, end, n = -1L
      sorted.foreach { e =>
        val us = StreamOps.micros(e.ts)
        if (n < 0) { start = us; end = us; n = 1 }
        else if (us - end <= gapUs) { end = us; n += 1 }
        else { sessions += ((user, start, end, n)); start = us; end = us; n = 1 }
      }
      if (n > 0) sessions += ((user, start, end, n))
      sessions.toSeq
    }

  private val eventGen: Gen[Event] = for {
    id <- Gen.choose(0L, 1000000L)
    // timestamps clustered so gaps both above and below 30 min occur
    base <- Gen.choose(0L, 50L)
    offsetMin <- Gen.choose(0L, 100L)
    user <- Gen.choose(0L, 5L)
    value <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield Event(id, new Timestamp(1700000000000L + base * 3600000L + offsetMin * 60000L),
    user, "click", value)

  test("openSessions == in-memory reference on arbitrary event streams") {
    import spark.implicits._
    val listGen = Gen.listOfN(60, eventGen)
    (1 to 10).foreach { trial =>
      val events = listGen.apply(Gen.Parameters.default, Seed(trial.toLong)).get
      // event_ids must be unique for a deterministic sort tie-break
      val uniq = events.zipWithIndex.map { case (e, i) => e.copy(event_id = i.toLong) }
      val got = StreamOps.openSessions(uniq.toDS(), gapMin).collect()
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).sorted.toSeq
      val want = referenceSessions(uniq).sorted
      assert(got == want, s"trial $trial")
    }
  }
}
