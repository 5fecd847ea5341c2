package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** `host_cap_sample`: a flooding host is capped to exactly N documents,
  * the keep is hash-ordered (deterministic, shard-independent, not a
  * head-of-crawl prefix), small hosts pass untouched, and the rank cut
  * plans as WindowGroupLimit — the bounded-state property that survives
  * a billion-URL spam host.
  */
class HostCapSpec extends SparkSpec {

  import spark.implicits._

  /** One spamming host with 400 docs, two normal hosts under the cap. */
  private def flooded = {
    val spam = (0L until 400L).map(i => (1000L + i, s"spam page $i", "flood.example"))
    val ok1 = (0L until 5L).map(i => (2000L + i, s"real page a$i", "a.example"))
    val ok2 = (0L until 3L).map(i => (3000L + i, s"real page b$i", "b.example"))
    (spam ++ ok1 ++ ok2).toDF("doc_id", "text", "source")
  }

  test("the flooding host is capped at hostCap; small hosts keep every document") {
    val out = Curation.hostCapSampleOf(flooded).collect()
    val bySource = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySource("flood.example") == Curation.HostCap,
      s"flooding host must cap at ${Curation.HostCap}, got ${bySource("flood.example")}")
    assert(bySource("a.example") == 5 && bySource("b.example") == 3,
      s"hosts under the cap must pass whole: $bySource")
    // ranks are 1..n_kept per host, no gaps
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rows.length).toSeq, src)
    }
  }

  test("the keep is the hash order, not an id-order prefix, and is reproducible") {
    val kept = Curation.hostCapSampleOf(flooded)
      .filter(col("source") === "flood.example")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // reference arithmetic, independently spelled: u40 of "<id>|hostcap"
    def u40(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|hostcap".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(10), 16)
    }
    val want = (1000L until 1400L).sortBy(id => (u40(id), id))
      .take(Curation.HostCap).toSet
    assert(kept == want, s"kept $kept, hash order wants $want")
    // NOT the lowest ids — a crawl-order prefix would be content-biased
    assert(kept != (1000L until (1000L + Curation.HostCap)).toSet,
      "keep must not be an id prefix")
    assert(Curation.hostCapSampleOf(flooded)
      .filter(col("source") === "flood.example")
      .collect().map(_.getAs[Long]("doc_id")).toSet == kept)
  }

  test("the per-host cut plans as WindowGroupLimit Partial+Final (bounded state under a flood)") {
    val plan = Curation.hostCapSample(spark, sf)
      .queryExecution.executedPlan.toString
    Dedup.releaseIntermediates()
    val limits = raw"WindowGroupLimit .*row_number\(\), (\d+), (Partial|Final)".r
      .findAllMatchIn(plan).map(m => (m.group(2), m.group(1).toLong)).toSeq
    assert(limits.contains(("Partial", Curation.HostCap.toLong)) &&
      limits.contains(("Final", Curation.HostCap.toLong)),
      s"expected Partial+Final WindowGroupLimit(${Curation.HostCap}), got $limits\n${plan.take(1200)}")
  }

  test("capped output feeds the dedup lanes directly: candidate volume is bounded per host") {
    // the composition the operator exists for: cap THEN dedup — the
    // flood contributes at most cap docs to shingle/candidate space
    val capped = flooded.join(
      Curation.hostCapSampleOf(flooded).select("doc_id"), "doc_id")
    assert(capped.count() ==
      (Curation.HostCap + 5 + 3).toLong)
    val deduped = graft.operators.TextAnalysis.dedupParagraphsOf(capped)
    assert(deduped.count() == (Curation.HostCap + 5 + 3).toLong)
  }
}
