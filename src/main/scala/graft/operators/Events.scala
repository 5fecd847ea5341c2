package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Batch event analytics (SURVEY §2D): windowed aggregation, gap
  * sessionization, funnels, per-user stats, dimension enrichment.
  *
  * Scale: every operator shuffles exactly once — on (event_type, window) or
  * user_id — and sessionization is window functions within the user_id
  * partition (no driver-side state). Timestamps are compared as epoch
  * micros (the parquet source is nanos; both engines truncate identically).
  *
  * Determinism: money-ish `value` sums go through DECIMAL(12,2); timestamps
  * in outputs are epoch-micros longs (engine timestamp encodings differ).
  */
object Events {

  /** Session gap (ingestion-side telemetry sessionization). */
  val SessionGapMin = 30

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  /** `events_windowed`: tumbling 1-hour windows per event type. */
  def eventsWindowed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      .contractOrderBy("window_start", "event_type")

  val eventsWindowedSql: String =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00') AS window_start,
      |  event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
      |FROM events
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** `events_sessionize`: 30-min-gap sessions per user — lag to detect
    * session starts, running sum to number them, then per-session stats.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessionGapMin * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      .withColumn("duration_sec",
        ((col("session_end_us") - col("session_start_us")) / lit(1000000L)).cast("long"))
      .select("user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events", "sum_value", "duration_sec")
      .contractOrderBy("user_id", "session_idx")
  }

  val eventsSessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
       |), l AS (
       |  SELECT user_id, event_id, value, ts_us,
       |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
       |  FROM e
       |), m AS (
       |  SELECT user_id, event_id, value, ts_us,
       |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapMin} * 60 * 1000000 THEN 1 ELSE 0 END AS is_new
       |  FROM l
       |), s AS (
       |  SELECT user_id, event_id, value, ts_us,
       |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM m
       |)
       |SELECT user_id, session_idx,
       |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |  count(*) AS n_events,
       |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value,
       |  CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_sec
       |FROM s
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** `events_session_window`: the same 30-min-gap sessionization through
    * Spark's NATIVE `session_window` operator (merging session windows in
    * the aggregation layer, no explicit lag/cumsum). The oracle reuses the
    * window-function formulation — two different algorithms, same rows.
    */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), s"$SessionGapMin minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .contractOrderBy("user_id", "session_start_us")

  val eventsSessionWindowSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
       |), l AS (
       |  SELECT user_id, event_id, value, ts_us,
       |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
       |  FROM e
       |), m AS (
       |  SELECT user_id, event_id, value, ts_us,
       |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapMin} * 60 * 1000000 THEN 1 ELSE 0 END AS is_new
       |  FROM l
       |), s AS (
       |  SELECT user_id, value, ts_us,
       |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM m
       |)
       |SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events,
       |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
       |FROM s
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_start_us""".stripMargin

  /** `events_funnel`: ordered signup→purchase conversion — ONE plan, one
    * scan of events: a per-user conditional aggregation (a user converts iff
    * their latest purchase is strictly after their first signup — equivalent
    * to "exists a purchase after the first signup"), then a global reduce.
    * No driver-side actions or math: two shuffles total (user_id, then the
    * single-row final agg), both map-side combined.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts_us"))).as("signup_us"),
        max(when(col("event_type") === "purchase", col("ts_us"))).as("last_purchase_us"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        count(col("signup_us")).as("n_signup"),
        sum(when(col("signup_us").isNotNull && col("last_purchase_us") > col("signup_us"), 1)
          .otherwise(0)).cast("long").as("n_converted"))
      .withColumn("conversion",
        when(col("n_signup") > 0,
          round(col("n_converted").cast("double") / col("n_signup"), 4)).otherwise(0.0))
  }

  val eventsFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      |), u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts_us END) AS signup_us,
      |    max(CASE WHEN event_type = 'purchase' THEN ts_us END) AS last_purchase_us
      |  FROM e GROUP BY user_id
      |)
      |SELECT count(*) AS n_users,
      |  count(signup_us) AS n_signup,
      |  CAST(sum(CASE WHEN signup_us IS NOT NULL AND last_purchase_us > signup_us
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  CASE WHEN count(signup_us) > 0
      |    THEN round(CAST(CAST(sum(CASE WHEN signup_us IS NOT NULL AND last_purchase_us > signup_us
      |                                  THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / count(signup_us), 4)
      |    ELSE 0.0 END AS conversion
      |FROM u""".stripMargin

  /** `events_top_users`: lifetime per-user stats, top 20 by spend. */
  def eventsTopUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("n_purchases"),
        round(sum(dec(col("value"))).cast("double"), 2).as("total_value"),
        min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)

  val eventsTopUsersSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value,
      |  min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
      |  max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
      |FROM events
      |GROUP BY user_id
      |ORDER BY total_value DESC, user_id
      |LIMIT 20""".stripMargin

  /** `events_enrich_join`: stream-table enrichment against the customer
    * dimension (broadcast — the standard streaming dim-join shape).
    */
  def eventsEnrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val c = Tables.customer(spark, dir)
    e.join(broadcast(c), e("user_id") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      .contractOrderBy("c_mktsegment", "event_type")
  }

  val eventsEnrichJoinSql: String =
    """SELECT c_mktsegment, event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin

  /** `events_retention`: weekly cohort retention matrix. Cohort = the
    * Monday-aligned week of a user's FIRST event; a user is active at
    * offset w if they have any event in cohort-week + w. All calendar math
    * is exact epoch-DAY integer arithmetic (epoch day 4 = Monday
    * 1970-01-05), so both engines agree bit-for-bit; the only date type
    * appears in the final formatted string.
    *
    * Scale: two user_id-keyed aggregations + one broadcast join of the
    * (tiny) cohort-size table — no window over a single partition.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .select("user_id", "day")
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
      .withColumn("cohort_monday", expr("first_day - ((first_day - 4) % 7)"))
      .select("user_id", "cohort_monday")
    val active = e.distinct()
      .join(cohorts, "user_id")
      .withColumn("week_offset", expr("(day - cohort_monday) div 7"))
      .select("user_id", "cohort_monday", "week_offset")
      .distinct()
    val sizes = cohorts.groupBy(col("cohort_monday"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    active.groupBy(col("cohort_monday"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), "cohort_monday")
      .select(
        date_add(lit("1970-01-01").cast("date"), col("cohort_monday").cast("int"))
          .cast("string").as("cohort_week"),
        col("week_offset"), col("cohort_size"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_size"), 4).as("retention"))
      .contractOrderBy("cohort_week", "week_offset")
  }

  val eventsRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events
      |), c AS (
      |  SELECT user_id, first_day - ((first_day - 4) % 7) AS cohort_monday
      |  FROM (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id) f
      |), a AS (
      |  SELECT DISTINCT d.user_id, cohort_monday, (day - cohort_monday) // 7 AS week_offset
      |  FROM (SELECT DISTINCT user_id, day FROM e) d JOIN c ON d.user_id = c.user_id
      |), sizes AS (
      |  SELECT cohort_monday, count(DISTINCT user_id) AS cohort_size FROM c GROUP BY cohort_monday
      |)
      |SELECT CAST(DATE '1970-01-01' + CAST(a.cohort_monday AS INTEGER) AS VARCHAR) AS cohort_week,
      |  week_offset, cohort_size, count(DISTINCT a.user_id) AS n_active,
      |  round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / cohort_size, 4) AS retention
      |FROM a JOIN sizes ON a.cohort_monday = sizes.cohort_monday
      |GROUP BY a.cohort_monday, week_offset, cohort_size
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** `events_session_paths`: top-20 most common session event-type paths
    * (path analysis over gap sessions). The path is rebuilt from a
    * sort_array over (ts_us, event_id, type) structs — (ts_us, event_id) is
    * a total order, so the collect_list's partition nondeterminism cannot
    * leak into the output (the oracle's `string_agg ... ORDER BY` states
    * the same order declaratively).
    *
    * Scale: per-session arrays are bounded by session length; the path
    * table after the first agg is tiny relative to the event log.
    */
  def eventsSessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessionGapMin * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("event_type"))))
        .as("evs"))
      .select(array_join(expr("transform(evs, x -> x.event_type)"), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  val eventsSessionPathsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
       |), l AS (
       |  SELECT user_id, event_id, event_type, ts_us,
       |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
       |  FROM e
       |), s AS (
       |  SELECT user_id, event_id, event_type, ts_us,
       |    sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapMin} * 60 * 1000000
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM l
       |), p AS (
       |  SELECT user_id, session_idx,
       |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
       |  FROM s GROUP BY user_id, session_idx
       |)
       |SELECT path, count(*) AS n_sessions
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path
       |LIMIT 20""".stripMargin

  /** `events_spike`: trailing-average anomaly detection — hourly event
    * buckets whose count exceeds 1.5× the mean of the previous 24 observed
    * buckets of the same type (≥ 6 buckets of history required before a
    * bucket is judged). The threshold test is the exact integer
    * cross-multiply `2·cnt·n_prev > 3·sum_prev` — no float average is ever
    * compared, so both engines agree bit-for-bit.
    *
    * Scale: one event_type-keyed hourly aggregation (map-side combined —
    * the hourly table is tiny relative to the log), then a bounded 24-row
    * window per type. The frame is ROWS-based over OBSERVED buckets:
    * silent hours don't pad the baseline, which is the behavior a sparse
    * event type wants.
    */
  def eventsSpike(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .withColumn("hour_us", expr("unix_micros(date_trunc('HOUR', ts))"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_us"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("prev_sum", coalesce(sum(col("cnt")).over(w), lit(0L)).cast("long"))
      .withColumn("prev_n", count(lit(1)).over(w).cast("long"))
      .filter(col("prev_n") >= 6 &&
        lit(2L) * col("cnt") * col("prev_n") > lit(3L) * col("prev_sum"))
      .select("event_type", "hour_us", "cnt", "prev_n", "prev_sum")
      .contractOrderBy("event_type", "hour_us")
  }

  /** `events_percentiles`: exact per-type latency/value percentiles
    * (continuous interpolation, the `quantile_cont` definition both engines
    * share).
    *
    * Scale: exact `percentile` materializes each group's values on one
    * reducer — fine for bounded group counts (here: one group per
    * event_type), WRONG for high-cardinality groups at 100 TB. The
    * production twin is [[eventsPercentilesApprox]] (t-digest sketch,
    * mergeable map-side, bounded memory at any scale); its rank error is
    * spec-bounded against this exact form so the swap is evidence-backed,
    * not vibes. Both round to 4 decimals — interpolation is two-double
    * arithmetic, far inside rounding tolerance.
    */
  def eventsPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .contractOrderBy("event_type")

  val eventsPercentilesSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  round(quantile_cont(value, 0.25), 4) AS p25,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The 100 TB percentile path: `approx_percentile` (mergeable sketch,
    * map-side partial aggregation, memory bounded by the accuracy knob
    * instead of group size). Rank error ≤ 1/accuracy of the group count —
    * EventsSpec bounds it against [[eventsPercentiles]] empirically.
    */
  def eventsPercentilesApprox(spark: SparkSession, dir: String, accuracy: Int = 1000): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        expr(s"approx_percentile(value, 0.25, $accuracy)").as("p25"),
        expr(s"approx_percentile(value, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(value, 0.9, $accuracy)").as("p90"),
        expr(s"approx_percentile(value, 0.99, $accuracy)").as("p99"))
      .contractOrderBy("event_type")

  /** `events_attribution`: last-touch attribution — each purchase is
    * credited to the SAME user's latest click within the preceding hour
    * (ties on timestamp broken by click_id, so the answer is deterministic).
    * The batch twin of streaming `clickPurchaseJoin` (which emits ALL
    * in-window pairs; attribution picks one).
    *
    * Scale: this is NOT a range join — the equi-key (user_id) carries the
    * shuffle, so both sides co-locate in one SortMergeJoin and the time
    * window is a cheap post-filter inside each user's (bounded-by-retention)
    * event set; the last-touch pick is a map-side-combinable max(struct).
    * A pure time-range join without the user key would be a broadcast
    * nested loop — the plan to refuse at 100 TB.
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), expr("unix_micros(ts)").as("click_us"),
        col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("purchase_us"),
        col("event_id").as("purchase_id"), col("value"))
    purchases.join(clicks, "user_id")
      .filter(col("click_us") <= col("purchase_us") &&
        col("click_us") >= col("purchase_us") - lit(3600000000L))
      .groupBy(col("purchase_id"), col("user_id"), col("purchase_us"), col("value"))
      .agg(max(struct(col("click_us"), col("click_id"))).as("m"))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("m.click_us").as("click_us"), col("m.click_id").as("click_id"),
        round(dec(col("value")).cast("double"), 2).as("value"))
      .contractOrderBy("purchase_id")
  }

  val eventsAttributionSql: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS click_us, event_id AS click_id
      |  FROM events WHERE event_type = 'click'
      |), p AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
      |    event_id AS purchase_id, value
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT purchase_id, user_id, purchase_us, click_us, click_id, value FROM (
      |  SELECT p.purchase_id, p.user_id, p.purchase_us, c.click_us, c.click_id,
      |    round(CAST(CAST(p.value AS DECIMAL(12,2)) AS DOUBLE), 2) AS value,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |                       ORDER BY c.click_us DESC, c.click_id DESC) AS rn
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.click_us <= p.purchase_us
      |    AND c.click_us >= p.purchase_us - 3600000000
      |) WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin

  val eventsSpikeSql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY event_type, hour_us
      |), t AS (
      |  SELECT event_type, hour_us, cnt,
      |    CAST(coalesce(sum(cnt) OVER w, 0) AS BIGINT) AS prev_sum,
      |    CAST(count(*) OVER w AS BIGINT) AS prev_n
      |  FROM h
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_us ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_type, hour_us, cnt, prev_n, prev_sum
      |FROM t
      |WHERE prev_n >= 6 AND 2 * cnt * prev_n > 3 * prev_sum
      |ORDER BY event_type, hour_us""".stripMargin

  /** `events_anomaly_mad`: median/MAD outlier detection over hourly buckets
    * — the ROBUST retrospective twin of [[eventsSpike]]'s trailing mean. A
    * burst that lasts several hours drags a trailing MEAN up and masks its
    * own tail; the median and the median-absolute-deviation ignore up to
    * half the buckets being corrupted (50% breakdown point), which is what
    * a post-hoc audit over a log with real incidents wants. Flags hourly
    * buckets with |cnt − median| > 3·MAD per event type.
    *
    * Determinism: the classic median/MAD formulation compares floats. Here
    * every compared quantity is an exact INTEGER — both engines interpolate
    * the median of integers as x.0/x.5, so `2·median(cnt)` (`med2`) and
    * `2·median(|2·cnt − med2|)` (`mad4` = 4·MAD) are integers, exactly
    * representable in the double each engine's quantile returns, and the
    * flag test |cnt − med| > 3·mad becomes the cross-multiply
    * `2·|2·cnt − med2| > 3·mad4`. No float threshold ever decides a row.
    * When more than half a type's buckets carry the identical count, MAD
    * collapses to 0 and ANY deviation flags — standard MAD behavior, and
    * exactly reproduced by the oracle.
    *
    * Scale: one event_type×hour hash aggregation over the log (map-side
    * combined; the hourly table is tiny), then exact medians per event_type
    * — one reducer per TYPE (bounded cardinality; same caveat and same
    * approx_percentile swap path as [[eventsPercentiles]]). The med/mad
    * tables are O(types) rows and broadcast back onto the hourly table.
    */
  def eventsAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    // the hourly table feeds three consumers (the flag join + the two
    // baseline aggregations) — persist it (r10) so the event log is
    // scanned and hash-aggregated ONCE, as the docstring promises, instead
    // of relying on exchange reuse to fire
    val hourly = Intermediates.persist(hourlyCountsOf(Tables.events(spark, dir)))
    hourly.join(madBaselineOf(hourly), "event_type")
      .withColumn("d2", abs(lit(2L) * col("cnt") - col("med2")))
      .filter(lit(2L) * col("d2") > lit(3L) * col("mad4"))
      .select("event_type", "hour_us", "cnt", "med2", "mad4")
      .contractOrderBy("event_type", "hour_us")
  }

  /** (event_type, hour_us, cnt) — the hourly grain both the MAD audit and
    * its streaming tap's baseline read from.
    */
  private[graft] def hourlyCountsOf(events: DataFrame): DataFrame =
    events
      .withColumn("hour_us", expr("unix_micros(date_trunc('HOUR', ts))"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(count(lit(1)).as("cnt"))

  /** The (event_type, med2, mad4) robust baseline over an hourly count
    * table — the artifact a crawl-time tap
    * ([[graft.streaming.StreamOps.madAnomalyTapStream]]) joins against:
    * batch trains it on history, the stream flags live hours with it.
    */
  def madBaselineOf(hourly: DataFrame): DataFrame = {
    val med = hourly.groupBy(col("event_type"))
      .agg(expr("CAST(2 * percentile(cnt, 0.5) AS BIGINT)").as("med2"))
    hourly.join(med, "event_type")
      .withColumn("d2", abs(lit(2L) * col("cnt") - col("med2")))
      .groupBy(col("event_type"))
      .agg(max(col("med2")).as("med2"),
        expr("CAST(2 * percentile(d2, 0.5) AS BIGINT)").as("mad4"))
  }

  val eventsAnomalyMadSql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY event_type, hour_us
      |), med AS (
      |  SELECT event_type, CAST(2 * median(cnt) AS BIGINT) AS med2 FROM h GROUP BY event_type
      |), dev AS (
      |  SELECT h.event_type, h.hour_us, h.cnt, med.med2,
      |    abs(2 * h.cnt - med.med2) AS d2
      |  FROM h JOIN med ON h.event_type = med.event_type
      |), mad AS (
      |  SELECT event_type, CAST(2 * median(d2) AS BIGINT) AS mad4 FROM dev GROUP BY event_type
      |)
      |SELECT dev.event_type, dev.hour_us, dev.cnt, dev.med2, mad.mad4
      |FROM dev JOIN mad ON dev.event_type = mad.event_type
      |WHERE 2 * dev.d2 > 3 * mad.mad4
      |ORDER BY dev.event_type, dev.hour_us""".stripMargin

  /** `events_distinct_users`: daily active users per event type — exact
    * `count(DISTINCT user_id)`. Exact distinct shuffles the (type, day,
    * user) key set once (Spark expands distinct aggs to a two-phase plan:
    * dedup on the full key, then count — both map-side combinable); at
    * 100 TB the swap is [[eventsDistinctUsersApprox]] (HLL++ sketch,
    * mergeable, bounded memory), whose relative error is spec-bounded
    * against this exact form so the swap is evidence-backed.
    */
  def eventsDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .contractOrderBy("event_type", "day")

  val eventsDistinctUsersSql: String =
    """SELECT event_type,
      |  strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |  count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** `events_stickiness`: DAU/MAU per event type and month — the classic
    * engagement ratio, reported in integer BASIS POINTS:
    * `stickiness_bp = Σ(daily actives) · 10000 div (n_days · MAU)` — the
    * mean-DAU/MAU division never leaves integer space, so no float ratio
    * ever decides a reported value (an end-of-epoch ratio of two big
    * counts is exactly the last-ulp class §5 bans).
    *
    * Scale: two exact distinct aggregations (day grain and month grain —
    * each the two-phase dedup-then-count plan, map-side combinable) joined
    * on the tiny (type, month) key. The same HLL++ swap as
    * [[eventsDistinctUsersApprox]] applies when exact actives get too hot.
    */
  def eventsStickiness(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("day", date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd"))
      .withColumn("month", date_format(date_trunc("MONTH", col("ts")), "yyyy-MM"))
    val daily = e.groupBy(col("event_type"), col("month"), col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val monthly = e.groupBy(col("event_type"), col("month"))
      .agg(countDistinct(col("user_id")).as("mau"))
    daily.groupBy(col("event_type"), col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      .join(monthly, Seq("event_type", "month"))
      .withColumn("stickiness_bp", expr("sum_dau * 10000 div (n_days * mau)"))
      .select("event_type", "month", "n_days", "sum_dau", "mau", "stickiness_bp")
      .contractOrderBy("event_type", "month")
  }

  val eventsStickinessSql: String =
    """WITH e AS (
      |  SELECT event_type, user_id,
      |    strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |    strftime(date_trunc('month', CAST(ts AS TIMESTAMP)), '%Y-%m') AS month
      |  FROM events
      |), daily AS (
      |  SELECT event_type, month, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      |  FROM e GROUP BY event_type, month, day
      |), monthly AS (
      |  SELECT event_type, month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM e GROUP BY event_type, month
      |)
      |SELECT d.event_type, d.month,
      |  CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(d.dau) AS BIGINT) AS sum_dau,
      |  m.mau,
      |  CAST(sum(d.dau) * 10000 // (count(*) * m.mau) AS BIGINT) AS stickiness_bp
      |FROM daily d JOIN monthly m ON d.event_type = m.event_type AND d.month = m.month
      |GROUP BY d.event_type, d.month, m.mau
      |ORDER BY d.event_type, d.month""".stripMargin

  /** The 100 TB distinct-count path: `approx_count_distinct` (HyperLogLog++,
    * one pass, no key-set shuffle — partials are fixed-size sketches merged
    * map-side). EventsSpec bounds its error against [[eventsDistinctUsers]].
    */
  def eventsDistinctUsersApprox(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), rsd).as("n_users"))
      .contractOrderBy("event_type", "day")

  /** `events_seasonality` (r10): the hour-of-day × day-of-week load
    * profile per event type — the capacity-planning grid AND the
    * calendar-aware baseline `events_anomaly_mad`'s flat per-type median
    * deliberately isn't (a Monday-9am spike is noise against a weekly
    * profile but an anomaly against a flat one; reading this grid is how
    * you decide which baseline a type needs). All calendar math is exact
    * epoch-microsecond integer arithmetic (`events_retention`'s
    * discipline: dow 0 = Monday via `(epoch_day + 3) % 7`, epoch day 0 =
    * Thursday; hour = in-day microseconds div 3.6e9) — no date type, no
    * timezone surface, bit-identical in both engines.
    *
    * Scale: ONE map-side-combined aggregation to types × 168 cells.
    */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("((unix_micros(ts) div 86400000000) + 3) % 7").as("dow"),
        expr("(unix_micros(ts) % 86400000000) div 3600000000").as("hour"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
      .contractOrderBy("event_type", "dow", "hour")

  val eventsSeasonalitySql: String =
    """SELECT event_type,
      |  ((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) + 3) % 7 AS dow,
      |  (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) // 3600000000 AS hour,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY event_type, dow, hour
      |ORDER BY event_type, dow, hour""".stripMargin
}
