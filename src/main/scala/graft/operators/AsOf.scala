package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of join (SURVEY §2D) — for each purchase event, the most recent click
  * of the same user at or before it.
  *
  * Spark lacks a native ASOF JOIN; the scalable re-expression is the
  * union + fill-forward-window form: tag both sides, sort within the user
  * partition, carry the last left-side row forward. ONE shuffle on user_id
  * and NO range-join row explosion — at 100 TB this is the only shape that
  * survives (a range join would fan out per pair; this is linear).
  *
  * The DuckDB oracle intentionally uses DuckDB's *native* `ASOF LEFT JOIN`
  * — an independent implementation agreeing row-for-row is a much stronger
  * check than mirroring the window formulation.
  */
object AsOf {

  def eventsAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    // kind 0 = click (match side) sorts before kind 1 = purchase at equal ts,
    // so a same-instant click is visible to the purchase (ASOF >= semantics).
    val tagged = e.withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_event",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_event"), col("click_us"),
        expr("(ts_us - click_us) div 1000000").as("gap_sec"))
      .contractOrderBy("event_id")
  }

  val eventsAsofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      |), p AS (
      |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id AS click_event, user_id, ts_us AS click_us FROM e WHERE event_type = 'click'
      |)
      |SELECT p.event_id, p.user_id, p.ts_us, c.click_event, c.click_us,
      |  (p.ts_us - c.click_us) // 1000000 AS gap_sec
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.click_us
      |ORDER BY p.event_id""".stripMargin

  /** `events_asof_next` (r10): the FORWARD as-of — for each click, the
    * EARLIEST purchase of the same user at or after it, i.e. the
    * time-to-convert read ([[eventsAsofJoin]] answers "what caused this
    * purchase"; this answers "did this click convert, and how fast" —
    * the attribution pair). Same union + fill-window re-expression, the
    * scan simply runs time-DESCENDING so "last purchase seen" is the
    * smallest ts ≥ the click; one user_id shuffle, no range fan-out.
    *
    * Determinism: purchases are pre-reduced to one row per
    * (user, instant) keeping the lowest event_id — in BOTH engines — so
    * the native ASOF's tie behavior at equal timestamps never decides a
    * row. A same-instant purchase is visible to the click (<= semantics,
    * kind-ordering mirror of the backward join's rule). The oracle is
    * again DuckDB's native `ASOF LEFT JOIN` (with `<=`) — an independent
    * implementation, not a mirrored window.
    */
  def eventsAsofNext(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
        col("event_id"), lit(null).cast("long").as("purchase_event"))
    val purch = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(min(col("event_id")).as("purchase_event"))
      .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"), col("purchase_event"))
    // kind 0 = purchase sorts before kind 1 = click at equal (desc) ts, so
    // a same-instant purchase is carried into the click row (<= semantics)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("kind"),
        coalesce(col("event_id"), col("purchase_event")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purch)
      .withColumn("next_purchase",
        last(when(col("kind") === 0, col("purchase_event")), ignoreNulls = true).over(w))
      .withColumn("purchase_us",
        last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("next_purchase").as("purchase_event"), col("purchase_us"),
        expr("(purchase_us - ts_us) div 1000000").as("latency_sec"))
      .contractOrderBy("event_id")
  }

  val eventsAsofNextSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      |), c AS (
      |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'
      |), p AS (
      |  SELECT user_id, ts_us AS purchase_us, min(event_id) AS purchase_event
      |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us
      |)
      |SELECT c.event_id, c.user_id, c.ts_us, p.purchase_event, p.purchase_us,
      |  (p.purchase_us - c.ts_us) // 1000000 AS latency_sec
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts_us <= p.purchase_us
      |ORDER BY c.event_id""".stripMargin
}
