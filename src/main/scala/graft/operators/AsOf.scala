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
}
