package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** User-facing facade: session + catalog setup, so a reference user can
  * switch in one line (`Graft.init(dir)`) and query either through the
  * operator API (graft.operators._) or plain `spark.sql` over the
  * registered views.
  */
object Graft {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every graft table as a temp view for spark.sql access. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir) else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }

  /** One-call setup: tuned session + views registered. */
  def init(dir: String): SparkSession = {
    val spark = GraftSession.get()
    registerViews(spark, dir)
    spark
  }

  /** All operator queries by name (the public catalog = driver contract). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries
}
