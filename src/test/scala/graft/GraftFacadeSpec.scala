package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

class GraftFacadeSpec extends SparkSpec {

  test("registerViews: spark.sql works over every table") {
    Graft.registerViews(spark, sf)
    Graft.TableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) > 0, t)
    }
    // a join through SQL over the registered views
    val n = spark.sql(
      """SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey""")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("stream-static enrich: streamed events joined to the customer dim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps.Event
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val customers = sources.Tables.customer(spark, sf)
    val mem = MemoryStream[Event]
    val enriched = mem.toDF()
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    try {
      mem.addData(
        Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val n = spark.table("enrich").agg(sum("n")).collect()(0).getLong(0)
      assert(n == 2) // both users exist in the customer dim
    } finally q.stop()
  }

  test("streaming file source: windowed counts over the events parquet dir") {
    // stream the real events table (ts normalized exactly like the batch
    // path) through the streaming windowed aggregation
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streams need a directory source; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = sources.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamOps.windowedCounts(stream)
      .writeStream.format("memory").queryName("file_wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_wc")
        .agg(sum("n_events")).collect()(0).getLong(0)
      assert(streamed == sources.Tables.events(spark, sf).count())
    } finally q.stop()
  }
}
