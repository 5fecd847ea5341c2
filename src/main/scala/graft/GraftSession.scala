package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory.
  *
  * Local testing runs `local[32]`; the same conf block is what we'd ship to a
  * 1000-executor cluster (AQE + skew handling + broadcast threshold do the
  * heavy lifting there; `shuffle.partitions` is only the local override —
  * AQE coalesces it anyway).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects; read
      // nanos as long session-wide (Tables.events rebuilds micros) so the
      // flag isn't a hidden order-dependent side effect of a table loader
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
