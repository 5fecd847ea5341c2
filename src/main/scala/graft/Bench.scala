package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A throwaway warm-up action runs first so JVM/
  * codegen startup is not billed to the first timed query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop write: materializes EVERY output column (count() would let
    // Catalyst prune the aggregates themselves — flattering but dishonest)
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // timed repetitions per query: the VM shows ~2x run-to-run variance
    // spikes, so report the per-query MEDIAN of 3 — stable enough for
    // honest round-over-round comparison
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      // warm run first: plan + Janino codegen compilation is a fixed per-
      // query JVM cost (measured: up to ~7 s vs ~0.9 s execution) that
      // amortizes to zero at real scale — report steady-state throughput.
      try run(fn) catch { case _: Throwable => () }
      val times = (1 to reps).map { _ =>
        // isolate runs: drop caches the previous run materialized so cached
        // inputs don't flatter the timed run
        graft.operators.Dedup.releaseIntermediates()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // a failing query reports -1, not a flatteringly tiny elapsed time
        try { run(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      }
      val median = times.sorted.apply(times.length / 2)
      name -> (if (times.contains(-1.0)) -1.0 else median)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout tail-capture can truncate the (long) JSON line — persist the
    // artifact too so it survives log truncation
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), json + "\n")
    catch { case e: Exception => System.err.println(s"[bench] bench.json write failed: $e") }
    spark.stop()
  }
}
