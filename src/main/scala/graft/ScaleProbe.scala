package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe for the INCREMENTAL dedup path (SURVEY §4):
  *
  *  1. fix the base corpus, replicate the delta ×1/×4/×16 → per-crawl wall
  *     time must track DELTA size;
  *  2. fix the delta, replicate the base ×16 → per-crawl wall time must NOT
  *     track base size (the whole point of the stored index).
  *
  * Replica texts are SALTED (a copy-specific token merged into every other
  * word), so copies are not near-dups of each other or of the base — dup
  * DENSITY stays constant as volume grows, isolating the volume axis from
  * the candidate-pair axis (the r4 all-dup probe already stress-tested the
  * pair axis under the caps). Replica doc_ids are remapped into a high
  * range so they can never collide with base ids.
  *
  * `runMain graft.ScaleProbe [sfDir]` — prints one JSON line per
  * measurement; index builds are NOT timed (index time ≠ crawl time).
  */
object ScaleProbe {
  import graft.operators.Dedup

  /** k salted replicas (copy 0 unsalted, ids remapped high). */
  def replicate(df: DataFrame, k: Int): DataFrame =
    (0 until k).map { j =>
      val salted =
        if (j == 0) col("text")
        else expr(s"concat_ws(' ', transform(split(text, ' '), (w, i) -> " +
          s"CASE WHEN i % 2 = 1 THEN concat(w, ' zsalt${j}q') ELSE w END))")
      df.select((lit(1000000L) * (j + 1) + col("doc_id")).as("doc_id"),
        salted.as("text"))
    }.reduce(_ unionByName _)

  private def timeCrawl(spark: SparkSession, baseSets: DataFrame, baseBands: DataFrame,
      delta: DataFrame): Double = {
    Dedup.releaseIntermediates()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    Dedup.dedupDeltaFrom(baseSets, baseBands, delta)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = sources.Tables.documents(spark, dir).select("doc_id", "text")
    val isDelta = col("doc_id") % Dedup.DeltaIdMod === 0

    // index time (untimed): base shingled + banded ONCE, materialized the
    // way production persists it
    def buildIndex(baseDocs: DataFrame): (DataFrame, DataFrame) = {
      val sets = Dedup.hashedShingleSetsOf(baseDocs).localCheckpoint(true)
      val bands = Dedup.bandTableOf(sets).localCheckpoint(true)
      (sets, bands)
    }

    val (baseSets, baseBands) = buildIndex(docs.filter(!isDelta))
    val delta1 = docs.filter(isDelta).localCheckpoint(true)

    // warm-up (codegen/JVM, not billed — same policy as Bench)
    timeCrawl(spark, baseSets, baseBands, delta1)

    for (k <- Seq(1, 4, 16)) {
      val dk = replicate(delta1, k).localCheckpoint(true)
      val times = (1 to 3).map(_ => timeCrawl(spark, baseSets, baseBands, dk))
      println(s"""{"probe":"delta_x$k","delta_docs":${dk.count()},"sec_min":${times.min},"runs":[${times.mkString(",")}]}""")
    }

    val (bigSets, bigBands) = buildIndex(replicate(docs.filter(!isDelta), 16))
    val times = (1 to 3).map(_ => timeCrawl(spark, bigSets, bigBands, delta1))
    println(s"""{"probe":"base_x16_delta_x1","base_docs":${bigSets.count()},"sec_min":${times.min},"runs":[${times.mkString(",")}]}""")
    spark.stop()
  }
}
