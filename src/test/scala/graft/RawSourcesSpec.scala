package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{RawSources, Tables}

/** Raw JSONL/CSV ingestion: explicit-schema reads, corrupt lines quarantined
  * (not fatal, not dropped), clean round-trip vs the parquet table.
  */
class RawSourcesSpec extends SparkSpec {

  /** The raw append above invalidates Hadoop local-FS checksum sidecars;
    * real corrupt files arrive without matching .crc, so drop them.
    */
  private def dropCrcSidecars(path: String): Unit =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("readJsonl: parquet-identical rows; planted garbage lands in quarantine, not the corpus") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/docs"
    val docs = Tables.documents(spark, sf)
    docs.coalesce(1).write.mode("overwrite").json(path)
    // plant malformed lines the way real crawl dumps rot: truncation + junk
    val part = new java.io.File(path).listFiles().filter(_.getName.endsWith(".json")).head
    Files.write(Paths.get(part.getAbsolutePath),
      "\n{\"doc_id\": 99999999, \"text\": \"truncated\n{ not json at all }\n".getBytes("UTF-8"),
      StandardOpenOption.APPEND)
    dropCrcSidecars(path)
    val (good, bad) = RawSources.readJsonl(spark, path, docSchema)
    // every original row survives bit-exactly; nothing extra appears
    assert(good.count() == docs.count())
    assert(good.select(docs.columns.map(col).toIndexedSeq: _*)
      .exceptAll(docs).isEmpty && docs.exceptAll(good).isEmpty)
    // both planted bad lines quarantined with their raw content intact
    val q = bad.collect().map(_.getAs[String]("raw_line"))
    assert(q.length == 2, q.mkString("|"))
    assert(q.exists(_.contains("truncated")) && q.exists(_.contains("not json")))
  }

  test("readCsv: explicit schema, type-garbage row quarantined") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/docs"
    val slim = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    slim.coalesce(1).write.mode("overwrite").option("header", "false").csv(path)
    val part = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv")).head
    Files.write(Paths.get(part.getAbsolutePath),
      "not_a_number,en,also_not\n".getBytes("UTF-8"), StandardOpenOption.APPEND)
    dropCrcSidecars(path)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    val (good, bad) = RawSources.readCsv(spark, path, schema)
    assert(good.count() == slim.count())
    assert(good.exceptAll(slim).isEmpty && slim.exceptAll(good).isEmpty)
    assert(bad.count() == 1)
  }
}
