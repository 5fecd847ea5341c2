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

  test("multiline JSONL → paragraph-unit dedup: keep-first per paragraph hash, uncut docs reassemble byte-identically") {
    val dir = Files.createTempDirectory("graft_jsonl_para").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/docs.jsonl"
    // real multiline text riding the raw front door: \n inside JSON strings
    Files.write(Paths.get(path), java.util.Arrays.asList(
      """{"doc_id":1,"text":"para A\npara B\npara C"}""",
      """{"doc_id":2,"text":"para B\npara D"}""",
      """{"doc_id":3,"text":"para E\n\npara F"}"""),
      StandardOpenOption.CREATE)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (good, bad) = RawSources.readJsonl(spark, path, schema)
    assert(bad.isEmpty, "no quarantine expected")
    val original = good.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(original(3L) == "para E\n\npara F", "newlines must survive ingestion")

    val got = graft.operators.TextAnalysis.dedupParagraphsOf(good).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("n_chunks_cut"))).toMap
    graft.operators.Dedup.releaseIntermediates()
    // hand-computed keep-first: "para B" first occurs in doc 1, so doc 2
    // loses it; everything else is a corpus-wide first occurrence
    assert(got == Map(
      1L -> ("para A\npara B\npara C", 3L, 0L),
      2L -> ("para D", 2L, 1L),
      3L -> ("para E\n\npara F", 3L, 0L)), got.toString)
    // byte-identical reassembly for the uncut docs — including the empty
    // paragraph doc 3 carries
    assert(got(1L)._1 == original(1L) && got(3L)._1 == original(3L))
    // the tumbling-window unit grammar is untouched: the same corpus
    // through dedup_lines still chunks by word windows (newlines are just
    // characters to it), so the two unit grammars stay independent
    val tumbling = graft.operators.TextAnalysis.dedupLinesOf(good).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chunks")).toMap
    graft.operators.Dedup.releaseIntermediates()
    assert(tumbling.values.forall(_ == 1L),
      s"word-window path must see each short doc as one chunk: $tumbling")
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
