package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Raw text-format ingestion (SURVEY §2B) — the front door a real corpus
  * arrives through: crawl dumps and vendor drops are JSONL/CSV long before
  * anyone converts them to parquet.
  *
  * Scale rules encoded here:
  *  - the schema is EXPLICIT, never inferred — `inferSchema` is a second
  *    full pass over 100 TB before the first useful byte is read, and a
  *    schema that drifts with the sample is not a contract;
  *  - malformed records are QUARANTINED, not fatal and not silently
  *    dropped: PERMISSIVE mode routes them to a corrupt-record column and
  *    the reader splits good/bad into two frames, so a 10⁻⁹ corruption
  *    rate on a trillion lines (thousands of bad records) neither kills
  *    the job nor vanishes — the bad frame is a first-class output to
  *    audit and re-crawl;
  *  - line-oriented formats split at newlines, so both readers
  *    parallelize per-block like any other scan (no single-reader choke).
  */
object RawSources {

  val CorruptCol = "_corrupt_record"

  /** The split: rows where parsing failed carry the raw line in
    * [[CorruptCol]]. The frame is persisted before splitting because Spark
    * computes the corrupt column during parsing — filtering on it alone
    * over a re-scan is explicitly unsupported (the parser may prune the
    * very columns that prove the row bad); one persist, two consumers.
    *
    * The persist registers with the session-lifetime intermediates registry,
    * so `Dedup.releaseIntermediates()` (which Verify/Bench already call
    * after each terminal action) releases it — repeated ingestion calls in a
    * long-lived session no longer accumulate cached blocks forever.
    */
  private def split(raw: DataFrame): (DataFrame, DataFrame) = {
    val r = graft.operators.Intermediates.persist(raw)
    (r.filter(col(CorruptCol).isNull).drop(CorruptCol),
      r.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))
  }

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** Newline-delimited JSON → (good, quarantined-raw-lines). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  /** Header-less CSV with an explicit schema → (good, quarantined). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .csv(path))
}
