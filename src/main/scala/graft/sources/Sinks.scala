package graft.sources

import org.apache.spark.sql.DataFrame

/** Output sinks (the reference writes extracted forms as JSON files;
  * main.py:216). At corpus scale the same outputs are partitioned
  * columnar/JSON datasets.
  */
object Sinks {

  /** JSON lines output — the reference's `extracted_*.json` analog. */
  def writeFormJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet output partitioned by a low-cardinality column — the shape a
    * downstream 100 TB consumer wants (partition pruning on read).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Bucketed table write: co-locates future joins on `bucketCol` (no
    * shuffle on the bucketed key at read time). Requires a table name since
    * bucketing metadata lives in the catalog.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int = 32): Unit =
    writeBucketedBy(df, table, Seq(bucketCol), buckets)

  /** Multi-column bucketed write — e.g. the dedup band index bucketed by
    * (band_id, band_hash): every per-crawl join against the stored index
    * hits exactly those keys, so a bucketed index is read pre-partitioned
    * and the base corpus side of the incremental-dedup joins never
    * shuffles (spec-asserted by Exchange count).
    */
  def writeBucketedBy(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", s"/tmp/graft_warehouse/$table").saveAsTable(table)
}
