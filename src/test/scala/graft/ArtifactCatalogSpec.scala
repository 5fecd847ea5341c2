package graft

import graft.operators.{ArtifactCatalog, Bpe, TextAnalysis}

/** The stored-artifact registry: stamped artifacts under one root are
  * inventoried with their build-time fingerprints, and drift against the
  * live conf is reported per artifact — the fleet view over the same
  * stamps the per-query paths fail fast on.
  */
class ArtifactCatalogSpec extends SparkSpec {

  test("health reports fragmentation: appends raise per-partition file counts, compaction restores them") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_health").toString
    val embs = graft.sources.Tables.embeddings(spark, sf)
    graft.operators.AnnIndex.writeIvfPqFrom(
      embs.filter(col("vec_id") % 3 =!= 2), s"$root/ivfpq")
    graft.operators.AnnIndex.appendToIvfPq(spark, s"$root/ivfpq",
      embs.filter(col("vec_id") % 3 === 2))
    graft.operators.Dedup.releaseIntermediates()
    def codesRow() = ArtifactCatalog.health(spark, root).collect()
      .find(_.getAs[String]("path").endsWith("codes")).get
    val frag = codesRow()
    assert(frag.getAs[Long]("n_partitions") > 0,
      s"the code table is cell-partitioned: $frag")
    assert(frag.getAs[Long]("max_files_per_partition") > 1,
      s"an append must fragment at least one cell: $frag")
    graft.operators.AnnIndex.compactIvfPq(spark, s"$root/ivfpq")
    val compacted = codesRow()
    assert(compacted.getAs[Long]("max_files_per_partition") == 1,
      s"post-compaction each cell holds one file: $compacted")
    assert(compacted.getAs[Long]("bytes") > 0 && compacted.getAs[Long]("n_files") ==
      compacted.getAs[Long]("n_partitions"), s"file accounting drifted: $compacted")
  }

  test("scan inventories stamped artifacts and flags conf drift per kind") {
    val root = java.nio.file.Files.createTempDirectory("graft_artifacts").toString
    Bpe.writeMerges(spark, sf, s"$root/bpe_merges")
    TextAnalysis.winnowFpIndexOf(graft.sources.Tables.documents(spark, sf))
      .write.mode("overwrite").parquet(s"$root/winnow_idx")
    graft.operators.Dedup.releaseIntermediates()

    val clean = ArtifactCatalog.scan(spark, root).collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[String]("path"), r.getAs[Boolean]("drifted"))).toMap
    assert(clean.keySet == Set("graft.bpe", "graft.winnow"))
    assert(clean.values.forall(!_._2), s"freshly-built artifacts must not drift: $clean")
    assert(clean("graft.bpe")._1.endsWith("bpe_merges"))
    assert(clean("graft.winnow")._1.endsWith("winnow_idx"))

    // drift ONE knob: only the artifact of that kind flips
    spark.conf.set("spark.graft.bpe.merges", "5")
    try {
      val drifted = ArtifactCatalog.scan(spark, root).collect()
        .map(r => r.getAs[String]("kind") ->
          (r.getAs[String]("stored_conf"), r.getAs[String]("live_conf"),
            r.getAs[Boolean]("drifted"))).toMap
      assert(drifted("graft.bpe") == (("merges=8", "merges=5", true)))
      assert(!drifted("graft.winnow")._3)
    } finally spark.conf.unset("spark.graft.bpe.merges")
  }
}
