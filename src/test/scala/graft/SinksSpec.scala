package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sinks

/** Write-side scale contracts: act-step outputs land partitioned so a
  * downstream consumer reading one slice prunes partitions at the scan —
  * the write-side sibling of the bucketed-join (no-shuffle-on-read) spec.
  */
class SinksSpec extends SparkSpec {

  test("writePartitioned(split_assign): reading one split prunes partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-splitout").toString
    val assigned = CorpusOps.splitAssign(spark, sf)
    Sinks.writePartitioned(assigned, out, "split")
    // layout: one directory per split value (what makes pruning possible)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("split=train", "split=val", "split=test"))

    val oneSplit = spark.read.parquet(out).filter(col("split") === "train")
    val plan = oneSplit.queryExecution.executedPlan.toString
    val pf = plan.split('\n').find(_.contains("PartitionFilters")).getOrElse(
      fail(s"no PartitionFilters in scan:\n$plan"))
    // the split predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated after reading every row group
    assert(pf.contains("split") && pf.contains("train"), pf)
    // and the pruned read returns exactly the train rows
    val expected = assigned.filter(col("split") === "train").count()
    assert(expected > 0 && oneSplit.count() == expected)
  }

  test("writePartitioned(dedup_keep): per-status consumers prune to their slice") {
    val out = java.nio.file.Files.createTempDirectory("graft-keepout").toString
    val kept = Dedup.dedupKeep(spark, sf)
    Sinks.writePartitioned(kept, out, "status")
    val oneStatus = spark.read.parquet(out).filter(col("status") === "unique")
    val pf = oneStatus.queryExecution.executedPlan.toString
      .split('\n').find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("status") && pf.contains("unique"), pf)
    assert(oneStatus.count() == kept.filter(col("status") === "unique").count())
  }
}
