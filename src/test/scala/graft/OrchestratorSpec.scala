package graft

import org.apache.spark.sql.functions._
import graft.operators.{Orchestrator, SchemaExtract, Validation}
import graft.sources.Sinks

class OrchestratorSpec extends SparkSpec {

  test("form_recovered: defaults fill exactly the null optional fields") {
    val raw = SchemaExtract.extractFields(spark, sf)
    val rec = Orchestrator.formRecovered(spark, sf)
    // no nulls remain in defaulted fields
    assert(rec.filter(col("stream_kind").isNull || col("sort_mode").isNull).count() == 0)
    // n_recovered equals the nulls the raw extraction had
    val rawNulls = raw.agg(
      sum(when(col("stream_kind").isNull, 1).otherwise(0) +
          when(col("sort_mode").isNull, 1).otherwise(0))).collect()(0).getLong(0)
    val recovered = rec.agg(sum("n_recovered")).collect()(0).getLong(0)
    assert(recovered == rawNulls)
    // required fields are NOT defaulted (reference: required missing ⇒ error)
    val rawJoinNulls = raw.filter(col("first_join").isNull).count()
    assert(rec.filter(col("first_join").isNull).count() == rawJoinNulls)
  }

  test("pipeline_output: one row per doc, completeness matches form_complete") {
    val out = Orchestrator.pipelineOutput(spark, sf)
    assert(out.count() == sources.Tables.documents(spark, sf).count())
    val fc = Validation.formComplete(spark, sf).select("doc_id", "is_complete")
      .withColumnRenamed("is_complete", "fc_complete")
    assert(out.join(fc, "doc_id")
      .filter(col("is_complete") =!= col("fc_complete")).count() == 0)
    // docs with clauses have positive block counts
    assert(out.filter(col("n_clauses") > 0 && col("n_clause_blocks") <= 0).count() == 0)
  }

  test("orchestrator stages: every stage runs and the DAG composes to one plan") {
    Orchestrator.stages.foreach { case (name, fn) =>
      assert(fn(spark, sf).limit(1).count() >= 0, s"stage $name failed")
    }
    // the fused plan contains no action boundaries: single logical plan
    val plan = Orchestrator.run(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.nonEmpty)
  }

  test("sinks: JSON round-trip preserves the form rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    val out = Orchestrator.pipelineOutput(spark, sf).limit(50)
    Sinks.writeFormJson(out, tmp)
    val back = spark.read.json(tmp)
    assert(back.count() == 50)
    assert(back.columns.contains("first_join") && back.columns.contains("is_complete"))
  }

  test("sinks: bucketed tables join without a shuffle on the bucket key") {
    import graft.sources.{Sinks, Tables}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Sinks.writeBucketed(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", buckets = 8)
      Sinks.writeBucketed(Tables.orders(spark, sf)
        .select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey", buckets = 8)
      val joined = spark.table("li_b").join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: sort-merge join with NO Exchange feeding it
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("sinks: partitioned parquet write prunes partitions on read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(sources.Tables.documents(spark, sf), tmp, "lang")
    val pruned = spark.read.parquet(tmp).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"))
  }
}
