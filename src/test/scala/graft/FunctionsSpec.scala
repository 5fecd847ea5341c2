package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Specs for native expressions + plan-shape audits (pushdown/pruning). */
class FunctionsSpec extends SparkSpec {

  test("graft_dot: registered via GraftExtensions, exact left-to-right fold") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(expr("graft_dot(a, b)").as("d")).collect()(0).getDouble(0)
    assert(r == 32.0)
    // null propagation
    val n = df.select(expr("graft_dot(a, cast(null as array<double>))").as("d")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_dot: codegen path matches interpreted eval on real embeddings") {
    // dedup_embedding (codegen) equals a zip_with fold computed independently
    val viaExpr = Dedup.dedupEmbedding(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos")))
    val e = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
    val viaFold = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(
        expr("aggregate(zip_with(a.emb, b.emb, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"), 4))
      .filter(col("cos") >= Dedup.CosineTau)
      .select(col("a.vec_id"), col("b.vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(viaExpr.sorted.sameElements(viaFold.sorted))
  }

  test("graft_l2sq: exact over both bigint and double arrays, null-safe") {
    import spark.implicits._
    val df = Seq((Array(3L, -1L, 4L), Array(1L, 1L, 1L))).toDF("a", "b")
    assert(df.select(expr("graft_l2sq(a, b)")).collect()(0).getLong(0) == 17L)
    val dd = Seq((Array(1.5, 2.0), Array(0.5, 0.0))).toDF("a", "b")
    assert(dd.select(expr("graft_l2sq(a, b)")).collect()(0).getDouble(0) == 5.0)
    assert(df.select(expr("graft_l2sq(a, cast(null as array<bigint>))"))
      .collect()(0).isNullAt(0))
    // matches the interpreted higher-order-function formulation it replaced
    val both = sources.Tables.embeddings(spark, sf)
      .select(expr(s"transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))").as("se"))
      .withColumn("cemb", expr("transform(se, x -> 0L)"))
      .select(
        expr("graft_l2sq(se, cemb)").as("native"),
        expr("aggregate(zip_with(se, cemb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(both == 0L)
  }

  test("graft_dot/graft_l2sq: length mismatch and null elements yield NULL") {
    import spark.implicits._
    // Column-built arrays (non-foldable) so the CODEGEN path is exercised,
    // not just constant-folded interpreted eval.
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val r = df.select(
      expr("graft_dot(array(x), array(x, y))").as("d_mis"),
      expr("graft_dot(array(x, cast(null as double)), array(x, y))").as("d_nel"),
      expr("graft_l2sq(array(cast(x as bigint)), array(cast(x as bigint), cast(y as bigint)))").as("l_mis"),
      expr("graft_l2sq(array(cast(x as bigint), cast(null as bigint)), array(cast(x as bigint), cast(y as bigint)))").as("l_nel"),
      expr("graft_dot(array(x, y), array(y, x))").as("d_ok"),
      expr("graft_l2sq(array(cast(x as bigint), cast(y as bigint)), array(cast(y as bigint), cast(x as bigint)))").as("l_ok"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) == 4.0 && r.getLong(5) == 2L)
    // interpreted eval path agrees (literal args are constant-folded)
    val lit = df.select(
      expr("graft_dot(array(cast(1.0 as double)), array(cast(1.0 as double), cast(2.0 as double)))"),
      expr("graft_l2sq(array(1L, cast(null as bigint)), array(1L, 2L))")).collect()(0)
    assert(lit.isNullAt(0) && lit.isNullAt(1))
  }

  test("plan audit: kmeans assignment runs graft_l2sq inside codegen, no zip_with") {
    val plan = operators.Clustering.kmeansTrain(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_l2sq"))
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("))
  }

  test("plan audit: extract_fields scan prunes to (doc_id, lang, text)") {
    val plan = operators.SchemaExtract.extractFields(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<" +
      plan.split("ReadSchema: struct<")(1).split(">")(0) + ">"
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"))
  }

  test("plan audit: q1 pushes the shipdate filter into the parquet scan") {
    val plan = operators.Relational.q1PricingSummary(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("plan audit: ann_topk broadcasts the query side") {
    val plan = Similarity.annTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }
}
