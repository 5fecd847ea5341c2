package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Field-level extraction evaluation (SURVEY §2B) — the Spark re-expression
  * of `evaluation/evaluator.py`.
  *
  * The reference computes TP/FP/FN over predicted-vs-truth field sets
  * (evaluator.py:43), exact match after lower+strip normalization (:82),
  * partial match via substring containment (:86), then micro P/R/F1 (:63),
  * comparing the system extractor against a naive regex baseline (:95).
  *
  * Here the "system" is the schema-ladder extractor and the "baseline" the
  * naive single-pattern extractor; metrics aggregate per field over the
  * whole corpus in one explode + groupBy (a single shuffle of
  * 3 rows × n_docs).
  */
object Evaluation {

  /** (field, system pattern, baseline pattern) — baseline plays the role of
    * evaluator.py BaselineExtractor's pattern table.
    */
  val FieldPairs: Seq[(String, String, String)] = Seq(
    ("first_join", "join (\\w+)", "join (\\w+ \\w+)"),
    ("table_ref", "table (\\w+)", "table (scan|merge)"),
    ("stream_kind", "stream (\\w+)", "(\\w+) stream"))

  def evaluateExtraction(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairStructs = FieldPairs.map { case (name, sysP, baseP) =>
      struct(
        lit(name).as("field"),
        nullif(regexp_extract(col("text"), sysP, 1), lit("")).as("pred"),
        nullif(regexp_extract(col("text"), baseP, 1), lit("")).as("truth"))
    }
    val long = docs.select(explode(array(pairStructs: _*)).as("x")).select(col("x.*"))
    val predN = col("pred").isNotNull
    val truthN = col("truth").isNotNull
    val normEq = lower(trim(col("pred"))) === lower(trim(col("truth")))
    val contains = instr(col("truth"), col("pred")) > 0 || instr(col("pred"), col("truth")) > 0
    val agg = long.groupBy(col("field")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(predN && truthN, 1).otherwise(0)).cast("long").as("tp"),
      sum(when(predN && !truthN, 1).otherwise(0)).cast("long").as("fp"),
      sum(when(!predN && truthN, 1).otherwise(0)).cast("long").as("fn"),
      sum(when(predN && truthN && normEq, 1).otherwise(0)).cast("long").as("exact"),
      sum(when(predN && truthN && !normEq && contains, 1).otherwise(0)).cast("long").as("partial"))
    agg
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4)).otherwise(0.0))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4)).otherwise(0.0))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")), 4))
          .otherwise(0.0))
      .contractOrderBy("field")
  }

  val evaluateExtractionSql: String = {
    val unions = FieldPairs.map { case (name, sysP, baseP) =>
      s"""SELECT '$name' AS field,
         |  nullif(regexp_extract(text, '$sysP', 1), '') AS pred,
         |  nullif(regexp_extract(text, '$baseP', 1), '') AS truth
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH long AS (
       |$unions
       |), agg AS (
       |  SELECT field, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN pred IS NOT NULL AND truth IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN pred IS NOT NULL AND truth IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN pred IS NULL AND truth IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN pred IS NOT NULL AND truth IS NOT NULL AND lower(trim(pred)) = lower(trim(truth)) THEN 1 ELSE 0 END) AS BIGINT) AS exact,
       |    CAST(sum(CASE WHEN pred IS NOT NULL AND truth IS NOT NULL AND lower(trim(pred)) <> lower(trim(truth))
       |              AND (instr(truth, pred) > 0 OR instr(pred, truth) > 0) THEN 1 ELSE 0 END) AS BIGINT) AS partial
       |  FROM long GROUP BY field
       |)
       |SELECT field, n_docs, tp, fp, fn, exact, partial,
       |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 4) ELSE 0.0 END AS precision,
       |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fn), 4) ELSE 0.0 END AS recall,
       |  CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * tp / (2 * tp + fp + fn), 4) ELSE 0.0 END AS f1
       |FROM agg
       |ORDER BY field""".stripMargin
  }

  /** (field, truth pattern, system pattern, baseline pattern) for the
    * baseline-compare harness. Truth plays the test-case ground_truth role;
    * system is the schema-ladder extractor; baseline the naive
    * single-pattern BaselineExtractor (evaluator.py:95). Patterns are
    * chosen so each extractor has a different error profile (system
    * overpredicts table_ref; baseline under-recalls and mis-captures).
    */
  val BaselineFields: Seq[(String, String, String, String)] = Seq(
    ("first_join",  "join (\\w+)",        "join (\\w+)",  "join (\\w+ \\w+)"),
    ("table_ref",   "table (scan|merge)", "table (\\w+)", "table (scan)"),
    ("stream_kind", "stream (\\w+)",      "stream (\\w+)", "(\\w+) stream"))

  /** `evaluate_vs_baseline`: the reference's `compare_with_baseline`
    * (evaluator.py:159) + `generate_report` (:194) re-expressed as a
    * side-by-side metric table — per-field system-vs-baseline TP/FP/FN,
    * micro F1 and exact accuracy, plus the improvement deltas, and the
    * report's aggregate as a ROLLUP `ALL` row. One corpus scan, one
    * shuffle (3 rows × n_docs into the rollup agg).
    *
    * Determinism: deltas subtract the RAW integer-ratio doubles (identical
    * IEEE ops in both engines) and round ONCE (to 3, like evaluator.py:188).
    */
  def evaluateVsBaseline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val triStructs = BaselineFields.map { case (name, truthP, sysP, baseP) =>
      struct(
        lit(name).as("field"),
        nullif(regexp_extract(col("text"), truthP, 1), lit("")).as("truth"),
        nullif(regexp_extract(col("text"), sysP, 1), lit("")).as("sys_pred"),
        nullif(regexp_extract(col("text"), baseP, 1), lit("")).as("base_pred"))
    }
    val long = docs.select(explode(array(triStructs: _*)).as("x")).select(col("x.*"))
    def tp(p: Column) = sum(when(p.isNotNull && col("truth").isNotNull, 1).otherwise(0)).cast("long")
    def fp(p: Column) = sum(when(p.isNotNull && col("truth").isNull, 1).otherwise(0)).cast("long")
    def fn(p: Column) = sum(when(p.isNull && col("truth").isNotNull, 1).otherwise(0)).cast("long")
    def exact(p: Column) =
      sum(when(p.isNotNull && col("truth").isNotNull &&
        lower(trim(p)) === lower(trim(col("truth"))), 1).otherwise(0)).cast("long")
    val agg = long.rollup(col("field")).agg(
      count(lit(1)).as("n_docs"),
      tp(col("sys_pred")).as("sys_tp"), fp(col("sys_pred")).as("sys_fp"),
      fn(col("sys_pred")).as("sys_fn"), exact(col("sys_pred")).as("sys_exact"),
      tp(col("base_pred")).as("base_tp"), fp(col("base_pred")).as("base_fp"),
      fn(col("base_pred")).as("base_fn"), exact(col("base_pred")).as("base_exact"))
    def f1raw(t: Column, p: Column, n: Column): Column =
      when(lit(2) * t + p + n > 0, lit(2.0) * t / (lit(2) * t + p + n)).otherwise(0.0)
    def accRaw(e: Column): Column = e.cast("double") / col("n_docs")
    val sysF1 = f1raw(col("sys_tp"), col("sys_fp"), col("sys_fn"))
    val baseF1 = f1raw(col("base_tp"), col("base_fp"), col("base_fn"))
    agg
      .withColumn("field", coalesce(col("field"), lit("ALL")))
      .withColumn("sys_f1", round(sysF1, 4))
      .withColumn("sys_acc", round(accRaw(col("sys_exact")), 4))
      .withColumn("base_f1", round(baseF1, 4))
      .withColumn("base_acc", round(accRaw(col("base_exact")), 4))
      .withColumn("f1_improvement", round(sysF1 - baseF1, 3))
      .withColumn("acc_improvement",
        round(accRaw(col("sys_exact")) - accRaw(col("base_exact")), 3))
      .select("field", "n_docs", "sys_tp", "sys_fp", "sys_fn", "sys_f1", "sys_acc",
        "base_tp", "base_fp", "base_fn", "base_f1", "base_acc",
        "f1_improvement", "acc_improvement")
      .contractOrderBy("field")
  }

  val evaluateVsBaselineSql: String = {
    val unions = BaselineFields.map { case (name, truthP, sysP, baseP) =>
      s"""SELECT '$name' AS field,
         |  nullif(regexp_extract(text, '$truthP', 1), '') AS truth,
         |  nullif(regexp_extract(text, '$sysP', 1), '') AS sys_pred,
         |  nullif(regexp_extract(text, '$baseP', 1), '') AS base_pred
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    def tp(p: String) = s"CAST(sum(CASE WHEN $p IS NOT NULL AND truth IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
    def fp(p: String) = s"CAST(sum(CASE WHEN $p IS NOT NULL AND truth IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    def fn(p: String) = s"CAST(sum(CASE WHEN $p IS NULL AND truth IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
    def exact(p: String) =
      s"CAST(sum(CASE WHEN $p IS NOT NULL AND truth IS NOT NULL AND lower(trim($p)) = lower(trim(truth)) THEN 1 ELSE 0 END) AS BIGINT)"
    // CAST(2 AS DOUBLE): a bare 2.0 is DECIMAL in DuckDB and decimal
    // division wouldn't bit-match Spark's IEEE double here
    def f1raw(pre: String) =
      s"CASE WHEN 2 * ${pre}_tp + ${pre}_fp + ${pre}_fn > 0 THEN CAST(2 AS DOUBLE) * ${pre}_tp / (2 * ${pre}_tp + ${pre}_fp + ${pre}_fn) ELSE 0.0 END"
    s"""WITH long AS (
       |$unions
       |), agg AS (
       |  SELECT coalesce(field, 'ALL') AS field, count(*) AS n_docs,
       |    ${tp("sys_pred")} AS sys_tp, ${fp("sys_pred")} AS sys_fp,
       |    ${fn("sys_pred")} AS sys_fn, ${exact("sys_pred")} AS sys_exact,
       |    ${tp("base_pred")} AS base_tp, ${fp("base_pred")} AS base_fp,
       |    ${fn("base_pred")} AS base_fn, ${exact("base_pred")} AS base_exact
       |  FROM long GROUP BY ROLLUP(field)
       |)
       |SELECT field, n_docs, sys_tp, sys_fp, sys_fn,
       |  round(${f1raw("sys")}, 4) AS sys_f1,
       |  round(CAST(sys_exact AS DOUBLE) / n_docs, 4) AS sys_acc,
       |  base_tp, base_fp, base_fn,
       |  round(${f1raw("base")}, 4) AS base_f1,
       |  round(CAST(base_exact AS DOUBLE) / n_docs, 4) AS base_acc,
       |  round((${f1raw("sys")}) - (${f1raw("base")}), 3) AS f1_improvement,
       |  round(CAST(sys_exact AS DOUBLE) / n_docs - CAST(base_exact AS DOUBLE) / n_docs, 3) AS acc_improvement
       |FROM agg
       |ORDER BY field""".stripMargin
  }
}
