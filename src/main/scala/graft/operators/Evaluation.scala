package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .orderBy("field")
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
}
