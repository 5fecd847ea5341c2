package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import SchemaExtract.QueryLogForm

/** Rule-based validation + completeness (SURVEY §2B) — the Spark
  * re-expression of `utils/validation.py` (RequiredFieldRule,
  * TypeValidationRule, ConstraintValidationRule) and `utils/form.py`
  * (`is_complete`, `get_missing_fields`).
  *
  * Each rule is a boolean Column; the rule set evaluates for every row in
  * one projection (no per-row rule loop as in the reference — the loop is
  * compiled into the plan).
  */
object Validation {

  /** Constraint constants (constraints.{min,max} analog, validation.py:97). */
  val PriceMin = 0.0
  val PriceMax = 400000.0
  val StatusEnum = Seq("O", "F", "P")
  val SegmentEnum = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  /** o_orderpriority must look like `1-URGENT` — NO spaces, so the real
    * value `4-NOT SPECIFIED` fails, exercising the error path.
    */
  val PrioPattern = "^[1-5]-[A-Z]+$"

  /** `validate_fields`: per-order rule evaluation with error count. */
  def validateFields(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("r_required_name", col("c_name").isNotNull)
      .withColumn("r_status_enum", col("o_orderstatus").isin(StatusEnum: _*))
      .withColumn("r_prio_pattern", col("o_orderpriority").rlike(PrioPattern))
      .withColumn("r_price_min", col("o_totalprice") >= PriceMin)
      .withColumn("r_price_max", col("o_totalprice") <= PriceMax)
      .withColumn("r_seg_enum", col("c_mktsegment").isin(SegmentEnum: _*))
      .withColumn("n_errors",
        (when(!col("r_required_name"), 1).otherwise(0)
          + when(!col("r_status_enum"), 1).otherwise(0)
          + when(!col("r_prio_pattern"), 1).otherwise(0)
          + when(!col("r_price_min"), 1).otherwise(0)
          + when(!col("r_price_max"), 1).otherwise(0)
          + when(!col("r_seg_enum"), 1).otherwise(0)).cast("long"))
      .withColumn("is_valid", col("n_errors") === 0)
      .select("o_orderkey", "o_custkey", "r_required_name", "r_status_enum",
        "r_prio_pattern", "r_price_min", "r_price_max", "r_seg_enum", "n_errors", "is_valid")
      .orderBy("o_orderkey")
  }

  val validateFieldsSql: String =
    s"""SELECT o_orderkey, o_custkey,
       |  c_name IS NOT NULL AS r_required_name,
       |  o_orderstatus IN ('O','F','P') AS r_status_enum,
       |  regexp_matches(o_orderpriority, '$PrioPattern') AS r_prio_pattern,
       |  o_totalprice >= $PriceMin AS r_price_min,
       |  o_totalprice <= $PriceMax AS r_price_max,
       |  c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') AS r_seg_enum,
       |  CAST((CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
       |     + (CASE WHEN NOT regexp_matches(o_orderpriority, '$PrioPattern') THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_totalprice < $PriceMin THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_totalprice > $PriceMax THEN 1 ELSE 0 END)
       |     + (CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_errors,
       |  ((CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
       |     + (CASE WHEN NOT regexp_matches(o_orderpriority, '$PrioPattern') THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_totalprice < $PriceMin THEN 1 ELSE 0 END)
       |     + (CASE WHEN o_totalprice > $PriceMax THEN 1 ELSE 0 END)
       |     + (CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END)) = 0 AS is_valid
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_orderkey""".stripMargin

  /** `form_complete`: per-document completeness over the extracted form
    * (form.py:49 `is_complete` / :60 `get_missing_fields`). Derived from the
    * SAME FormSchema as the extractor, like the reference.
    */
  def formComplete(spark: SparkSession, dir: String): DataFrame = {
    val form = SchemaExtract.extractFields(spark, dir)
    val required = QueryLogForm.fields.filter(_.required)
    val all = QueryLogForm.fields
    val missing = concat_ws(",",
      required.map(f => when(col(f.name).isNull, f.name)): _*)
    val nFilled = all.map(f => when(col(f.name).isNotNull, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val isComplete = required.map(f => col(f.name).isNotNull).reduce(_ && _)
    form.select(col("doc_id"), isComplete.as("is_complete"),
        nFilled.as("n_filled"), missing.as("missing_fields"))
      .orderBy("doc_id")
  }

  val formCompleteSql: String = {
    val required = QueryLogForm.fields.filter(_.required)
    val all = QueryLogForm.fields
    val fieldSelects = QueryLogForm.fields.map { f =>
      val rungs = f.allPatterns.map(p => s"nullif(regexp_extract(text, '$p', 1), '')")
      s"coalesce(${rungs.mkString(", ")}) AS ${f.name}"
    }
    val missing = required.map(f => s"CASE WHEN ${f.name} IS NULL THEN '${f.name}' END").mkString(", ")
    val nFilled = all.map(f => s"(CASE WHEN ${f.name} IS NOT NULL THEN 1 ELSE 0 END)").mkString(" + ")
    val isComplete = required.map(f => s"${f.name} IS NOT NULL").mkString(" AND ")
    s"""WITH form AS (SELECT doc_id, ${fieldSelects.mkString(",\n  ")} FROM documents)
       |SELECT doc_id, $isComplete AS is_complete,
       |  CAST($nFilled AS BIGINT) AS n_filled,
       |  concat_ws(',', $missing) AS missing_fields
       |FROM form
       |ORDER BY doc_id""".stripMargin
  }
}
