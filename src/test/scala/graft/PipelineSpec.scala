package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the form-schema ETL pipeline operators (SURVEY §2B). */
class PipelineSpec extends SparkSpec {

  test("ingest_blocks: blocks cover every word exactly once, ≤20 words each") {
    val blocks = Ingestion.ingestBlocks(spark, sf)
    val totalBlockWords = blocks.agg(sum("n_words")).collect()(0).getLong(0)
    val totalDocWords = sources.Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(totalBlockWords == totalDocWords)
    assert(blocks.filter(col("n_words") > 20 || col("n_words") < 1).count() == 0)
  }

  test("ingest_blocks: OCR confidence 0.8 only for short blocks") {
    val blocks = Ingestion.ingestBlocks(spark, sf)
    assert(blocks.filter(col("confidence") === 0.8 && col("n_chars") >= 200).count() == 0)
    assert(blocks.filter(col("confidence") === 1.0 && col("n_chars") < 200).count() == 0)
  }

  test("ocr_route: every doc routed exactly once") {
    val routed = Ingestion.ocrRoute(spark, sf).agg(sum("n_docs")).collect()(0).getLong(0)
    assert(routed == sources.Tables.documents(spark, sf).count())
  }

  test("tokenize_words: word_idx is dense per doc starting at 0") {
    val t = Ingestion.tokenizeWords(spark, sf)
    val bad = t.groupBy("doc_id")
      .agg(min("word_idx").as("mn"), max("word_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("bbox_normalize: normalized coords within [0, 1000]") {
    val b = Ingestion.bboxNormalize(spark, sf)
    val bad = b.filter(col("nx0") < 0 || col("ny0") < 0 || col("nx1") > 1000 || col("ny1") > 1000 ||
      col("nx0") >= col("nx1") || col("ny0") >= col("ny1"))
    assert(bad.count() == 0)
  }

  test("layout_classify: labels drawn from the reference label map") {
    val labels = Layout.layoutClassify(spark, sf).select("label").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("paragraph", "heading", "list_item", "table", "caption", "other")))
    assert(labels.contains("heading") && labels.contains("paragraph"))
  }

  test("clause_graph: every clause belongs to a heading block of its doc") {
    val g = Layout.clauseGraph(spark, sf)
    assert(g.count() > 0)
    // section key is "<headingword>_<block_id>"
    val badKey = g.filter(!col("section").rlike("^(section|article|part|table)_\\d+$"))
    assert(badKey.count() == 0)
    // clause text never contains a heading's own block (heading text excluded)
    val chars = g.filter(col("clause_chars") =!= length(col("clause_text")) - (col("n_blocks") - 1))
    assert(chars.count() == 0) // agg chars + single-space joins
  }

  test("extract_fields: ladder extracts the word after 'join' when present") {
    val docs = sources.Tables.documents(spark, sf)
    val withJoin = docs.filter(col("text").rlike("join \\w+")).count()
    val extracted = SchemaExtract.extractFields(spark, sf)
      .filter(col("first_join").isNotNull).count()
    assert(extracted == withJoin)
    // effective_date (reference NDA pattern) never matches this corpus
    assert(SchemaExtract.extractFields(spark, sf).filter(col("effective_date").isNotNull).count() == 0)
  }

  test("parse_typed: both date formats parse back to the original date") {
    val p = SchemaExtract.parseTyped(spark, sf)
    assert(p.filter(col("parsed_iso") =!= col("parsed_slash")).count() == 0)
    assert(p.filter(!col("currency_valid")).count() == 0)
    assert(p.filter(col("prio_num") < 1 || col("prio_num") > 5).count() == 0)
  }

  test("validate_fields: n_errors counts exactly the failed rules") {
    val v = Validation.validateFields(spark, sf)
    val bad = v.filter(col("n_errors") =!=
      (when(!col("r_required_name"), 1).otherwise(0) +
       when(!col("r_status_enum"), 1).otherwise(0) +
       when(!col("r_prio_pattern"), 1).otherwise(0) +
       when(!col("r_price_min"), 1).otherwise(0) +
       when(!col("r_price_max"), 1).otherwise(0) +
       when(!col("r_seg_enum"), 1).otherwise(0)))
    assert(bad.count() == 0)
    // the NOT-SPECIFIED priority rule actually fires somewhere
    assert(v.filter(!col("r_prio_pattern")).count() > 0)
  }

  test("form_complete: is_complete ⇔ no required field missing") {
    val f = Validation.formComplete(spark, sf)
    assert(f.filter(col("is_complete") && col("missing_fields") =!= "").count() == 0)
    assert(f.filter(!col("is_complete") && col("missing_fields") === "").count() == 0)
  }

  test("evaluate_extraction: metric identities hold (tp≥exact+partial, f1∈[0,1])") {
    val e = Evaluation.evaluateExtraction(spark, sf).collect()
    assert(e.length == 3)
    e.foreach { r =>
      assert(r.getAs[Long]("exact") + r.getAs[Long]("partial") <= r.getAs[Long]("tp"))
      val f1 = r.getAs[Double]("f1")
      assert(f1 >= 0.0 && f1 <= 1.0)
    }
  }
}
