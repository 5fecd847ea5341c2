package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{SchemaExtract, Validation}
import graft.operators.SchemaExtract.{FieldSpec, FormSchema}

/** The pluggable third extraction rung (the reference's LLM fallback,
  * form_filler.py after regex/keyword): rung 3 must be consulted on
  * EXACTLY the rung-1/2 miss set, a pattern/keyword capture must always
  * win over a rung-3 proposal, and the composed form must flow through
  * the same typed parse/validate tail as any other extracted field.
  */
class ExternalRungSpec extends SparkSpec {
  import spark.implicits._

  private val schema = FormSchema("Rung3_Form", Seq(
    FieldSpec("first_join", "string", required = true, Seq("join (\\w+)")),
    FieldSpec("due_date", "date", required = false,
      Seq("due ([0-9]{4}-[0-9]{2}-[0-9]{2})")),
    FieldSpec("batch_n", "number", required = false, Seq("batch ([0-9]+)"))))

  /** Records exactly what the ladder hands rung 3, then delegates to the
    * shipped deterministic stub.
    */
  private final class RecordingStub extends SchemaExtract.ExternalExtractor {
    val inner = new SchemaExtract.StubExternalExtractor(schema)
    @volatile var seen: Set[(Long, String)] = Set.empty
    def extract(misses: DataFrame): DataFrame = {
      seen = misses.select("doc_id", "field").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      inner.extract(misses)
    }
  }

  // doc 1: all three fields hit rung 1/2; doc 2: only first_join hits;
  // doc 3: nothing hits
  private def docs = Seq(
    (1L, "join hash due 2023-05-06 batch 7"),
    (2L, "join merge and nothing else"),
    (3L, "no captures at all here")).toDF("doc_id", "text")

  test("rung 3 fires on exactly the rung-1/2 miss set; captures always win; misses fill from the stub") {
    val stub = new RecordingStub
    val out = SchemaExtract.extractFieldsWithExternal(docs, schema, stub)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stub.seen == Set(
      (2L, "due_date"), (2L, "batch_n"),
      (3L, "first_join"), (3L, "due_date"), (3L, "batch_n")),
      s"rung 3 must see the misses and nothing else: ${stub.seen}")
    // rung-1/2 captures win
    assert(out(1L).getAs[String]("first_join") == "hash" &&
      out(1L).getAs[String]("due_date") == "2023-05-06" &&
      out(1L).getAs[String]("batch_n") == "7", s"${out(1L)}")
    // partial doc: the hit stays, the misses fill from the stub
    assert(out(2L).getAs[String]("first_join") == "merge" &&
      out(2L).getAs[String]("due_date") == "2024-01-02" &&
      out(2L).getAs[String]("batch_n") == "42", s"${out(2L)}")
    // full miss: everything fills from the stub, doc-salted string
    assert(out(3L).getAs[String]("first_join") == "ext_3" &&
      out(3L).getAs[String]("due_date") == "2024-01-02" &&
      out(3L).getAs[String]("batch_n") == "42", s"${out(3L)}")
  }

  test("rung-3 proposals flow through the same typed parse/validate tail as rung-1/2 captures") {
    val composed = SchemaExtract.extractFieldsWithExternal(
      docs, schema, new SchemaExtract.StubExternalExtractor(schema))
    val typed = composed
      .withColumn("date_ok", col("due_date").rlike(Validation.IsoDatePattern) &&
        expr("try_cast(due_date AS date)").isNotNull)
      .withColumn("parsed_date", expr("try_cast(due_date AS date)"))
      .withColumn("num_ok", col("batch_n").rlike(Validation.NumberPattern))
      .withColumn("parsed_num", expr("try_cast(batch_n AS bigint)"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // a rung-1 capture and a rung-3 proposal validate under the SAME rules
    Seq(1L, 2L, 3L).foreach { id =>
      val r = typed(id)
      assert(r.getAs[Boolean]("date_ok") && r.getAs[Boolean]("num_ok"),
        s"composed field must validate for doc $id: $r")
      assert(r.getAs[java.sql.Date]("parsed_date") != null &&
        r.getAs[Long]("parsed_num") > 0,
        s"composed field must parse typed for doc $id: $r")
    }
  }
}
