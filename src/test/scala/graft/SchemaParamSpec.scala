package graft

import org.apache.spark.sql.functions._
import graft.operators.{SchemaExtract, SchemaIO, SchemaManager, Schemas}

/** Schema-PARAMETERIZED extraction: the reference drives `populate` from a
  * SchemaManager-loaded JSON (form_filler.py:19, schema.py:181); these specs
  * prove graft's extractor runs end-to-end from the bundled reference-format
  * schema files, not from hardcoded Scala.
  */
class SchemaParamSpec extends SparkSpec {

  test("bundled reference schemas load through the SchemaManager catalog") {
    assert(Schemas.manager.listSchemas.toSet == Set("NDA_Form", "Employment_Agreement"))
    val nda = Schemas.nda
    assert(nda.fields.map(_.name) == Seq("effective_date", "termination_notice",
      "governing_law", "disclosing_party", "receiving_party", "confidentiality_period"))
    assert(nda.fields.filter(_.required).map(_.name).toSet ==
      Set("effective_date", "governing_law", "disclosing_party", "receiving_party"))
    assert(nda.fields.forall(_.allPatterns.nonEmpty))
    val emp = Schemas.employment
    assert(emp.fields.map(_.name).toSet == Set("employee_name", "employer_name",
      "start_date", "position", "salary", "vacation_days"))
    // the reference fills Employment fields via the (out-of-scope) LLM rung:
    // no patterns/keywords, so the deterministic ladder extracts NULL
    assert(emp.fields.forall(_.allPatterns.isEmpty))
  }

  test("NDA ladder extracts reference-style clauses field by field") {
    import spark.implicits._
    val docs = Seq(
      (0L, "This Agreement is effective 2024-01-15 between the parties."),
      (1L, "termination notice period 60 days written notice applies."),
      (2L, "This contract is governed by the State of New York. See annex."),
      (3L, "The disclosing party means Globex Corp, a Delaware company."),
      (4L, "The recipient means Initech LLC, for all purposes."),
      (5L, "held confidential for a period of 5 years after termination."),
      (6L, "no contract language at all in this one.")
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id") +: Schemas.nda.fields.map(f => SchemaExtract.fieldCol(f)): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "2024-01-15")
    assert(out(1).getString(2) == "60 days written notice")
    assert(out(2).getString(3) == "State of New York")
    assert(out(3).getString(4) == "Globex Corp")
    assert(out(4).getString(5) == "Initech LLC")
    assert(out(5).getString(6) == "5 years")
    assert((1 to 6).forall(out(6).isNullAt)) // miss path: every field NULL
  }

  test("extract_fields_nda: every planted clause case captures its field") {
    val out = SchemaExtract.extractFieldsNda(spark, sf)
      .groupBy(col("clause_case"))
      .agg(min(col("n_found")).as("min_found"), max(col("n_found")).as("max_found"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L to 5L).foreach { c => assert(out(c)._1 >= 1L, s"clause case $c never captured") }
    assert(out(6L) == (0L, 0L), "no-clause case must extract nothing")
  }

  test("extract_fields_scoped matches an in-memory _find_context reference") {
    // third independent implementation of the reference's fuzzy section
    // scoping (form_filler.py:102-116) + regex ladder, compared row-for-row
    val cg = graft.operators.Layout.clauseGraph(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("section"), r.getAs[String]("clause_text")))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => t._2.split("_")(1).toLong)).toMap
    val schema = SchemaExtract.QueryLogForm
    val allDocs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = allDocs.sorted.map { doc =>
      val clauses = cg.getOrElse(doc, Array.empty[(Long, String, String)])
      val fields = schema.fields.map { f =>
        val hint = f.section.get.toLowerCase
        val ctx = clauses.filter(c =>
          c._2.toLowerCase.contains(hint) || c._3.toLowerCase.contains(hint))
          .map(_._3).mkString(" ")
        if (ctx.isEmpty) null
        else f.allPatterns.iterator
          .map(p => p.r.findFirstMatchIn(ctx).map(_.group(1)).filter(_.nonEmpty).orNull)
          .collectFirst { case v if v != null => v }.orNull
      }
      (doc, fields)
    }
    val got = SchemaExtract.extractFieldsScoped(spark, sf).collect()
      .map(r => (r.getLong(0), schema.fields.indices.map(i =>
        if (r.isNullAt(i + 1)) null else r.getString(i + 1))))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gd, gf), (ed, ef)) =>
      assert(gd == ed)
      assert(gf == ef.toSeq, s"doc $gd: got $gf expected ${ef.toSeq}")
    }
    // the scoping is non-trivial on this corpus: some field captured somewhere
    assert(got.exists(_._2.exists(_ != null)))
  }

  test("extract_fields_employment: each planted clause feeds exactly its field; miss case all-NULL") {
    val fields = SchemaExtract.employmentKeyworded.fields.map(_.name)
    // the augmented schema came back from the catalog, keywords intact
    assert(Schemas.manager.listSchemas.contains("Employment_Agreement_Extractable"))
    assert(SchemaExtract.employmentKeyworded.fields
      .forall(f => f.patterns.nonEmpty || f.keywords.nonEmpty))
    val expectByCase = Map(
      0 -> ("employee_name" -> "Margaret"),
      1 -> ("employer_name" -> "WidgetWorks"),
      2 -> ("start_date" -> "2024-06-01"),
      3 -> ("position" -> "engineer"),
      4 -> ("salary" -> "USD 75000"),
      5 -> ("vacation_days" -> "15"))
    SchemaExtract.extractFieldsEmployment(spark, sf).collect().foreach { r =>
      val c = r.getAs[Long]("clause_case").toInt
      val found = fields.map(f => f -> (if (r.isNullAt(r.fieldIndex(f))) null
        else r.getAs[String](f))).filter(_._2 != null)
      if (c == 6) {
        assert(found.isEmpty && r.getAs[Long]("n_found") == 0L, s"case 6: $found")
      } else {
        assert(found == Seq(expectByCase(c)._1 -> expectByCase(c)._2),
          s"case $c: $found")
        assert(r.getAs[Long]("n_found") == 1L)
      }
    }
  }

  test("extract_fields_scoped_employment: section-hint contexts work on the second schema") {
    // the scoped schema round-tripped the catalog with its sections intact
    // (forcing the lazy val registers it)
    assert(SchemaExtract.employmentScoped.fields.forall(_.section.nonEmpty))
    assert(Schemas.manager.listSchemas.contains("Employment_Agreement_Scoped"))
    val expectByCase = Map(
      0 -> ("employee_name" -> "Margaret"),
      1 -> ("employer_name" -> "WidgetWorks"),
      2 -> ("start_date" -> "2024-06-01"),
      3 -> ("position" -> "engineer"),
      4 -> ("salary" -> "USD 75000"),
      5 -> ("vacation_days" -> "15"))
    val fields = SchemaExtract.employmentScoped.fields.map(_.name)
    val rows = SchemaExtract.extractFieldsScopedEmployment(spark, sf).collect()
    val hits = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    rows.foreach { r =>
      val c = (r.getAs[Long]("doc_id") % 7).toInt
      val found = fields.map(f => f -> (if (r.isNullAt(r.fieldIndex(f))) null
        else r.getAs[String](f))).filter(_._2 != null)
      if (c == 6) assert(found.isEmpty, s"miss case found: $found")
      else {
        // a doc finds its OWN planted field or nothing (headingless docs
        // drop the appended clause — the no-context path), never another's
        val (ef, ev) = expectByCase(c)
        assert(found.isEmpty || found == Seq(ef -> ev), s"case $c: $found")
        if (found.nonEmpty) hits(ef) += 1
      }
    }
    // every field's section-hint context fired on some document — the
    // scoped path is exercised per-field, not vacuously green
    fields.foreach(f => assert(hits(f) > 0, s"field $f never found; hits=$hits"))
  }

  test("a user schema round-trips through a SchemaManager directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-user-schemas")
    val m1 = new SchemaManager(dir.toString)
    assert(m1.addSchema(Schemas.nda))
    val m2 = new SchemaManager(dir.toString) // fresh load from disk
    assert(m2.getSchema("NDA_Form").contains(Schemas.nda))
    // and the reloaded schema generates the identical oracle SQL
    assert(SchemaExtract.extractFieldsForSql(m2.getSchema("NDA_Form").get) ==
      SchemaExtract.extractFieldsForSql(Schemas.nda))
  }
}
