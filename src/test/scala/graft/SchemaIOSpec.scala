package graft

import graft.operators.{SchemaExtract, SchemaIO}

class SchemaIOSpec extends SparkSpec {

  test("schema JSON round-trip preserves the full schema") {
    val back = SchemaIO.fromJson(SchemaIO.toJson(SchemaExtract.QueryLogForm))
    assert(back == SchemaExtract.QueryLogForm)
  }

  test("loads a reference-format NDA schema JSON (schema.py shape)") {
    val json =
      """{
        |  "form_name": "NDA_Form",
        |  "version": "1.0",
        |  "fields": {
        |    "effective_date": {
        |      "type": "date", "required": true,
        |      "keywords": ["effective", "effective date"],
        |      "patterns": ["effective\\s+(?:on\\s+)?([0-9-]+)"]
        |    },
        |    "governing_law": {
        |      "type": "string", "required": true,
        |      "keywords": ["governing law", "governed by"],
        |      "patterns": ["laws of\\s+([A-Za-z ]+)"]
        |    },
        |    "termination_notice": { "type": "string", "required": false, "default": "30 days" }
        |  }
        |}""".stripMargin
    val s = SchemaIO.fromJson(json)
    assert(s.formName == "NDA_Form" && s.fields.length == 3)
    val eff = s.fields.find(_.name == "effective_date").get
    assert(eff.fieldType == "date" && eff.required && eff.keywords.length == 2)
    val term = s.fields.find(_.name == "termination_notice").get
    assert(!term.required && term.default.contains("30 days"))
    // a loaded schema drives the extraction ladder like the built-in one
    assert(eff.allPatterns.length == 3) // 1 pattern + 2 keyword rungs
  }

  test("save/load through the filesystem") {
    val p = java.nio.file.Files.createTempFile("graft_schema", ".json").toString
    SchemaIO.save(SchemaExtract.QueryLogForm, p)
    assert(SchemaIO.load(p) == SchemaExtract.QueryLogForm)
  }
}
