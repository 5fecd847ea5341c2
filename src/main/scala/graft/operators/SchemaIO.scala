package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

import SchemaExtract.{FieldSpec, FormSchema}

/** Schema file I/O (SURVEY §2B) — the reference's `SchemaManager`
  * (schema/schema.py:12) loads/saves form schemas as JSON files in the
  * shape `{form_name, version, fields: {name: {type, required, patterns,
  * keywords, default}}}`. Same wire format here, so a reference user's
  * existing schema JSONs load directly. (Jackson ships with Spark.)
  */
object SchemaIO {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): FormSchema = {
    val root = mapper.readTree(json)
    val formName = Option(root.get("form_name")).map(_.asText).getOrElse("Unknown")
    val fieldsNode = root.get("fields")
    val fields = fieldsNode.properties().asScala.toSeq.map { e =>
      val name = e.getKey
      val f = e.getValue
      def strings(key: String): Seq[String] = Option(f.get(key)) match {
        case Some(a: ArrayNode) => a.elements().asScala.map(_.asText).toSeq
        case Some(n) if n.isTextual => Seq(n.asText)
        case _ => Nil
      }
      FieldSpec(
        name = name,
        fieldType = Option(f.get("type")).map(_.asText).getOrElse("string"),
        required = Option(f.get("required")).exists(_.asBoolean),
        patterns = strings("patterns"),
        keywords = strings("keywords"),
        default = Option(f.get("default")).filter(!_.isNull).map(_.asText),
        section = Option(f.get("section")).filter(!_.isNull).map(_.asText))
    }
    FormSchema(formName, fields)
  }

  def toJson(schema: FormSchema): String = {
    val root = mapper.createObjectNode()
    root.put("form_name", schema.formName)
    root.put("version", "1.0")
    val fields = root.putObject("fields")
    schema.fields.foreach { f =>
      val n: ObjectNode = fields.putObject(f.name)
      n.put("type", f.fieldType)
      f.section.foreach(s => n.put("section", s))
      n.put("required", f.required)
      val pats = n.putArray("patterns")
      f.patterns.foreach(pats.add)
      if (f.keywords.nonEmpty) {
        val kws = n.putArray("keywords")
        f.keywords.foreach(kws.add)
      }
      f.default.foreach(d => n.put("default", d))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def save(schema: FormSchema, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(schema))

  def load(path: String): FormSchema =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}

/** The reference's shipped default schemas (schema/schema.py:67
  * DEFAULT_NDA_SCHEMA, :141 DEFAULT_EMPLOYMENT_SCHEMA), bundled as
  * reference-format JSON resources and loaded through the same
  * [[SchemaManager]] directory-catalog path a user's own schema directory
  * takes — so `extract_fields_nda`'s Spark plan AND its DuckDB oracle are
  * both generated from a SchemaManager-loaded JSON, never from hardcoded
  * Scala.
  */
object Schemas {
  import java.nio.file.Files

  private val Bundled = Seq("NDA_Form", "Employment_Agreement")

  lazy val manager: SchemaManager = {
    // one temp dir per JVM (lazy val), removed on exit — files first, then
    // the dir (deleteOnExit runs in reverse registration order)
    val dir = Files.createTempDirectory("graft-schemas")
    dir.toFile.deleteOnExit()
    Bundled.foreach { name =>
      val in = getClass.getResourceAsStream(s"/graft/schemas/$name.json")
      require(in != null, s"bundled schema resource missing: $name.json")
      val dst = dir.resolve(s"$name.json")
      try Files.copy(in, dst) finally in.close()
      dst.toFile.deleteOnExit()
    }
    new SchemaManager(dir.toString)
  }

  lazy val nda: SchemaExtract.FormSchema =
    manager.getSchema("NDA_Form").getOrElse(sys.error("NDA_Form failed to load"))
  lazy val employment: SchemaExtract.FormSchema =
    manager.getSchema("Employment_Agreement").getOrElse(sys.error("Employment_Agreement failed to load"))
}

/** Directory-backed schema catalog — the reference `SchemaManager`
  * (schema/schema.py:21-63): loads every `*.json` in the schema directory at
  * construction (keyed by `form_name`, falling back to the file stem),
  * lists/gets by name, and `addSchema` both registers and persists to
  * `<dir>/<form_name>.json`. Unparseable files are skipped (schema.py:34
  * logs-and-continues), never fatal.
  */
final class SchemaManager(schemaDir: String) {
  import java.nio.file.{Files, Path, Paths}
  import scala.jdk.CollectionConverters._

  private val schemas = scala.collection.mutable.LinkedHashMap[String, SchemaExtract.FormSchema]()
  loadAll()

  private def loadAll(): Unit = {
    val dir = Paths.get(schemaDir)
    if (Files.isDirectory(dir)) {
      val listing = Files.list(dir)
      val files =
        try listing.iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".json")).sortBy(_.getFileName.toString)
        finally listing.close()
      files.foreach { p: Path =>
        try {
          val s = SchemaIO.fromJson(Files.readString(p))
          val name = if (s.formName == "Unknown")
            p.getFileName.toString.stripSuffix(".json") else s.formName
          schemas(name) = s.copy(formName = name)
        } catch { case _: Exception => () } // skip unparseable, like the reference
      }
    }
  }

  def getSchema(formName: String): Option[SchemaExtract.FormSchema] = schemas.get(formName)

  def listSchemas: Seq[String] = schemas.keys.toSeq

  /** Register + persist; false when the schema has no usable name. */
  def addSchema(schema: SchemaExtract.FormSchema): Boolean =
    if (schema.formName == null || schema.formName.isEmpty) false
    else {
      schemas(schema.formName) = schema
      try {
        Files.createDirectories(Paths.get(schemaDir))
        SchemaIO.save(schema, s"$schemaDir/${schema.formName}.json")
        true
      } catch { case _: Exception => false }
    }
}
