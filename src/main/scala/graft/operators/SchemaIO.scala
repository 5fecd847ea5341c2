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
        default = Option(f.get("default")).filter(!_.isNull).map(_.asText))
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
