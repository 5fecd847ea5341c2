package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing (SURVEY §2C).
  *
  * Design: image/audio/video payloads are opaque `binary` columns with a
  * typed metadata struct alongside — the Spark-native shape for multimodal
  * corpora (payload stays columnar, metadata prunes/filters without
  * touching bytes). Decode / feature-extraction runs as a per-partition
  * batch pipeline ([[decodeStub]]) — the Scala analog of `mapInPandas`:
  * one iterator per partition, batch-shaped, no per-row JVM↔native hops.
  *
  * NOTE: no image/audio codecs ship in this container, so the actual decode
  * is a clearly-marked deterministic STUB (dimensions derived from byte
  * length). The Spark-side plumbing — schema, partitioning, batch iterator
  * signature — is real and spec-tested; swap [[StubDecoder]] for a JNI/
  * native decoder in production.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long, modality: String, byte_len: Long, content_md5: String,
      width: Long, height: Long, duration: Double)

  /** Corpus as multimodal rows: payload binary + modality tag. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("modality",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))

  /** `multimodal_features`: typed metadata extracted per payload — the
    * oracle-checked face of the decode pipeline (metadata math only; the
    * byte-level decode itself is the stub below).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      // STUB decode: deterministic fake dimensions from byte length.
      .withColumn("width",
        when(col("modality") === "image", lit(64L) + col("byte_len") % 512).otherwise(lit(0L)))
      .withColumn("height",
        when(col("modality") === "image", lit(64L) + (col("byte_len") * 7) % 512).otherwise(lit(0L)))
      .withColumn("duration",
        when(col("modality").isin("audio", "video"),
          round(col("byte_len").cast("double") / 16000.0, 6)).otherwise(lit(0.0)))
      .select("doc_id", "modality", "byte_len", "content_md5", "width", "height", "duration")
      .contractOrderBy("doc_id")

  val multimodalFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |    md5(text) AS content_md5
      |  FROM documents
      |)
      |SELECT doc_id, modality, byte_len, content_md5,
      |  CASE WHEN modality = 'image' THEN 64 + byte_len % 512 ELSE 0 END AS width,
      |  CASE WHEN modality = 'image' THEN 64 + (byte_len * 7) % 512 ELSE 0 END AS height,
      |  CASE WHEN modality IN ('audio','video') THEN round(CAST(byte_len AS DOUBLE) / 16000.0, 6) ELSE 0.0 END AS duration
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** The batch decoder seam. Production would JNI into a codec here; the
    * stub derives deterministic features so the plumbing is testable.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], modality: String): (Long, Long, Double)
  }

  /** STUB — replace with a real codec; see object Scaladoc. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], modality: String): (Long, Long, Double) = {
      val n = payload.length.toLong
      modality match {
        case "image" => (64L + n % 512, 64L + (n * 7) % 512, 0.0)
        case _       => (0L, 0L, math.round(n / 16000.0 * 1e6) / 1e6)
      }
    }
  }

  /** Per-partition batch decode (mapInPandas analog): the real plumbing —
    * one decoder instance per partition, iterator in / iterator out.
    */
  def decodeStub(spark: SparkSession, dir: String,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, payload) =>
          val (w, h, dur) = decoder.decode(payload, modality)
          val md5hex = java.security.MessageDigest.getInstance("MD5")
            .digest(payload).map("%02x".format(_)).mkString
          MediaMeta(id, modality, payload.length.toLong, md5hex, w, h, dur)
        }
      }
  }
}
