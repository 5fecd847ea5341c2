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

  /** Frame geometry for the frame-sampling operator: fixed-size frames over
    * the byte stream, every [[FrameStride]]-th frame kept, at most
    * [[MaxFrames]] samples per video.
    */
  val FrameBytes = 64L
  val FrameStride = 2L
  val MaxFrames = 8L

  /** `multimodal_frames`: frame sampling over the video payloads — the
    * video rung of the decode ladder. Each video's byte stream is treated
    * as fixed-[[FrameBytes]] frames; every [[FrameStride]]-th frame is
    * sampled (capped at [[MaxFrames]]) and sliced OUT OF THE BINARY column
    * (`substring` on binary — payload bytes never round-trip through
    * strings), with per-frame md5 and an md5-derived 16-bit brightness
    * standing in for the real pixel statistic (decode is stubbed — no
    * codecs in this container; the slicing/explode/metadata plumbing is the
    * real shape).
    *
    * Row growth is bounded (≤ MaxFrames per video), the explode is
    * per-row-local (no shuffle), and frame extraction prunes to the payload
    * column only. The oracle slices the same ranges out of the VARCHAR text
    * — the corpus is ASCII, so byte ranges ≡ char ranges, and md5 agrees.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    framesOf(mediaTable(spark, dir).filter(col("modality") === "video"))

  /** Frame sampling over any (doc_id, payload binary) frame source.
    * Zero-byte payloads yield no frames: without the `byte_len > 0` guard,
    * `sequence(0L, n_samp - 1)` with n_samp = 0 is the DESCENDING [0, -1]
    * sequence and would emit two bogus negative-offset rows (the DuckDB
    * oracle's generate_series(0, -1) is empty — an engine divergence).
    */
  def framesOf(videos: DataFrame): DataFrame =
    videos
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .filter(col("byte_len") > 0)
      .withColumn("n_total", expr(s"(byte_len + ${FrameBytes - 1}) div $FrameBytes"))
      .withColumn("n_samp",
        least(expr(s"(n_total + ${FrameStride - 1}) div $FrameStride"), lit(MaxFrames)))
      .withColumn("k", explode(expr("sequence(0L, n_samp - 1)")))
      .withColumn("frame_idx", col("k") * FrameStride)
      .withColumn("frame_off", col("frame_idx") * FrameBytes)
      .withColumn("frame_len", least(lit(FrameBytes), col("byte_len") - col("frame_off")))
      .withColumn("frame",
        expr("substring(payload, cast(frame_off + 1 as int), cast(frame_len as int))"))
      .withColumn("frame_md5", md5(col("frame")))
      .withColumn("brightness",
        expr("cast(conv(substr(md5(frame), 1, 4), 16, 10) as bigint)"))
      .select("doc_id", "frame_idx", "frame_off", "frame_len", "frame_md5", "brightness")
      .contractOrderBy("doc_id", "frame_idx")

  val multimodalFramesSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
       |  FROM documents WHERE doc_id % 3 = 2
       |), f AS (
       |  SELECT doc_id, text, byte_len,
       |    unnest(generate_series(0, least(((byte_len + ${FrameBytes - 1}) // $FrameBytes + ${FrameStride - 1}) // $FrameStride, $MaxFrames) - 1)) AS k
       |  FROM v
       |), g AS (
       |  SELECT doc_id, k * $FrameStride AS frame_idx, k * $FrameStride * $FrameBytes AS frame_off,
       |    least($FrameBytes, byte_len - k * $FrameStride * $FrameBytes) AS frame_len,
       |    substr(text, CAST(k * $FrameStride * $FrameBytes + 1 AS BIGINT),
       |           least($FrameBytes, byte_len - k * $FrameStride * $FrameBytes)) AS frame
       |  FROM f
       |)
       |SELECT doc_id, frame_idx, frame_off, frame_len, md5(frame) AS frame_md5,
       |  CAST(('0x' || substr(md5(frame), 1, 4)) AS BIGINT) AS brightness
       |FROM g
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize target: fit the longest side to [[ResizeFit]] px, never
    * upscale.
    */
  val ResizeFit = 256L

  /** `dedup_media`: media deduplication by CANONICAL content hash — the
    * Gopher-style image-dedup analog at cluster grain. Raw payload bytes
    * differ across crawls of the same asset (transport wrappers, EXIF
    * junk, re-encodes), so the dedup key is the canonical content: decode
    * the payload, strip the metadata junk, hash. On the synthetic corpus
    * the payload IS the doc text and the injected `dup` marker plays the
    * junk role, so canonicalization is [[Dedup.normText]] over the decoded
    * payload — while RAW payload md5 (`multimodal_features.content_md5`)
    * never collides here, proving the canonical step is what finds the
    * dups. Keyed per (modality, canonical hash): byte-identical payloads
    * of different media types never pair. Same-payload edges also feed the
    * unified dedup edge set as its `media` lane
    * ([[Dedup.mediaEdgesOf]] → [[Dedup.taggedPairsOf]]).
    *
    * Scale shape: one corpus scan → one map-side-combined aggregation on
    * the (modality, hash) key; members list is bounded by the group (the
    * act-step consumers join the star edges, never this debug list).
    */
  def dedupMedia(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("content_key", md5(Dedup.normText(col("payload").cast("string"))))
      .groupBy(col("modality"), col("content_key"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"),
        expr("array_join(transform(array_sort(collect_list(doc_id)), x -> cast(x as string)), ',')")
          .as("members"))
      .filter(col("n_docs") > 1)
      .contractOrderBy("modality", "content_key")

  val dedupMediaSql: String =
    s"""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
       |  md5(${Dedup.normTextSql}) AS content_key,
       |  count(*) AS n_docs, min(doc_id) AS canonical_doc,
       |  string_agg(doc_id, ',' ORDER BY doc_id) AS members
       |FROM documents
       |GROUP BY 1, 2 HAVING count(*) > 1
       |ORDER BY modality, content_key""".stripMargin

  /** `multimodal_resize`: the resize rung of the image ladder — compute the
    * aspect-preserving target geometry (fit longest side to [[ResizeFit]],
    * never upscale) for every image payload, all in exact integer math
    * (`w·fit div max(w,h)`), plus the projected decoded-RGB byte size the
    * resized image would occupy. The pixel transform itself belongs to the
    * stubbed decoder seam ([[decodeStub]]) — what the engine owns is the
    * metadata plan: a stateless codegen'd projection that never touches
    * payload bytes, so planning 100 TB of resizes reads only the metadata
    * columns.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("modality") === "image")
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("width", lit(64L) + col("byte_len") % 512)
      .withColumn("height", lit(64L) + (col("byte_len") * 7) % 512)
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("downscaled", col("long_side") > ResizeFit)
      .withColumn("new_width",
        when(col("downscaled"), expr(s"(width * $ResizeFit) div long_side"))
          .otherwise(col("width")))
      .withColumn("new_height",
        when(col("downscaled"), expr(s"(height * $ResizeFit) div long_side"))
          .otherwise(col("height")))
      .withColumn("resized_rgb_bytes", col("new_width") * col("new_height") * 3)
      .select("doc_id", "width", "height", "new_width", "new_height",
        "downscaled", "resized_rgb_bytes")
      .contractOrderBy("doc_id")

  val multimodalResizeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
       |  FROM documents WHERE doc_id % 3 = 0
       |), g AS (
       |  SELECT doc_id, 64 + byte_len % 512 AS width, 64 + (byte_len * 7) % 512 AS height
       |  FROM m
       |), s AS (
       |  SELECT doc_id, width, height, greatest(width, height) AS long_side,
       |    greatest(width, height) > $ResizeFit AS downscaled
       |  FROM g
       |)
       |SELECT doc_id, width, height,
       |  CASE WHEN downscaled THEN (width * $ResizeFit) // long_side ELSE width END AS new_width,
       |  CASE WHEN downscaled THEN (height * $ResizeFit) // long_side ELSE height END AS new_height,
       |  downscaled,
       |  (CASE WHEN downscaled THEN (width * $ResizeFit) // long_side ELSE width END) *
       |  (CASE WHEN downscaled THEN (height * $ResizeFit) // long_side ELSE height END) * 3 AS resized_rgb_bytes
       |FROM s
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

  /** REAL image decode over the JDK's bundled codecs (PNG/JPEG/GIF/BMP via
    * `javax.imageio` — zero external dependencies), proving the
    * [[MediaDecoder]] seam with an actual codec: true width/height come out
    * of the pixel data, not the byte length. Non-image modalities and
    * undecodable payloads fall back to [[StubDecoder]] (production policy
    * would route failures to a quarantine column instead).
    *
    * The synthetic corpus carries text bytes, so the oracle-checked
    * `multimodal_*` queries keep the stub; the spec drives in-test-encoded
    * PNGs through [[decodeMedia]]'s partition iterator and asserts the true
    * geometry round-trips.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], modality: String): (Long, Long, Double) =
      if (modality == "image") {
        // never spill decode scratch to disk tmp files on executors
        javax.imageio.ImageIO.setUseCache(false)
        // NonFatal, not just IOException: JDK image codecs throw runtime
        // exceptions (ArrayIndexOutOfBounds, IllegalArgument) on malformed
        // payloads — quarantine policy means ANY decode failure falls back
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) StubDecoder.decode(payload, modality)
        else (img.getWidth.toLong, img.getHeight.toLong, 0.0)
      } else StubDecoder.decode(payload, modality)
  }

  /** REAL audio decode over the JDK's bundled `javax.sound.sampled`
    * (WAV/AIFF/AU — zero external dependencies): true duration comes out of
    * the frame count ÷ frame rate in the container header, proving the
    * audio rung of the [[MediaDecoder]] seam the same way [[ImageIoDecoder]]
    * proves the image rung. Non-audio modalities and undecodable payloads
    * fall back to [[StubDecoder]].
    */
  object AudioWavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], modality: String): (Long, Long, Double) =
      if (modality == "audio") {
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = in.getFormat
            val frames = in.getFrameLength
            if (frames >= 0 && fmt.getFrameRate > 0)
              (0L, 0L, math.round(frames / fmt.getFrameRate.toDouble * 1e6) / 1e6)
            else StubDecoder.decode(payload, modality)
          } finally in.close()
        } catch {
          // NonFatal (not just the two declared exceptions): malformed
          // containers can surface runtime exceptions from header parsing
          case scala.util.control.NonFatal(_) => StubDecoder.decode(payload, modality)
        }
      } else StubDecoder.decode(payload, modality)
  }

  /** Per-partition batch decode (mapInPandas analog) over any
    * (doc_id, modality, payload binary) relation: the real plumbing — one
    * decoder instance per partition, iterator in / iterator out.
    */
  def decodeMedia(media: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media
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

  /** [[decodeMedia]] over the synthetic corpus (driver-contract shape). */
  def decodeStub(spark: SparkSession, dir: String,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] =
    decodeMedia(mediaTable(spark, dir), decoder)
}
