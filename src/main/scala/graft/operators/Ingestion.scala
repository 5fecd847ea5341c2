package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-scale ingestion (SURVEY §2B) — the Spark re-expression of the
  * reference's PDF ingestion stage (`ingestion/ingestion.py`).
  *
  * The reference turns ONE pdf into `DocumentBlock{page,text,bbox,confidence,
  * source}` rows with an OCR fallback keyed on text volume
  * (ingestion.py:90 `text_volume < ocr_threshold`). Here the same block
  * model is derived for every document in the corpus as narrow, fully
  * codegen'd column expressions — no UDFs, so 100 TB of documents stream
  * through WholeStageCodegen with nothing but a parquet scan + project.
  */
object Ingestion {

  /** Words per synthetic block (the reference blocks are pymupdf text blocks;
    * we chunk the corpus text deterministically).
    */
  val BlockWords = 20

  /** Blocks per synthetic page (used for page ids + synthetic bboxes). */
  val BlocksPerPage = 5

  /** OCR routing threshold on characters (ingestion.py ocr_threshold). */
  val OcrThreshold = 200

  /** documents → one row per block: (doc_id, block_id, page, block_text,
    * n_words, n_chars, source, confidence).
    * Shared base for layout/clause-graph operators.
    */
  def blocks(spark: SparkSession, dir: String): DataFrame =
    blocksOf(Tables.documents(spark, dir))

  /** [[blocks]] over any (doc_id, text, source) relation — the seam
    * schema-scoped extraction runs planted-clause document variants
    * through.
    */
  private[operators] def blocksOf(docs: DataFrame): DataFrame = {
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("block_id",
        explode(expr(s"sequence(0, cast(ceil(size(ws) / $BlockWords.0) as int) - 1)")))
      .withColumn("block_words", expr(s"slice(ws, block_id * $BlockWords + 1, $BlockWords)"))
      .withColumn("block_text", array_join(col("block_words"), " "))
      .withColumn("block_chars", length(col("block_text")).cast("long"))
      .select(
        col("doc_id"),
        col("block_id").cast("long").as("block_id"),
        floor(col("block_id") / lit(BlocksPerPage.toDouble)).cast("long").as("page"),
        col("block_text"),
        size(col("block_words")).cast("long").as("n_words"),
        col("block_chars").as("n_chars"),
        col("source"),
        when(col("block_chars") < OcrThreshold, lit(0.8)).otherwise(lit(1.0)).as("confidence"))
  }

  /** `ingest_blocks` query: deterministic block rows, totally ordered. */
  def ingestBlocks(spark: SparkSession, dir: String): DataFrame =
    blocks(spark, dir).contractOrderBy("doc_id", "block_id")

  val ingestBlocksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, n_chars AS doc_chars, string_split(text, ' ') AS ws FROM documents
       |), b AS (
       |  SELECT doc_id, source, doc_chars, ws,
       |    unnest(generate_series(1, CAST(ceil(len(ws) / $BlockWords.0) AS INT))) AS i
       |  FROM d
       |)
       |SELECT doc_id, CAST(i - 1 AS BIGINT) AS block_id,
       |  CAST(floor((i - 1) / $BlocksPerPage.0) AS BIGINT) AS page,
       |  array_to_string(ws[(i-1)*$BlockWords+1 : i*$BlockWords], ' ') AS block_text,
       |  CAST(len(ws[(i-1)*$BlockWords+1 : i*$BlockWords]) AS BIGINT) AS n_words,
       |  CAST(length(array_to_string(ws[(i-1)*$BlockWords+1 : i*$BlockWords], ' ')) AS BIGINT) AS n_chars,
       |  source,
       |  CAST(CASE WHEN length(array_to_string(ws[(i-1)*$BlockWords+1 : i*$BlockWords], ' ')) < $OcrThreshold
       |       THEN 0.8 ELSE 1.0 END AS DOUBLE) AS confidence
       |FROM b
       |ORDER BY doc_id, block_id""".stripMargin

  /** `ocr_route`: the native-vs-OCR routing decision (ingestion.py:90),
    * aggregated per (source, route) so the operator result stays compact at
    * any corpus size.
    */
  def ocrRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("route", when(col("n_chars") < OcrThreshold, lit("ocr")).otherwise(lit("native")))
      .groupBy(col("source"), col("route"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"))
      .contractOrderBy("source", "route")

  val ocrRouteSql: String =
    s"""SELECT source,
       |  CASE WHEN n_chars < $OcrThreshold THEN 'ocr' ELSE 'native' END AS route,
       |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_chars
       |FROM documents
       |GROUP BY source, CASE WHEN n_chars < $OcrThreshold THEN 'ocr' ELSE 'native' END
       |ORDER BY source, route""".stripMargin

  /** `tokenize_words`: document → (word_idx, word) rows
    * (layout_structure.py:85 `text.split()`).
    */
  def tokenizeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("word_idx", "word")))
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        col("word"), length(col("word")).cast("long").as("word_len"))
      .contractOrderBy("doc_id", "word_idx")

  val tokenizeWordsSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |  CAST(unnest(generate_series(1, len(ws))) - 1 AS BIGINT) AS word_idx,
      |  unnest(ws) AS word,
      |  CAST(length(unnest(ws)) AS BIGINT) AS word_len
      |FROM d
      |ORDER BY doc_id, word_idx""".stripMargin

  // Synthetic page geometry for bbox derivation (US-letter points).
  val PageW = 612
  val PageH = 792

  /** `bbox_normalize`: synthetic per-block line bbox → LayoutLM 1000×1000
    * normalized ints (layout_structure.py:113 `_normalize_bbox`; the
    * reference truncates via python `int()` → floor here, in both engines).
    */
  def bboxNormalize(spark: SparkSession, dir: String): DataFrame = {
    val b = blocks(spark, dir)
    val x0 = lit(72L)
    val x1 = lit(PageW - 72L)
    val y0 = (lit(72L) + (col("block_id") % BlocksPerPage) * 130L)
    val y1 = y0 + 120L
    def norm(c: Column, dim: Int): Column = floor(c * 1000.0 / dim).cast("long")
    b.select(col("doc_id"), col("block_id"),
        x0.cast("long").as("x0"), y0.cast("long").as("y0"),
        x1.cast("long").as("x1"), y1.cast("long").as("y1"),
        norm(x0, PageW).as("nx0"), norm(y0, PageH).as("ny0"),
        norm(x1, PageW).as("nx1"), norm(y1, PageH).as("ny1"))
      .contractOrderBy("doc_id", "block_id")
  }

  val bboxNormalizeSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |b AS (
       |  SELECT doc_id, CAST(unnest(generate_series(1, CAST(ceil(len(ws) / $BlockWords.0) AS INT))) - 1 AS BIGINT) AS block_id
       |  FROM d
       |), g AS (
       |  SELECT doc_id, block_id,
       |    CAST(72 AS BIGINT) AS x0,
       |    CAST(72 + (block_id % $BlocksPerPage) * 130 AS BIGINT) AS y0,
       |    CAST(${PageW - 72} AS BIGINT) AS x1,
       |    CAST(72 + (block_id % $BlocksPerPage) * 130 + 120 AS BIGINT) AS y1
       |  FROM b
       |)
       |SELECT doc_id, block_id, x0, y0, x1, y1,
       |  CAST(floor(x0 * 1000.0 / $PageW) AS BIGINT) AS nx0,
       |  CAST(floor(y0 * 1000.0 / $PageH) AS BIGINT) AS ny0,
       |  CAST(floor(x1 * 1000.0 / $PageW) AS BIGINT) AS nx1,
       |  CAST(floor(y1 * 1000.0 / $PageH) AS BIGINT) AS ny1
       |FROM g
       |ORDER BY doc_id, block_id""".stripMargin

  // ---- real PDF container parse (ingestion.py's fitz rung) -----------------

  /** One extracted PDF text block: page = content-stream index, (x, y) =
    * the BT..ET text object's first positioning operator — the
    * `DocumentBlock{page, text, bbox}` shape (ingestion.py:30) off a real
    * container.
    */
  final case class PdfBlock(page: Int, text: String, x: Double, y: Double)

  /** REAL PDF text extraction over raw bytes — pure JVM, zero external
    * dependencies, the container-parse rung of the reference's ingestion
    * (ingestion.py parses PDFs via fitz, falling back to OCR at
    * ingestion.py:90 when extracted text volume is low; this decoder
    * proves the same rung on the actual PDF wire format, the
    * [[Multimodal.ImageIoDecoder]] discipline applied to documents):
    *
    *   - content streams are taken in document order (page order for the
    *     linear PDFs a generator writes; real-world /Pages-tree
    *     resolution is a library's job and out of scope),
    *   - `/FlateDecode` streams inflate via `java.util.zip` (what real
    *     word-processor PDFs ship); raw streams parse as-is,
    *   - inside each BT..ET text object, show operators `Tj`/`'`/`"` and
    *     `TJ` arrays contribute text (parenthesis escapes `\(`/`\)`/`\\`
    *     and octal `\ddd` unescaped); the object's first `Td`/`TD`/`Tm`
    *     supplies the block origin,
    *   - ANY malformed stream contributes zero blocks (quarantine
    *     policy, never a throw) — a scanned/image-only PDF extracts no
    *     text and `ocr_route`'s text-volume threshold then routes it to
    *     OCR exactly as the reference does.
    */
  object PdfTextDecoder {
    private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

    def blocks(bytes: Array[Byte]): Seq[PdfBlock] =
      try blocksUnsafe(bytes)
      catch { case scala.util.control.NonFatal(_) => Nil }

    private def blocksUnsafe(bytes: Array[Byte]): Seq[PdfBlock] = {
      val s = new String(bytes, Latin1) // 1:1 byte↔char, offsets stay valid
      if (!s.startsWith("%PDF-")) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[PdfBlock]
      var from = 0
      var page = 0
      while (from < s.length) {
        val kw = s.indexOf("stream", from)
        if (kw < 0) return out.toSeq
        // skip the "endstream" keyword's own "stream" suffix
        if (kw >= 3 && s.regionMatches(kw - 3, "end", 0, 3)) { from = kw + 6 }
        else {
          var start = kw + 6
          if (start < s.length && s.charAt(start) == '\r') start += 1
          if (start < s.length && s.charAt(start) == '\n') start += 1
          val end = s.indexOf("endstream", start)
          if (end < 0) return out.toSeq
          // the owning object's dict sits between the previous "obj" and
          // the stream keyword — enough context to read the filter
          val dictFrom = math.max(math.max(s.lastIndexOf("obj", kw) + 3, 0), from)
          val dict = s.substring(dictFrom, kw)
          val raw = bytes.slice(start, end)
          val content: Option[String] =
            if (dict.contains("/FlateDecode")) inflate(raw).map(new String(_, Latin1))
            else Some(new String(raw, Latin1))
          content.foreach { c =>
            val before = out.length
            parseContent(c, page, out)
            if (out.length > before) page += 1 // only text-bearing streams count as pages
          }
          from = end + 9
        }
      }
      out.toSeq
    }

    // Untrusted input: a stream needing a preset dictionary (FDICT) makes
    // Inflater return 0 forever without being finished, and a deflate bomb
    // can expand a few KB into GBs — both must quarantine, not hang/OOM.
    private val MaxInflateRatio = 64L
    private val MinInflateCap = 1L << 20

    private def inflate(raw: Array[Byte]): Option[Array[Byte]] =
      try {
        val cap = math.max(raw.length.toLong * MaxInflateRatio, MinInflateCap)
        val inf = new java.util.zip.Inflater()
        inf.setInput(raw)
        val buf = new java.io.ByteArrayOutputStream(raw.length * 4)
        val chunk = new Array[Byte](8192)
        var stalled = false
        var bombed = false
        while (!inf.finished() && !stalled && !bombed) {
          val n = inf.inflate(chunk)
          if (n > 0) {
            buf.write(chunk, 0, n)
            if (buf.size().toLong > cap) bombed = true
          } else if (inf.needsDictionary() || inf.needsInput() || n == 0) {
            // FDICT streams and truncated input both report "no progress";
            // either way there is nothing more we can decode.
            stalled = true
          }
        }
        inf.end()
        if (bombed || buf.size() == 0) None else Some(buf.toByteArray)
      } catch { case scala.util.control.NonFatal(_) => None }

    private val TdRe = """(-?[0-9.]+)\s+(-?[0-9.]+)\s+(?:Td|TD)""".r
    private val TmRe = ("""(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+""" +
      """(-?[0-9.]+)\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+Tm""").r
    // a literal string: parens with \-escapes honored
    private val StrRe = """\(((?:\\.|[^\\()])*)\)""".r

    private def unescape(v: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < v.length) {
        val c = v.charAt(i)
        if (c == '\\' && i + 1 < v.length) {
          val n = v.charAt(i + 1)
          if (n >= '0' && n <= '7') {
            val oct = v.substring(i + 1, math.min(i + 4, v.length)).takeWhile(d => d >= '0' && d <= '7')
            b.append(Integer.parseInt(oct, 8).toChar); i += 1 + oct.length
          } else {
            b.append(n match {
              case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'; case o => o
            }); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }

    private def parseContent(c: String, page: Int,
        out: scala.collection.mutable.ArrayBuffer[PdfBlock]): Unit = {
      var i = c.indexOf("BT")
      while (i >= 0) {
        val e = c.indexOf("ET", i + 2)
        val body = if (e < 0) c.substring(i + 2) else c.substring(i + 2, e)
        val (x, y) = TdRe.findFirstMatchIn(body)
          .map(m => (m.group(1).toDouble, m.group(2).toDouble))
          .orElse(TmRe.findFirstMatchIn(body)
            .map(m => (m.group(5).toDouble, m.group(6).toDouble)))
          .getOrElse((0.0, 0.0))
        // shows in order: every literal string followed by a show operator
        // (Tj / ' / ") or sitting inside a [...] TJ array
        val shows = scala.collection.mutable.ArrayBuffer.empty[String]
        for (m <- StrRe.findAllMatchIn(body)) {
          val after = body.substring(m.end).dropWhile(_.isWhitespace)
          val inTjArray = {
            val nextClose = body.indexOf(']', m.end)
            nextClose >= 0 && body.substring(nextClose + 1).dropWhile(_.isWhitespace).startsWith("TJ") &&
              body.lastIndexOf('[', m.start) > body.lastIndexOf(']', m.start)
          }
          if (after.startsWith("Tj") || after.startsWith("'") || after.startsWith("\"") || inTjArray)
            shows += unescape(m.group(1))
        }
        if (shows.nonEmpty) out += PdfBlock(page, shows.mkString(" "), x, y)
        i = if (e < 0) -1 else c.indexOf("BT", e + 2)
      }
    }
  }

  /** Per-partition batch PDF decode over any (doc_id, payload binary)
    * relation — the [[Multimodal.decodeMedia]] plumbing applied to
    * documents: one decoder per partition, iterator in / iterator out,
    * one output row per extracted block (docs with no extractable text
    * emit nothing — downstream `ocr_route` sees zero text volume and
    * routes them to OCR).
    */
  def decodePdfBlocks(pdfs: DataFrame): DataFrame = {
    import pdfs.sparkSession.implicits._
    pdfs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          PdfTextDecoder.blocks(payload).zipWithIndex.map { case (b, i) =>
            (id, i.toLong, b.page.toLong, b.text,
              b.text.split(" ").count(_.nonEmpty).toLong,
              b.text.length.toLong, b.x, b.y)
          }
        }
      }
      .toDF("doc_id", "block_id", "page", "block_text", "n_words", "n_chars",
        "x", "y")
  }
}
