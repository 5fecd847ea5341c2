package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The OCR rung of the ingestion front door, closed at the SEAM level the
  * way [[Ingestion.PdfTextDecoder]] closed the fitz rung (reference:
  * ingestion.py:90 routes a page to OCR when the native text layer is too
  * thin — `ocr_route`'s text-volume threshold is that routing decision at
  * corpus scale; this is the rung the routed pages land on).
  *
  * A production deployment swaps a real OCR engine into [[ocrBlocks]]'s
  * per-partition decode (the [[Multimodal.MediaDecoder]] argument applies:
  * the engine is a codec behind an iterator-in/iterator-out seam). The
  * container has no OCR or font libraries, so the ENGINE here is exact
  * template matching over a fixed deterministic glyph atlas — the decode
  * step a matrix-font OCR actually performs, with the atlas standing in
  * for a trained classifier: the spec RENDERS page bitmaps from the same
  * atlas ([[renderPage]]), pushes real PNG bytes through the real
  * `javax.imageio` decode and the real Spark plumbing, and asserts the
  * text round-trips — and that the text the NATIVE path missed (an
  * image-only PDF extracts zero blocks) is recovered here.
  *
  * Everything around the glyph classifier is the production shape:
  *   - pixels in, [[Ingestion.PdfBlock]]-shaped rows out — the same
  *     (doc_id, block_id, page, block_text, n_words, n_chars, x, y)
  *     schema as [[Ingestion.decodePdfBlocks]], so downstream block
  *     consumers cannot tell which rung produced a block;
  *   - per-partition batch decode (one decoder per partition, iterator
  *     in / iterator out — the mapInPandas shape);
  *   - QUARANTINE policy, never a throw: undecodable payloads, bitmaps
  *     whose geometry is not a glyph grid, and cells matching no atlas
  *     glyph all contribute zero rows — the page stays on the failed-OCR
  *     list instead of emitting garbage text.
  */
object GlyphOcr {

  /** Glyph cell geometry: 5×7 pixel glyphs on a padded grid. */
  val CellW = 5
  val CellH = 7
  val HPad = 1
  val VPad = 1
  val MarginX = 4
  val MarginY = 4

  /** The atlas alphabet: upper-case letters, digits, space. */
  val Alphabet: String = (('A' to 'Z') ++ ('0' to '9')).mkString + " "

  /** The fixed atlas: 35 pixel bits per glyph, packed LSB-first row-major
    * into a Long. Patterns are DERIVED deterministically (xorshift of the
    * char code) rather than hand-drawn — the atlas is a stand-in for a
    * trained glyph classifier, and the only properties the template-match
    * seam needs are the ones `require`d at init: every glyph distinct and
    * non-blank (space is the all-zero cell). A real matrix font slots in
    * by replacing this map.
    */
  private[operators] val patterns: Map[Char, Long] = {
    def bits(c: Char): Long = {
      var x = c.toLong * 0x9E3779B97F4A7C15L + 1L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val b = x & ((1L << 35) - 1)
      if (b == 0L) 1L else b
    }
    val m = Alphabet.dropRight(1).map(c => c -> bits(c)).toMap + (' ' -> 0L)
    require(m.values.toSet.size == m.size,
      "glyph atlas degenerate: two characters share a template")
    m
  }

  private val reverse: Map[Long, Char] = patterns.map(_.swap)

  /** Render lines of atlas text into a page bitmap — the SPEC-side half
    * of the seam (a real corpus arrives as scanned bitmaps; the spec has
    * to manufacture them). Characters outside the alphabet are the
    * caller's error, loudly.
    */
  def renderPage(lines: Seq[String]): java.awt.image.BufferedImage = {
    require(lines.nonEmpty && lines.forall(_.nonEmpty), "empty page")
    lines.foreach(l => require(l.forall(patterns.contains),
      s"characters outside the OCR alphabet: $l"))
    val cols = lines.map(_.length).max
    val w = MarginX * 2 + cols * (CellW + HPad) - HPad
    val h = MarginY * 2 + lines.length * (CellH + VPad) - VPad
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0xFFFFFF)
    for ((line, row) <- lines.zipWithIndex; (ch, colIdx) <- line.zipWithIndex) {
      val p = patterns(ch)
      val ox = MarginX + colIdx * (CellW + HPad)
      val oy = MarginY + row * (CellH + VPad)
      for (i <- 0 until CellH * CellW)
        if (((p >> i) & 1L) == 1L)
          img.setRGB(ox + i % CellW, oy + i / CellW, 0x000000)
    }
    img
  }

  /** Decode one page bitmap by exact template match — `Some(lines)` of
    * (row, text, x, y) or `None` when the bitmap is not a well-formed
    * glyph grid (off-grid dimensions, a cell matching no glyph): the
    * quarantine signal. Blank lines are skipped; trailing in-line spaces
    * trimmed (grid padding, not content).
    */
  def decodePage(img: java.awt.image.BufferedImage): Option[Seq[(Int, String, Int, Int)]] = {
    val w = img.getWidth
    val h = img.getHeight
    val cols = (w - MarginX * 2 + HPad) / (CellW + HPad)
    val rows = (h - MarginY * 2 + VPad) / (CellH + VPad)
    if (cols <= 0 || rows <= 0 ||
        w != MarginX * 2 + cols * (CellW + HPad) - HPad ||
        h != MarginY * 2 + rows * (CellH + VPad) - VPad) return None
    // any ink outside the glyph grid (margins, padding gutters) is not a
    // rendered page — quarantine rather than silently dropping pixels
    def dark(x: Int, y: Int): Boolean = (img.getRGB(x, y) & 0xFFFFFF) < 0x808080
    val out = Seq.newBuilder[(Int, String, Int, Int)]
    var ok = true
    for (x <- 0 until w; y <- 0 until h if ok) {
      val cx = x - MarginX; val cy = y - MarginY
      val inGrid = cx >= 0 && cy >= 0 &&
        cx % (CellW + HPad) < CellW && cy % (CellH + VPad) < CellH &&
        cx / (CellW + HPad) < cols && cy / (CellH + VPad) < rows
      if (!inGrid && dark(x, y)) ok = false
    }
    var row = 0
    while (ok && row < rows) {
      val oy = MarginY + row * (CellH + VPad)
      val line = new StringBuilder
      var colIdx = 0
      while (ok && colIdx < cols) {
        val ox = MarginX + colIdx * (CellW + HPad)
        var cell = 0L
        for (i <- 0 until CellH * CellW)
          if (dark(ox + i % CellW, oy + i / CellW)) cell |= 1L << i
        reverse.get(cell) match {
          case Some(ch) => line.append(ch)
          case None => ok = false
        }
        colIdx += 1
      }
      val text = line.toString.reverse.dropWhile(_ == ' ').reverse
      if (ok && text.nonEmpty)
        out += ((row, text, MarginX, oy))
      row += 1
    }
    if (ok) Some(out.result()) else None
  }

  /** The composed two-rung front door (ingestion.py's native-then-OCR
    * ladder as ONE relation): native PDF text extraction for every doc,
    * then the OCR rung for exactly the docs the native path missed —
    * a LEFT ANTI join on the native block stream's doc ids (the
    * `ocr_route` routing decision, applied at block grain instead of a
    * report), unioned into one block table. Block-schema-stable, so a
    * downstream consumer never knows which rung fired. Scale shape: the
    * anti join is doc-grain on the natively-extracted id set (small
    * fraction of a scanned corpus), both rungs are per-partition batch
    * decodes, no corpus-grain shuffle beyond the one key anti-join.
    */
  def frontDoorBlocks(pdfs: DataFrame, pageBitmaps: DataFrame): DataFrame = {
    val native = Ingestion.decodePdfBlocks(pdfs)
    val missed = pageBitmaps.join(
      native.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    native.unionByName(ocrBlocks(missed))
  }

  /** Per-partition batch OCR over a (doc_id, page, payload binary)
    * relation of page bitmaps — the Spark half of the rung, schema-equal
    * to [[Ingestion.decodePdfBlocks]] so the two front doors compose:
    * route a doc's pages here when the native layer came up empty, union
    * the block streams. Undecodable or malformed pages emit nothing.
    */
  def ocrBlocks(pages: DataFrame): DataFrame = {
    import pages.sparkSession.implicits._
    pages.select(col("doc_id"), col("page"), col("payload"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, page, payload) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Nil
          else decodePage(img).getOrElse(Nil).map { case (rowIdx, text, x, y) =>
            (id, rowIdx.toLong, page, text,
              text.split(" ").count(_.nonEmpty).toLong,
              text.length.toLong, x.toDouble, y.toDouble)
          }
        }
      }
      .toDF("doc_id", "block_id", "page", "block_text", "n_words", "n_chars",
        "x", "y")
  }
}
