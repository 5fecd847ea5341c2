package graft

import graft.operators.GlyphOcr
import graft.operators.Ingestion.PdfTextDecoder

/** The OCR rung: page bitmaps rendered from the fixed glyph atlas decode
  * back through the real PNG codec + Spark plumbing to the exact text —
  * including text the NATIVE PDF path missed (an image-only PDF extracts
  * zero blocks, `ocr_route`'s threshold sends it here) — while malformed
  * bitmaps quarantine to zero rows instead of emitting garbage.
  */
class OcrSpec extends SparkSpec {

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image-only page → blocks: the rung recovers text the native path missed") {
    // the native front door gets an image-only PDF: a real container whose
    // only stream is a (fake) image XObject — NO text objects anywhere
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Length 8 >>\n" +
      "stream\n\nendstream\nendobj\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfTextDecoder.blocks(pdf).isEmpty,
      "native path must come up empty on an image-only document")

    // …so the doc routes to OCR with its scanned page bitmaps
    val page0 = Seq("HELLO WORLD", "FORM 1042")
    val page1 = Seq("TOTAL DUE 99")
    import spark.implicits._
    val pages = Seq(
      (7L, 0L, png(GlyphOcr.renderPage(page0))),
      (7L, 1L, png(GlyphOcr.renderPage(page1))))
      .toDF("doc_id", "page", "payload")
    val got = GlyphOcr.ocrBlocks(pages)
      .orderBy("page", "block_id").collect()
      .map(r => (r.getLong(2), r.getString(3), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      (0L, "HELLO WORLD", 4.0, 4.0),
      (0L, "FORM 1042", 4.0, 12.0),
      (1L, "TOTAL DUE 99", 4.0, 4.0)), got.mkString(", "))
    // schema composes with the native rung's block stream
    assert(GlyphOcr.ocrBlocks(pages).columns.toSeq == Seq(
      "doc_id", "block_id", "page", "block_text", "n_words", "n_chars", "x", "y"))
  }

  test("frontDoorBlocks: native text wins; only natively-missed docs route through OCR") {
    import spark.implicits._
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    // doc 1: a real linear PDF WITH a text layer — must take the native
    // rung, and its (decoy) bitmap must NOT also be OCR'd
    val textPdf = ("%PDF-1.4\n1 0 obj\n<< /Length 30 >>\nstream\n" +
      "BT 72 700 Td (NATIVE TEXT) Tj ET\nendstream\nendobj\n").getBytes(latin1)
    // doc 2: image-only — zero native blocks, routes to OCR
    val scanPdf = ("%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Length 8 >>\n" +
      "stream\n\nendstream\nendobj\n").getBytes(latin1)
    val pdfs = Seq((1L, textPdf), (2L, scanPdf)).toDF("doc_id", "payload")
    val bitmaps = Seq(
      (1L, 0L, png(GlyphOcr.renderPage(Seq("DECOY")))),
      (2L, 0L, png(GlyphOcr.renderPage(Seq("SCANNED ONLY")))))
      .toDF("doc_id", "page", "payload")
    val got = GlyphOcr.frontDoorBlocks(pdfs, bitmaps)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "NATIVE TEXT"), (2L, "SCANNED ONLY")),
      got.mkString(", "))
  }

  test("malformed bitmaps quarantine to zero rows, never garbage text") {
    import spark.implicits._
    val good = GlyphOcr.renderPage(Seq("OK"))
    // a stray ink pixel in the padding gutter: not a rendered page
    val smudged = GlyphOcr.renderPage(Seq("OK"))
    smudged.setRGB(GlyphOcr.MarginX + GlyphOcr.CellW, GlyphOcr.MarginY, 0x000000)
    // a glyph cell matching no atlas template: one pixel flipped inside
    val mutated = GlyphOcr.renderPage(Seq("OK"))
    mutated.setRGB(GlyphOcr.MarginX, GlyphOcr.MarginY,
      (mutated.getRGB(GlyphOcr.MarginX, GlyphOcr.MarginY) & 0xFFFFFF) ^ 0xFFFFFF)
    // off-grid dimensions: a real PNG that is not a glyph grid
    val offGrid = new java.awt.image.BufferedImage(
      13, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pages = Seq(
      (1L, 0L, png(good)),
      (2L, 0L, "not a png at all".getBytes("UTF-8")),
      (3L, 0L, png(smudged)),
      (4L, 0L, png(mutated)),
      (5L, 0L, png(offGrid)))
      .toDF("doc_id", "page", "payload")
    val got = GlyphOcr.ocrBlocks(pages).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L &&
      got.head.getString(3) == "OK", got.mkString(", "))
  }
}
