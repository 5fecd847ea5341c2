package graft

import graft.operators.Ingestion
import graft.operators.Ingestion.{PdfBlock, PdfTextDecoder}

/** Real PDF container parse (the reference's fitz rung, ingestion.py):
  * handcrafted PDFs — raw and FlateDecode-compressed — must extract their
  * text objects with positions; malformed/extractless payloads must yield
  * zero blocks (the quarantine policy that hands them to the OCR route),
  * and the Spark plumbing must carry blocks per doc through mapPartitions.
  */
class PdfIngestSpec extends SparkSpec {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def rawPdf: Array[Byte] =
    ("""%PDF-1.4
      |1 0 obj
      |<< /Length 90 >>
      |stream
      |BT /F1 12 Tf 72 720 Td (Hello \(world\) \101) Tj ET
      |BT 72 700 Td [(Fu) -20 (sion)] TJ ET
      |endstream
      |endobj
      |2 0 obj
      |<< /Length 44 >>
      |stream
      |BT 1 0 0 1 50 650 Tm (Page two) Tj ET
      |endstream
      |endobj
      |%%EOF
      |""".stripMargin).getBytes(Latin1)

  private def flatePdf: Array[Byte] = {
    val content = "BT 72 720 Td (Compressed text here) Tj ET".getBytes(Latin1)
    val d = new java.util.zip.Deflater()
    d.setInput(content); d.finish()
    val buf = new Array[Byte](4096)
    val n = d.deflate(buf)
    d.end()
    val head = s"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length $n >>\nstream\n"
      .getBytes(Latin1)
    val tail = "\nendstream\nendobj\n%%EOF\n".getBytes(Latin1)
    head ++ buf.take(n) ++ tail
  }

  test("raw PDF: text objects extract with positions, escapes, TJ arrays; streams page in order") {
    val blocks = PdfTextDecoder.blocks(rawPdf)
    assert(blocks == Seq(
      PdfBlock(0, "Hello (world) A", 72.0, 720.0),
      PdfBlock(0, "Fu sion", 72.0, 700.0),
      PdfBlock(1, "Page two", 50.0, 650.0)), blocks.toString)
  }

  test("FlateDecode stream inflates and extracts; corrupt and extractless payloads yield zero blocks") {
    assert(PdfTextDecoder.blocks(flatePdf) ==
      Seq(PdfBlock(0, "Compressed text here", 72.0, 720.0)))
    // corrupt flate body → quarantined (no throw, no blocks)
    val corrupt = flatePdf.clone()
    val kw = new String(corrupt, Latin1).indexOf("stream\n") + 7
    corrupt(kw) = 0x7f.toByte; corrupt(kw + 1) = 0x7f.toByte
    assert(PdfTextDecoder.blocks(corrupt).isEmpty)
    // not a PDF at all
    assert(PdfTextDecoder.blocks("just some text".getBytes(Latin1)).isEmpty)
    // a PDF whose only stream carries no text operators (image-only scan):
    // zero text volume — exactly what ocr_route sends to OCR
    val imageOnly =
      "%PDF-1.4\n1 0 obj\n<< /Length 9 >>\nstream\nBI ID EI\nendstream\nendobj\n%%EOF\n"
        .getBytes(Latin1)
    assert(PdfTextDecoder.blocks(imageOnly).isEmpty)
  }

  test("adversarial flate: FDICT stream terminates (no hang) and a deflate bomb caps out — both quarantine") {
    // zlib header with the FDICT (preset dictionary) bit set: Inflater
    // reports needsDictionary and makes no progress forever — the decoder
    // must bail, not spin the executor
    val fdictBody = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0, 0, 0)
    val fdictPdf =
      (s"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length ${fdictBody.length} >>\nstream\n"
        .getBytes(Latin1)) ++ fdictBody ++ "\nendstream\nendobj\n%%EOF\n".getBytes(Latin1)
    assert(PdfTextDecoder.blocks(fdictPdf).isEmpty)
    // deflate bomb: ~32 MB of repeated text compresses ~1000:1; the
    // inflated size blows the 64×input cap → quarantined, never an OOM
    val bombText = ("BT 72 720 Td (boom) Tj ET " * (32 * 1024 * 1024 / 26)).getBytes(Latin1)
    val d = new java.util.zip.Deflater()
    d.setInput(bombText); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](65536)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    val bombBody = out.toByteArray
    assert(bombBody.length.toLong * 64 < bombText.length, "bomb must exceed the cap")
    val bombPdf =
      (s"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length ${bombBody.length} >>\nstream\n"
        .getBytes(Latin1)) ++ bombBody ++ "\nendstream\nendobj\n%%EOF\n".getBytes(Latin1)
    assert(PdfTextDecoder.blocks(bombPdf).isEmpty)
  }

  test("decodePdfBlocks: per-partition decode carries blocks per doc; extractless docs emit nothing") {
    import spark.implicits._
    val pdfs = Seq(
      (1L, rawPdf), (2L, flatePdf),
      (3L, "garbage".getBytes(Latin1))).toDF("doc_id", "payload")
    val out = Ingestion.decodePdfBlocks(pdfs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("block_id"),
        r.getAs[Long]("page"), r.getAs[String]("block_text"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"))).toSet
    assert(out == Set(
      (1L, 0L, 0L, "Hello (world) A", 3L, 15L),
      (1L, 1L, 0L, "Fu sion", 2L, 7L),
      (1L, 2L, 1L, "Page two", 2L, 8L),
      (2L, 0L, 0L, "Compressed text here", 3L, 20L)), out.toString)
  }
}
