package graft

import graft.operators.Ingestion.{PdfBlock, PdfTextDecoder}

/** The structured PDF container path (r14): cross-reference resolution
  * (classic tables AND binary xref streams with PNG predictors),
  * incremental-update /Prev chains (newest definition wins), objects
  * packed in /ObjStm streams, and the /Pages tree walk — so `page` is
  * the TRUE page index regardless of where the writer put the objects.
  * A malformed xref quarantines to zero blocks; xref-less generator
  * output stays on the legacy linear scan.
  */
class PdfStructuredSpec extends SparkSpec {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Tiny PDF assembler tracking byte offsets per object number. */
  private final class Builder {
    private val buf = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def len: Int = buf.size()
    def raw(s: String): Unit = buf.write(s.getBytes(Latin1))
    def obj(num: Int, body: String): Unit = {
      offsets(num) = len
      raw(s"$num 0 obj\n$body\nendobj\n")
    }
    def streamObj(num: Int, dict: String, data: Array[Byte]): Unit = {
      offsets(num) = len
      raw(s"$num 0 obj\n<< $dict /Length ${data.length} >>\nstream\n")
      buf.write(data)
      raw("\nendstream\nendobj\n")
    }
    /** Classic xref table over `nums` + trailer + startxref + EOF. */
    def classicXref(nums: Seq[Int], trailer: String): Unit = {
      val xrefOff = len
      raw("xref\n0 1\n0000000000 65535 f \n")
      nums.sorted.foreach { n =>
        raw(f"$n 1\n${offsets(n)}%010d 00000 n \n")
      }
      raw(s"trailer\n$trailer\nstartxref\n$xrefOff\n%%%%EOF\n")
    }
    def bytes: Array[Byte] = buf.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  /** PNG Up-filter (type 2) encode, the common xref-stream predictor. */
  private def pngUpEncode(rows: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var prev: Array[Byte] = null
    rows.foreach { r =>
      out.write(2)
      for (i <- r.indices)
        out.write((r(i) - (if (prev == null) 0 else prev(i))) & 0xff)
      prev = r
    }
    out.toByteArray
  }

  private def content(text: String, y: Int): String =
    s"BT 72 $y Td ($text) Tj ET"

  test("classic xref + /Pages tree: shuffled object order still yields true page numbers") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    // objects deliberately OUT of document order: page 2's content first,
    // pages before catalog, page dicts interleaved
    b.streamObj(6, "", content("Second page", 700).getBytes(Latin1))
    b.obj(4, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [4 0 R 3 0 R] /Count 2 >>")
    b.streamObj(5, "/Filter /FlateDecode",
      deflate(content("First page", 720).getBytes(Latin1)))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 4, 5, 6), "<< /Size 7 /Root 1 0 R >>")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got == Seq(
      PdfBlock(0, "First page", 72.0, 720.0),
      PdfBlock(1, "Second page", 72.0, 700.0)), got.toString)
  }

  test("incremental update: a /Prev xref chain resolves the NEWEST revision of a replaced object") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(4, "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    b.streamObj(5, "", content("Original one", 720).getBytes(Latin1))
    b.streamObj(6, "", content("Original two", 700).getBytes(Latin1))
    val firstXref = b.len
    b.classicXref(Seq(1, 2, 3, 4, 5, 6), "<< /Size 7 /Root 1 0 R >>")
    // incremental update: page 2's content object REWRITTEN at the end of
    // the file; the new xref section covers only it and chains via /Prev
    b.streamObj(6, "", content("Amended two", 700).getBytes(Latin1))
    val secondXref = b.len
    b.raw(s"xref\n6 1\n${"%010d".format(b.offsets(6))} 00000 n \n" +
      s"trailer\n<< /Size 7 /Root 1 0 R /Prev $firstXref >>\n" +
      s"startxref\n$secondXref\n%%EOF\n")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got == Seq(
      PdfBlock(0, "Original one", 72.0, 720.0),
      PdfBlock(1, "Amended two", 72.0, 700.0)), got.toString)
  }

  test("xref STREAM (/W columns + PNG Up predictor) with /ObjStm-packed page tree extracts with true pages") {
    val b = new Builder
    b.raw("%PDF-1.5\n")
    // content streams are regular objects
    b.streamObj(6, "", content("Packed one", 720).getBytes(Latin1))
    b.streamObj(7, "/Filter /FlateDecode",
      deflate(content("Packed two", 700).getBytes(Latin1)))
    // catalog + pages + two page dicts live INSIDE an object stream
    val packed = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>")
    val bodies = packed.map(_._2)
    val offs = bodies.scanLeft(0)((acc, s) => acc + s.length + 1).init
    val header = packed.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val stmData = (header + bodies.mkString("\n") + "\n").getBytes(Latin1)
    b.streamObj(5, s"/Type /ObjStm /N 4 /First ${header.length}", stmData)
    // xref stream: W=[1 2 1]; objs 1..4 are type-2 (in ObjStm 5, idx i);
    // 5,6,7,8 are type-1 offsets; flate + PNG Up predictor over 4-byte rows
    val xrefOff = b.len
    def row(t: Int, f2: Int, f3: Int) =
      Array[Byte](t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte, f3.toByte)
    val rows = Seq(row(0, 0, 0)) ++
      (0 until 4).map(i => row(2, 5, i)) ++
      Seq(row(1, b.offsets(5), 0), row(1, b.offsets(6), 0),
        row(1, b.offsets(7), 0), row(1, xrefOff, 0))
    val xdata = deflate(pngUpEncode(rows))
    b.streamObj(8,
      "/Type /XRef /Size 9 /W [1 2 1] /Root 1 0 R " +
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>",
      xdata)
    b.raw(s"startxref\n$xrefOff\n%%EOF\n")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got == Seq(
      PdfBlock(0, "Packed one", 72.0, 720.0),
      PdfBlock(1, "Packed two", 72.0, 700.0)), got.toString)
  }

  test("malformed xref quarantines to zero blocks; xref-less output keeps the legacy linear scan") {
    // startxref pointing at garbage: structural damage → zero blocks
    val broken = ("%PDF-1.4\n1 0 obj\n<< /Length 28 >>\nstream\n" +
      "BT 72 720 Td (Hidden) Tj ET\nendstream\nendobj\n" +
      "startxref\n999999\n%%EOF\n").getBytes(Latin1)
    assert(PdfTextDecoder.blocks(broken).isEmpty)
    // startxref pointing mid-file at non-xref bytes
    val broken2 = ("%PDF-1.4\n1 0 obj\n<< /Length 28 >>\nstream\n" +
      "BT 72 720 Td (Hidden) Tj ET\nendstream\nendobj\nstartxref\n9\n%%EOF\n").getBytes(Latin1)
    assert(PdfTextDecoder.blocks(broken2).isEmpty)
    // no startxref at all: generator-style output, legacy path still reads
    val linear = ("%PDF-1.4\n1 0 obj\n<< /Length 28 >>\nstream\n" +
      "BT 72 720 Td (Linear) Tj ET\nendstream\nendobj\n%%EOF\n").getBytes(Latin1)
    assert(PdfTextDecoder.blocks(linear) == Seq(PdfBlock(0, "Linear", 72.0, 720.0)))
  }

  test("two-object reference cycle quarantines (no executor hang): resolve is hop-bounded") {
    // 2 0 R → 3 0 R → 2 0 R: each object parses fine in isolation (so
    // getObj's inFlight guard clears), but chasing the chain through the
    // CACHE used to loop forever — the untrusted-input DoS shape
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "3 0 R")
    b.obj(3, "2 0 R")
    b.classicXref(Seq(1, 2, 3), "<< /Size 4 /Root 1 0 R >>")
    val t0 = System.nanoTime()
    assert(PdfTextDecoder.blocks(b.bytes).isEmpty)
    assert((System.nanoTime() - t0) < 10_000_000_000L, "cycle must bail fast")
  }

  test("self-referencing /XRefStm quarantines (no stack overflow): every section load is guarded") {
    // a hybrid-file trailer whose /XRefStm points back at its OWN classic
    // table: unguarded recursion ran until StackOverflowError (fatal —
    // killed the task instead of quarantining the document)
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [] /Count 0 >>")
    val xrefOff = b.len
    b.classicXref(Seq(1, 2), s"<< /Size 3 /Root 1 0 R /XRefStm $xrefOff >>")
    assert(PdfTextDecoder.blocks(b.bytes).isEmpty)

    // and an A→B→A ping-pong between a classic table and a second section
    val c = new Builder
    c.raw("%PDF-1.4\n")
    c.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    c.obj(2, "<< /Type /Pages /Kids [] /Count 0 >>")
    val offA = c.len
    // hand-rolled so the /XRefStm target (a second classic section B) can
    // point back at A — the 6-char placeholder is patched with a 6-digit
    // offset, so no byte offsets shift
    c.raw(s"xref\n0 1\n0000000000 65535 f \ntrailer\n" +
      s"<< /Size 3 /Root 1 0 R /XRefStm @XREF@ >>\nstartxref\n$offA\n%%EOF\n")
    val withB = new String(c.bytes, Latin1)
    val offB = withB.length
    val full = (withB.replace("@XREF@", f"$offB%06d") +
      s"xref\n0 1\n0000000000 65535 f \ntrailer\n<< /Size 3 /XRefStm $offA >>\n")
      .getBytes(Latin1)
    assert(PdfTextDecoder.blocks(full).isEmpty)
  }

  test("an encrypted PDF quarantines with the reason tagged, never garbled text") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    // a realistic shape: content present (would be cipher text in a real
    // file) and an /Encrypt dictionary referenced from the trailer
    b.streamObj(5, "", content("cipher-text-here", 700).getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(7, "<< /Filter /Standard /V 2 /R 3 /O (x) /U (y) /P -44 >>")
    b.classicXref(Seq(1, 2, 3, 5, 7),
      "<< /Size 8 /Root 1 0 R /Encrypt 7 0 R >>")
    val d = PdfTextDecoder.decode(b.bytes)
    assert(d.isLeft && d.swap.exists(_.startsWith("encrypted:")), d.toString)
    assert(PdfTextDecoder.blocks(b.bytes).isEmpty)
    // the same document WITHOUT /Encrypt extracts — the refusal really is
    // the trailer key, not an unrelated parse failure
    val ok = new Builder
    ok.raw("%PDF-1.4\n")
    ok.streamObj(5, "", content("cipher-text-here", 700).getBytes(Latin1))
    ok.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    ok.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    ok.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    ok.classicXref(Seq(1, 2, 3, 5), "<< /Size 6 /Root 1 0 R >>")
    assert(PdfTextDecoder.blocks(ok.bytes).nonEmpty)
  }

  test("UTF-16BE text strings (BOM-prefixed) decode exactly; byte strings pass through") {
    val utf = "Größe 42 — naïve"
    val payload = Array[Byte](0xFE.toByte, 0xFF.toByte) ++
      utf.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    // escape the string-delimiter bytes a binary payload could contain
    val lit = new String(payload, Latin1)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(5, "",
      (s"BT 72 700 Td ($lit) Tj (plain bytes) Tj ET").getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5), "<< /Size 6 /Root 1 0 R >>")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got == Seq(PdfBlock(0, s"$utf plain bytes", 72.0, 700.0)), got.toString)
    // a dangling odd byte after the last UTF-16 pair is malformed padding
    // and drops instead of corrupting the decoded tail
    val odd = new String(payload :+ 0x41.toByte, Latin1)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val c = new Builder
    c.raw("%PDF-1.4\n")
    c.streamObj(5, "", s"BT 72 700 Td ($odd) Tj ET".getBytes(Latin1))
    c.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    c.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    c.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    c.classicXref(Seq(1, 2, 3, 5), "<< /Size 6 /Root 1 0 R >>")
    assert(PdfTextDecoder.blocks(c.bytes) ==
      Seq(PdfBlock(0, utf, 72.0, 700.0)))
  }
}
