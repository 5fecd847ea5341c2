package graft

import graft.operators.Ingestion.{PdfBlock, PdfTextDecoder}

/** /ToUnicode CMap decoding (§9.10.3): subset-font show strings whose
  * codes are font-internal glyph ids come back as the exact Unicode text
  * via bfchar/bfrange; fonts without a CMap keep the byte path
  * unchanged; the ACTIVE font (Tf) picks the mapping per show string.
  */
class PdfCMapSpec extends SparkSpec {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

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
    def classicXref(nums: Seq[Int], trailer: String): Unit = {
      val xrefOff = len
      raw("xref\n0 1\n0000000000 65535 f \n")
      nums.sorted.foreach { n => raw(f"$n 1\n${offsets(n)}%010d 00000 n \n") }
      raw(s"trailer\n$trailer\nstartxref\n$xrefOff\n%%%%EOF\n")
    }
    def bytes: Array[Byte] = buf.toByteArray
  }

  private val IdentityHCMap =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0001> <0048>
      |<0002> <00650301>
      |endbfchar
      |2 beginbfrange
      |<0010> <0012> <0061>
      |<0020> <0021> [<0058> <0059>]
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end end""".stripMargin

  test("subset font + bfchar/bfrange CMap: 2-byte codes extract the exact Unicode text") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(8, "", IdentityHCMap.getBytes(Latin1))
    b.obj(7, "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+NotoSans " +
      "/Encoding /Identity-H /ToUnicode 8 0 R >>")
    // codes: 0001→H, 0002→e+combining-acute (multi-unit dst), 0010..0012→abc
    // (incremented start), 0020/0021→XY (array dst), 0099→unmapped
    b.streamObj(5, "",
      "BT /F1 12 Tf 72 720 Td <00010002> Tj ET BT 72 700 Td <001000110012 0020 00210099> Tj ET"
        .getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 7 0 R >> >> >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 7, 8), "<< /Size 9 /Root 1 0 R >>")
    val got = PdfTextDecoder.blocks(b.bytes)
    // Tf persists across BT blocks: the second show still rides /F1
    assert(got == Seq(
      PdfBlock(0, "H" + "é", 72.0, 720.0),
      PdfBlock(0, "abcXY�", 72.0, 700.0)), got.toString)
  }

  test("the active font picks the mapping: CMap font vs plain font in one stream") {
    val oneByteCMap =
      """begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfrange
        |<41> <43> <0391>
        |endbfrange
        |endcmap""".stripMargin
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(8, "", oneByteCMap.getBytes(Latin1))
    b.obj(7, "<< /Type /Font /Subtype /TrueType /BaseFont /X /ToUnicode 8 0 R >>")
    b.obj(6, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    // /F1 maps A-C → Greek Α-Γ; /F2 has no CMap, so bytes pass through
    // (including the BOM path for a UTF-16BE hex string)
    b.streamObj(5, "",
      ("BT /F1 9 Tf 72 720 Td (ABC) Tj ET " +
        "BT /F2 9 Tf 72 700 Td (ABC) Tj ET " +
        "BT 72 680 Td <FEFF0041> Tj ET").getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 7 0 R /F2 6 0 R >> >> >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 6, 7, 8), "<< /Size 9 /Root 1 0 R >>")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got.map(_.text) == Seq("ΑΒΓ", "ABC", "A"), got.toString)
  }

  test("/Resources inherited from the /Pages parent still resolves the CMap") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(8, "", IdentityHCMap.getBytes(Latin1))
    b.obj(7, "<< /Type /Font /Subtype /Type0 /ToUnicode 8 0 R >>")
    b.streamObj(5, "", "BT /F1 12 Tf 72 720 Td <00010010> Tj ET".getBytes(Latin1))
    // the PAGE carries no /Resources — the parent /Pages node does
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F1 7 0 R >> >> >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 7, 8), "<< /Size 9 /Root 1 0 R >>")
    assert(PdfTextDecoder.blocks(b.bytes).map(_.text) == Seq("Ha"))
  }

  test("a garbage /ToUnicode stream keeps the byte path (never a throw, never silence)") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(8, "", "this is not a cmap".getBytes(Latin1))
    b.obj(7, "<< /Type /Font /ToUnicode 8 0 R >>")
    b.streamObj(5, "", "BT /F1 12 Tf 72 720 Td (Still here) Tj ET".getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 7 0 R >> >> >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 7, 8), "<< /Size 9 /Root 1 0 R >>")
    assert(PdfTextDecoder.blocks(b.bytes).map(_.text) == Seq("Still here"))
  }

  // ---- Annex D simple-font encodings (fonts WITHOUT /ToUnicode) ----

  /** One-page doc whose single font carries the given /Encoding value
    * (and no /ToUnicode); `showBytes` are the raw show-string bytes.
    */
  private def simpleFontDoc(encoding: String, showBytes: Array[Byte]): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.obj(7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      s"/Encoding $encoding >>")
    val content = "BT /F1 12 Tf 72 720 Td (".getBytes(Latin1) ++
      showBytes ++ ") Tj ET".getBytes(Latin1)
    b.streamObj(5, "", content)
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 7 0 R >> >> >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 7), "<< /Size 8 /Root 1 0 R >>")
    b.bytes
  }

  test("/WinAnsiEncoding: 0x80-0x9F typographic bytes extract their windows-1252 text") {
    // € (0x80), “ ” (0x93/0x94), … (0x85), — (0x97): all Latin-1 holes
    val bytes = "cost ".getBytes(Latin1) ++
      Array(0x80, 0x93, 0x94, 0x85, 0x97).map(_.toByte)
    val got = PdfTextDecoder.blocks(simpleFontDoc("/WinAnsiEncoding", bytes))
    assert(got.map(_.text) == Seq("cost €“”…—"), got.toString)
  }

  test("/MacRomanEncoding: Mac-coded accents extract exactly") {
    // MacRoman: 0x8E = é, 0x87 = á, 0x9F = ü
    val bytes = "caf".getBytes(Latin1) ++ Array(0x8e.toByte) ++
      " ".getBytes(Latin1) ++ Array(0x87.toByte, 0x9f.toByte)
    val got = PdfTextDecoder.blocks(simpleFontDoc("/MacRomanEncoding", bytes))
    assert(got.map(_.text) == Seq("café áü"), got.toString)
  }

  test("a /Differences font without /ToUnicode extracts exact non-ASCII text") {
    // remap 0x41('A')→é by AGL name, 0x42('B')→€ via uniXXXX, 0x43('C')→α
    // via uXXXX; consecutive names advance the code (0x44,0x45 follow 0x43)
    val enc = "<< /BaseEncoding /WinAnsiEncoding " +
      "/Differences [65 /eacute /uni20AC 67 /u03B1 /quoteleft /quoteright] >>"
    val got = PdfTextDecoder.blocks(simpleFontDoc(enc, "ABCDE ok".getBytes(Latin1)))
    assert(got.map(_.text) == Seq("é€α‘’ ok"), got.toString)
  }

  test("/Differences over an absent base applies on byte identity; unknown glyph names degrade") {
    // no BaseEncoding: unmapped codes keep their bytes; /nosuchglyph
    // leaves its code untouched instead of guessing
    val enc = "<< /Differences [66 /emdash /nosuchglyph] >>"
    val got = PdfTextDecoder.blocks(simpleFontDoc(enc, "ABC".getBytes(Latin1)))
    assert(got.map(_.text) == Seq("A—C"), got.toString)
  }

  test("garbage /Encoding values keep the byte path unchanged") {
    for (enc <- Seq("/NoSuchEncoding", "<< /BaseEncoding /Bogus >>", "42")) {
      val got = PdfTextDecoder.blocks(simpleFontDoc(enc, "plain text".getBytes(Latin1)))
      assert(got.map(_.text) == Seq("plain text"), s"$enc -> $got")
    }
  }

  test("/ToUnicode wins over /Encoding when a font carries both") {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfchar
        |<41> <0416>
        |endbfchar
        |endcmap""".stripMargin
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(8, "", cmap.getBytes(Latin1))
    b.obj(7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding /ToUnicode 8 0 R >>")
    b.streamObj(5, "", "BT /F1 12 Tf 72 720 Td (A) Tj ET".getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /Font << /F1 7 0 R >> >> >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 5, 7, 8), "<< /Size 9 /Root 1 0 R >>")
    // the CMap maps 'A' to Ж; WinAnsi would have said 'A'
    assert(PdfTextDecoder.blocks(b.bytes).map(_.text) == Seq("Ж"))
  }
}
