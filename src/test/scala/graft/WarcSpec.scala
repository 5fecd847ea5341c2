package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.sources.Warc

/** WARC/WET front door: real multi-member gzip bytes round-trip exactly;
  * rotten members/records quarantine at their grain without costing the
  * rest of the file; bombs and trailer corruption are refused, never
  * inflated or passed through.
  */
class WarcSpec extends SparkSpec {

  private val Iso = StandardCharsets.ISO_8859_1
  private val Utf8 = StandardCharsets.UTF_8

  private def record(typ: String, uri: String, body: Array[Byte]): Array[Byte] = {
    val hdr = s"WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: <urn:uuid:$uri>\r\n" +
      s"WARC-Target-URI: http://$uri/\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    hdr.getBytes(Iso) ++ body ++ "\r\n\r\n".getBytes(Iso)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private def writeFile(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("graft_warc")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  test("multi-member warc.gz round-trips records, URIs and payload text exactly") {
    // the Common Crawl shape: one gzip member per record, concatenated
    val bodies = Seq(
      "the quick brown fox",
      "naïve café — déjà vu ☃", // multi-byte UTF-8 must survive bit-exact
      "line one\nline two\n")
    val bytes = bodies.zipWithIndex.map { case (b, i) =>
      gz(record("conversion", s"example-$i.org", b.getBytes(Utf8)))
    }.reduce(_ ++ _)
    val path = writeFile("seg.warc.gz", bytes)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty, bad.collect().mkString("|"))
    val rows = good.orderBy("offset").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("text")).toSeq == bodies)
    assert(rows.map(_.getAs[String]("target_uri")).toSeq ==
      bodies.indices.map(i => s"http://example-$i.org/"))
    assert(rows.forall(_.getAs[String]("warc_type") == "conversion"))
    assert(rows.zip(bodies).forall { case (r, b) =>
      r.getAs[Long]("content_length") == b.getBytes(Utf8).length.toLong })
    // member offsets strictly increase: each record pins its own member
    val offs = rows.map(_.getAs[Long]("offset")).toSeq
    assert(offs == offs.sorted && offs.distinct == offs)
  }

  test("a rotten middle member quarantines alone; members after it still parse") {
    val m1 = gz(record("conversion", "a.org", "first".getBytes(Utf8)))
    val m3 = gz(record("conversion", "c.org", "third".getBytes(Utf8)))
    // member 2: valid gzip magic, then garbage (truncated deflate)
    val m2 = gz(record("conversion", "b.org", "second".getBytes(Utf8))).take(20)
    val path = writeFile("rot.warc.gz", m1 ++ m2 ++ m3)
    val (good, bad) = Warc.readWarc(spark, path)
    val texts = good.collect().map(_.getAs[String]("text")).toSet
    assert(texts == Set("first", "third"))
    val q = bad.collect()
    assert(q.length == 1 && q.head.getAs[Long]("offset") == m1.length.toLong)
    assert(q.head.getAs[String]("reason").contains("deflate"))
  }

  test("a flipped trailer CRC quarantines that member with the tagged reason") {
    val m1 = gz(record("conversion", "a.org", "alpha".getBytes(Utf8)))
    val m2 = gz(record("conversion", "b.org", "beta".getBytes(Utf8)))
    // corrupt m1's CRC32 (first trailer byte, 8 from the end)
    val m1bad = m1.clone()
    m1bad(m1bad.length - 8) = (m1bad(m1bad.length - 8) ^ 0xff).toByte
    val path = writeFile("crc.warc.gz", m1bad ++ m2)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(good.collect().map(_.getAs[String]("text")).toSet == Set("beta"))
    val q = bad.collect()
    assert(q.length == 1 && q.head.getAs[String]("reason").contains("CRC32"))
  }

  test("record-grain resync: a record missing Content-Length quarantines, the next record parses") {
    val goodRec = record("conversion", "ok.org", "kept".getBytes(Utf8))
    val badRec = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://bad.org/\r\n\r\n").getBytes(Iso)
    val path = writeFile("plain.wet", badRec ++ goodRec)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(good.collect().map(_.getAs[String]("text")).toSeq == Seq("kept"))
    val q = bad.collect()
    assert(q.length == 1 && q.head.getAs[String]("reason").contains("Content-Length"))
  }

  test("plain uncompressed .wet parses through the same path") {
    val bytes = record("warcinfo", "info.org", "robots: classic".getBytes(Utf8)) ++
      record("conversion", "page.org", "page text body".getBytes(Utf8))
    val path = writeFile("plain2.wet", bytes)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty)
    val byType = good.collect().map(r =>
      r.getAs[String]("warc_type") -> r.getAs[String]("text")).toMap
    assert(byType == Map(
      "warcinfo" -> "robots: classic", "conversion" -> "page text body"))
  }

  test("empty and pure-garbage files contribute zero records and never throw") {
    val empty = writeFile("empty.warc.gz", Array.emptyByteArray)
    val (g1, b1) = Warc.readWarc(spark, empty)
    assert(g1.isEmpty && b1.isEmpty)
    val junk = writeFile("junk.warc", "this is not a warc at all".getBytes(Utf8))
    val (g2, b2) = Warc.readWarc(spark, junk)
    assert(g2.isEmpty)
    assert(b2.collect().map(_.getAs[String]("reason"))
      .exists(_.contains("version line")))
  }

  test("response records peel the HTTP message: status + Content-Type typed, text = body") {
    val html = "<html><body>corpus text — naïve ☃</body></html>"
    val httpMsg = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      "Server: test\r\n\r\n").getBytes(Iso) ++ html.getBytes(Utf8)
    val resp = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://resp.org/\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpMsg.length}\r\n\r\n").getBytes(Iso) ++
      httpMsg ++ "\r\n\r\n".getBytes(Iso)
    val conv = record("conversion", "wet.org", "already text".getBytes(Utf8))
    val path = writeFile("resp.warc.gz", gz(resp) ++ gz(conv))
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty)
    val byType = good.collect().map(r => r.getAs[String]("warc_type") -> r).toMap
    val r = byType("response")
    assert(r.getAs[String]("text") == html, r.toString)
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("http_content_type") == "text/html; charset=UTF-8")
    // non-response records keep the raw payload and NULL http columns
    val c = byType("conversion")
    assert(c.getAs[String]("text") == "already text")
    assert(c.isNullAt(c.fieldIndex("http_status")))
  }

  test("chunked transfer-encoding reassembles; a malformed HTTP head falls back to raw payload") {
    val chunkedBody = "7\r\nchunk A\r\n9\r\n, chunk B\r\n0\r\n\r\n"
    val httpMsg = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" + chunkedBody).getBytes(Iso)
    val resp = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http\r\n" +
      s"Content-Length: ${httpMsg.length}\r\n\r\n").getBytes(Iso) ++
      httpMsg ++ "\r\n\r\n".getBytes(Iso)
    // response-typed record whose payload is NOT an HTTP message
    val notHttp = "just bytes, no status line".getBytes(Utf8)
    val broken = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http\r\n" +
      s"Content-Length: ${notHttp.length}\r\n\r\n").getBytes(Iso) ++
      notHttp ++ "\r\n\r\n".getBytes(Iso)
    val path = writeFile("chunk.warc.gz", gz(resp) ++ gz(broken))
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty)
    val texts = good.orderBy("offset").collect().map(_.getAs[String]("text")).toSeq
    assert(texts == Seq("chunk A, chunk B", "just bytes, no status line"), texts)
  }

  test("a gzip bomb member is refused at the inflate cap, not expanded") {
    // 64 MB of zeros compresses to ~64 KB: the claimed expansion blows the
    // 64× cap and must quarantine without materializing the payload
    val big = new Array[Byte](64 << 20)
    val bomb = gz(record("conversion", "bomb.org", big))
    val tail = gz(record("conversion", "after.org", "survivor".getBytes(Utf8)))
    val path = writeFile("bomb.warc.gz", bomb ++ tail)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(good.collect().map(_.getAs[String]("text")).toSeq == Seq("survivor"))
    assert(bad.collect().exists(_.getAs[String]("reason").contains("bomb")))
  }

  test("toDocuments: text-bearing records land in the documents schema with deterministic ids") {
    val bytes =
      gz(record("warcinfo", "info.org", "software: test-crawler".getBytes(Utf8))) ++
      gz(record("conversion", "a.example.org", "alpha beta gamma".getBytes(Utf8))) ++
      gz(record("conversion", "b.example.org", "delta epsilon".getBytes(Utf8)))
    val path = writeFile("docs.warc.gz", bytes)
    val (good, _) = Warc.readWarc(spark, path)
    val docs = Warc.toDocuments(good)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = docs.orderBy("source").collect()
    // warcinfo is crawl bookkeeping, not corpus text
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("source")).toSeq ==
      Seq("a.example.org", "b.example.org"))
    assert(rows.map(_.getAs[String]("text")).toSeq ==
      Seq("alpha beta gamma", "delta epsilon"))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("lang"))))
    assert(rows.map(_.getAs[Long]("n_chars")).toSeq == Seq(16L, 13L))
    // ids are content-addressed (record id), not positional: a second
    // read of the same bytes yields the SAME ids
    val again = Warc.toDocuments(Warc.readWarc(spark, path)._1)
      .orderBy("source").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSeq)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 2)
  }

  test("a member of only CRLFs quarantines as record-free — it never vanishes") {
    val crlfs = gz("\r\n\r\n\r\n\r\n".getBytes(Iso))
    val keeper = gz(record("conversion", "keep.org", "kept".getBytes(Utf8)))
    val path = writeFile("crlf.warc.gz", crlfs ++ keeper)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(good.collect().map(_.getAs[String]("text")).toSeq == Seq("kept"))
    val q = bad.collect()
    assert(q.length == 1 && q.head.getAs[String]("reason").contains("no WARC records"),
      q.mkString("|"))
  }

  test("hostile chunk-size lines (Int.MaxValue, 64-bit overflow) degrade to raw body, never throw") {
    // '7fffffff' = Int.MaxValue: Int arithmetic on lineEnd+2+size would
    // overflow negative, pass the bounds guard, and throw from write();
    // the Long-safe check must instead reject the frame → raw fallback
    def respWith(chunked: String): Array[Byte] = {
      val httpMsg = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + chunked).getBytes(Iso)
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://evil.org/\r\n" +
        "Content-Type: application/http\r\n" +
        s"Content-Length: ${httpMsg.length}\r\n\r\n").getBytes(Iso) ++
        httpMsg ++ "\r\n\r\n".getBytes(Iso)
    }
    val intMax = "7fffffff\r\nsome bytes"
    val wide = "10000000000000005\r\nfive!" // > 16 hex digits: parseLong overflow
    val path = writeFile("hostile.warc.gz", gz(respWith(intMax)) ++ gz(respWith(wide)))
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty, bad.collect().mkString("|"))
    val texts = good.orderBy("offset").collect().map(_.getAs[String]("text")).toSeq
    // the malformed chunk stream falls back to the RAW body — frame intact
    assert(texts == Seq(intMax, wide), texts)
  }

  test("toDocuments: a record with neither record id nor target URI still gets a non-null doc_id") {
    val body = "orphan text".getBytes(Utf8)
    val anon = (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"Content-Type: text/plain\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(Iso) ++
      body ++ "\r\n\r\n".getBytes(Iso)
    val path = writeFile("anon.warc.gz", gz(anon))
    val docs = Warc.toDocuments(Warc.readWarc(spark, path)._1).collect()
    assert(docs.length == 1)
    assert(!docs.head.isNullAt(docs.head.fieldIndex("doc_id")),
      "doc_id must coalesce to (path, offset) when id and URI are both absent")
    assert(docs.head.getAs[String]("text") == "orphan text")
  }

  test("truncated payload at end of member quarantines with the offset in the reason") {
    val full = record("conversion", "cut.org", "0123456789".getBytes(Utf8))
    val cut = full.take(full.length - 8) // chop into the payload
    val path = writeFile("cut.warc.gz", gz(cut))
    val (good, bad) = Warc.readWarc(spark, path)
    assert(good.isEmpty)
    assert(bad.collect().exists(_.getAs[String]("reason").contains("truncated payload")))
  }

  /** HTML response record with the given peeled Content-Type and raw body
    * bytes — the shape the charset chain decodes.
    */
  private def htmlResp(uri: String, contentType: String, body: Array[Byte]): Array[Byte] = {
    val httpMsg = ("HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $contentType\r\n\r\n").getBytes(Iso) ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$uri>\r\n" +
      s"WARC-Target-URI: http://$uri/\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpMsg.length}\r\n\r\n").getBytes(Iso) ++
      httpMsg ++ "\r\n\r\n".getBytes(Iso)
  }

  test("declared charsets decode exactly: real Shift_JIS and windows-1251 bodies through toDocuments") {
    val jp = "こんにちは世界 文字コード試験"
    val ru = "Привет мир — проверка кодировки"
    val jpHtml = s"<html><body><p>$jp</p></body></html>"
    val ruHtml = s"<html><body><p>$ru</p></body></html>"
    val bytes =
      gz(htmlResp("jp.example.jp", "text/html; charset=Shift_JIS",
        jpHtml.getBytes("windows-31j"))) ++
      gz(htmlResp("ru.example.ru", "text/html; charset=windows-1251",
        ruHtml.getBytes("windows-1251")))
    val path = writeFile("charset.warc.gz", bytes)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty, bad.collect().mkString("|"))
    val texts = Warc.toDocuments(good).orderBy("source").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text")).toMap
    // exact text through decode → HTTP peel → HtmlText extraction
    assert(texts("jp.example.jp") == jp, texts("jp.example.jp"))
    assert(texts("ru.example.ru") == ru, texts("ru.example.ru"))
  }

  test("charset-less windows-1252 HTML falls back via the UTF-8 validity gate; meta prescan wins when present") {
    // curly quotes + en dash: 0x93/0x94/0x96 — invalid UTF-8, classic 1252
    val w1252 = "café “quoted” – dash"
    val noDecl = s"<html><body><p>$w1252</p></body></html>"
      .getBytes("windows-1252")
    // no transport charset, but a meta tag names windows-1251
    val ru = "Ещё раз — привет"
    val metaDecl = (s"<html><head><meta charset=windows-1251></head>" +
      s"<body><p>$ru</p></body></html>").getBytes("windows-1251")
    val bytes =
      gz(htmlResp("fallback.example.org", "text/html", noDecl)) ++
      gz(htmlResp("meta.example.org", "text/html", metaDecl))
    val path = writeFile("sniff.warc.gz", bytes)
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty, bad.collect().mkString("|"))
    val texts = Warc.toDocuments(good).orderBy("source").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text")).toMap
    assert(texts("fallback.example.org") == w1252, texts("fallback.example.org"))
    assert(texts("meta.example.org") == ru, texts("meta.example.org"))
  }

  test("UTF-8/WET lane stays bit-unchanged: undeclared valid UTF-8 never reroutes to windows-1252") {
    // multi-byte UTF-8, no charset anywhere — exactly the WET shape; the
    // validity gate must keep it on the UTF-8 path
    val wet = "naïve café — déjà vu ☃ 日本語"
    val path = writeFile("wet8.warc.gz",
      gz(record("conversion", "wet8.org", wet.getBytes(Utf8))))
    val (good, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty)
    assert(good.collect().map(_.getAs[String]("text")).toSeq == Seq(wet))
  }

  test("BOMs win over declarations and are consumed; unknown labels degrade to the UTF-8 path") {
    import graft.sources.BodyCharset
    val s = "bom text — π"
    // UTF-8 BOM beats a (wrong) declared windows-1251
    val utf8Bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ s.getBytes(Utf8)
    assert(BodyCharset.decode(utf8Bom, "text/html; charset=windows-1251") == s)
    // UTF-16LE BOM
    val le = Array(0xff, 0xfe).map(_.toByte) ++ s.getBytes(StandardCharsets.UTF_16LE)
    assert(BodyCharset.decode(le, null) == s)
    // unknown charset label → legacy UTF-8 decode, never a throw
    assert(BodyCharset.decode(s.getBytes(Utf8), "text/html; charset=x-no-such-cs") == s)
    // label normalization: quoted, mixed-case, Latin-1 → windows-1252 remap
    assert(BodyCharset.resolveLabel("\"ISO-8859-1\"").map(_.name) ==
      Some("windows-1252"))
    // prescan UTF-16 self-refutation: markup decoded as ASCII → UTF-8
    val lie = ("<html><head><meta charset=utf-16></head><body>" + s + "</body></html>")
      .getBytes(Utf8)
    assert(BodyCharset.decode(lie, null).contains(s))
    // http-equiv spelling reaches the same label
    assert(BodyCharset.prescanMeta(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=KOI8-R\">x")
        .getBytes(Iso)) == Some("KOI8-R"))
  }
}
