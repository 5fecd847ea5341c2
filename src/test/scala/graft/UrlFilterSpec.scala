package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.{UrlFilter, Warc}

/** URL-grain crawl hygiene: blocklisted words, non-document extensions,
  * junk schemes and over-long URLs drop WITH tagged reasons before any
  * content work; clean records pass unchanged; the
  * readWarc → urlFilter → toDocuments composition holds.
  */
class UrlFilterSpec extends SparkSpec {

  private val Iso = StandardCharsets.ISO_8859_1
  private val Utf8 = StandardCharsets.UTF_8

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private def conv(uri: String, body: String): Array[Byte] = {
    val b = body.getBytes(Utf8)
    val uriHdr = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <urn:uuid:${math.abs(uri.##)}>\r\n" + uriHdr +
      s"Content-Type: text/plain\r\nContent-Length: ${b.length}\r\n\r\n").getBytes(Iso) ++
      b ++ "\r\n\r\n".getBytes(Iso)
  }

  private def segment(recs: Seq[Array[Byte]]): String = {
    val dir = Files.createTempDirectory("graft_urlfilter")
    val p = dir.resolve("seg.warc.gz")
    Files.write(p, recs.map(gz).reduce(_ ++ _))
    p.toString
  }

  test("each rule drops with its tagged reason; clean records pass unchanged") {
    val path = segment(Seq(
      conv("https://ok.example/article/one", "kept article text"),
      conv("http://ok.example/two.html", "second kept text"),
      conv("https://cdn.example/logo.png", "binary mislabeled as text"),
      conv("https://cdn.example/app.min.js?v=3", "code payload"),
      conv("ftp://files.example/readme", "wrong scheme"),
      conv("https://casino-winners.example/page", "blocklisted word host"),
      conv("https://long.example/" + "a" * 2100, "overlong url")))
    val (records, bad) = Warc.readWarc(spark, path)
    assert(bad.isEmpty)
    val (kept, dropped) = UrlFilter(records)
    assert(kept.collect().map(_.getAs[String]("text")).toSet ==
      Set("kept article text", "second kept text"))
    val reasons = dropped.collect()
      .map(r => r.getAs[String]("target_uri").take(30) -> r.getAs[String]("reason")).toMap
    assert(reasons.values.toSet == Set("blocked extension .png",
      "blocked extension .js", "non-http scheme", "blocked word", "url too long"),
      reasons.toString)
    // kept frame keeps the FULL record schema — it drops into toDocuments
    assert(kept.columns.toSet == records.columns.toSet)
  }

  test("extension matches on the PATH, not the query string; a record without a URI drops tagged") {
    val path = segment(Seq(
      conv("https://ok.example/page?asset=logo.png", "query-string png is fine"),
      conv("https://api.example/data.json", "json payload")))
    val (records, _) = Warc.readWarc(spark, path)
    // append a uriless record frame-side (the conv helper always sets one)
    val uriless = records.limit(1).withColumn("target_uri",
      org.apache.spark.sql.functions.lit(null: String))
    val (kept, dropped) = UrlFilter(records.unionByName(uriless))
    assert(kept.collect().map(_.getAs[String]("text")).toSeq ==
      Seq("query-string png is fine"))
    val rs = dropped.collect().map(_.getAs[String]("reason")).toSet
    assert(rs == Set("blocked extension .json", "missing url"), rs.toString)
  }

  test("the blocklist knob flows: a custom word list changes the verdicts") {
    val path = segment(Seq(
      conv("https://widgets.example/catalog", "widget text"),
      conv("https://gadgets.example/catalog", "gadget text")))
    val (records, _) = Warc.readWarc(spark, path)
    spark.conf.set("spark.graft.url.blockWords", "widgets")
    try {
      val (kept, dropped) = UrlFilter(records)
      assert(kept.collect().map(_.getAs[String]("text")).toSeq == Seq("gadget text"))
      assert(dropped.collect().map(_.getAs[String]("reason")).toSeq == Seq("blocked word"))
    } finally spark.conf.unset("spark.graft.url.blockWords")
  }

  test("composition: urlFilter before toDocuments keeps blocked URLs out of the corpus") {
    val path = segment(Seq(
      conv("https://ok.example/article", "surviving corpus text"),
      conv("https://spam-casino.example/x", "never tokenized")))
    val (records, _) = Warc.readWarc(spark, path)
    val docs = Warc.toDocuments(UrlFilter(records)._1)
    val texts = docs.collect().map(_.getAs[String]("text")).toSeq
    assert(texts == Seq("surviving corpus text"), texts)
    assert(docs.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
  }
}
