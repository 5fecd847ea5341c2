package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.sources.{HtmlText, Warc}
import graft.operators.{Curation, TextAnalysis}

/** HTML → text extraction on REAL html bytes — nested and unclosed tags,
  * entities, script/style payloads, hostile fragments — plus the
  * composition proof: a raw-WARC segment of HTML responses flows through
  * `toDocuments` into the paragraph-dedup and quality-filter stack with
  * no adapter, the crawl → curation contract end-to-end.
  */
class HtmlTextSpec extends SparkSpec {

  import HtmlText.extract

  // ---- extraction core ----

  test("block tags become newlines, inline tags vanish, text round-trips") {
    val html =
      """<!DOCTYPE html><html><head><title>The Title</title></head>
        |<body><h1>Heading</h1>
        |<p>First <b>bold</b> and <i>italic</i> paragraph.</p>
        |<p>Second
        |   paragraph spanning lines.</p>
        |<ul><li>alpha</li><li>beta</li></ul>
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "The Title\nHeading\nFirst bold and italic paragraph.\n" +
        "Second paragraph spanning lines.\nalpha\nbeta")
  }

  test("inline tags glue their text: a<b>b</b>c is abc; <br> breaks") {
    assert(extract("a<b>b</b>c") == "abc")
    assert(extract("one<br>two<br/>three") == "one\ntwo\nthree")
    assert(extract("link: <a href='/x'>here</a> now") == "link: here now")
  }

  test("script, style, template payloads and comments never leak") {
    val html =
      """<p>before</p><script type="text/javascript">
        |var x = "<p>not text</p>"; if (a < b) { alert('&amp;'); }
        |</script><style>p { color: red; } /* <div> */</style>
        |<!-- a comment with <p>markup</p> inside --><p>after</p>
        |<template><p>shadow</p></template>done""".stripMargin
    assert(extract(html) == "before\nafter\ndone")
  }

  test("a raw-text close tag requires a proper name terminator: </scripty> does not end <script>") {
    // HTML5: the end-tag NAME must be followed by '>', '/', or whitespace;
    // a prefix match alone (</scripty>, </scriptfoo>) stays inside the
    // raw-text payload and must not leak what follows it as corpus text
    assert(extract("<p>a</p><script>var x; </scripty> leaked?</script><p>b</p>") ==
      "a\nb")
    // whitespace and solidus terminators DO close it
    assert(extract("<p>a</p><script>x</script ><p>b</p>") == "a\nb")
    assert(extract("<p>a</p><style>p{}</style\t><p>b</p>") == "a\nb")
  }

  test("entities decode: named, decimal, hex; unknown and bare & stay literal") {
    assert(extract("fish &amp; chips &lt;now&gt; &quot;here&quot;") ==
      "fish & chips <now> \"here\"")
    assert(extract("caf&eacute; &#233;t&#xE9; snowman &#x2603;") ==
      "café été snowman ☃")
    assert(extract("AT&T and &unknownentity; stay") == "AT&T and &unknownentity; stay")
    assert(extract("a &#xD800; surrogate and &#2; control stay literal") ==
      "a &#xD800; surrogate and &#2; control stay literal")
    assert(extract("non&shy;breaking&nbsp;space") == "nonbreaking space")
  }

  test("the full HTML4/5 named-entity blocks decode: Greek, math, arrows, letterlike, numero") {
    assert(extract("&Alpha;&beta;&Gamma;&delta; &pi;r&sup2; &sigmaf;&thetasym;") ==
      "ΑβΓδ πr² ςϑ")
    assert(extract("&forall;x&isin;S: x&le;y &and; x&ne;&empty; &rArr; &sum;&radic;&infin;") ==
      "∀x∈S: x≤y ∧ x≠∅ ⇒ ∑√∞")
    assert(extract("&larr;&uarr;&rarr;&darr;&harr; &lArr;&hArr;") == "←↑→↓↔ ⇐⇔")
    assert(extract("&numero;5 &trade; &alefsym; &real;&image;&weierp;") ==
      "№5 ™ ℵ ℜℑ℘")
    assert(extract("&lceil;x&rceil; &lang;a,b&rang; &spades;&clubs;&hearts;&diams;") ==
      "⌈x⌉ ⟨a,b⟩ ♠♣♥♦")
    assert(extract("&OElig;uf &scaron;&Yuml; &bdquo;quote&ldquo; &permil; &frasl;") ==
      "Œuf šŸ „quote“ ‰ ⁄")
    // entity names are case-sensitive like the WHATWG table
    assert(extract("&Sigma; vs &sigma;") == "Σ vs σ")
    // format controls decode to nothing; spacing entities are word breaks
    assert(extract("a&zwnj;b&lrm;c d&ensp;e&thinsp;f") == "abc d e f")
  }

  test("malformed fragments degrade to their raw characters, never vanish or throw") {
    // literal '<' that opens no tag
    assert(extract("5 < 6 and 7 <3 hearts") == "5 < 6 and 7 <3 hearts")
    // unclosed comment swallows the rest (the HTML5 EOF rule)
    assert(extract("kept <!-- never closed <p>gone</p>") == "kept")
    // unclosed script drops to end: payload must not leak
    assert(extract("kept <script>var a = 1; // no close") == "kept")
    // unclosed tag at EOF
    assert(extract("kept <a href=") == "kept")
    // a '>' inside a quoted attribute does not end the tag
    assert(extract("""<a href="x>y" title='p>q'>link</a>""") == "link")
    // CDATA and processing instructions drop
    assert(extract("a<![CDATA[ <p>raw</p> ]]>b<?php echo 1; ?>c") == "abc")
    // empty and null are total
    assert(extract("") == "")
    assert(extract(null) == "")
  }

  test("whitespace collapses per paragraph; empty paragraphs never emit") {
    val html = "<div>  </div><div>one   two\t three</div><p></p><p>four</p><div><span> </span></div>"
    assert(extract(html) == "one two three\nfour")
    // inter-tag newlines are whitespace, not breaks
    assert(extract("<span>a</span>\n<span>b</span>") == "a b")
  }

  test("<pre> preserves its internal line structure") {
    val html = "<p>intro</p><pre>line one\nline two</pre><p>outro</p>"
    assert(extract(html) == "intro\nline one\nline two\noutro")
    // outside pre the same newline is a space
    assert(extract("<p>line one\nline two</p>") == "line one line two")
  }

  test("output paragraphs are exactly the unit grammar dedup_paragraphs splits on") {
    val html = "<article><p>para one</p><p>para two</p><p>para one</p></article>"
    val got = extract(html)
    assert(got.split("\n").toSeq == Seq("para one", "para two", "para one"))
    assert(!got.contains("\n\n"), "no empty paragraphs between blocks")
  }

  test("isHtmlContentType: mime match is case- and parameter-insensitive") {
    assert(HtmlText.isHtmlContentType("text/html"))
    assert(HtmlText.isHtmlContentType("Text/HTML; charset=UTF-8"))
    assert(HtmlText.isHtmlContentType("application/xhtml+xml"))
    assert(!HtmlText.isHtmlContentType("text/plain"))
    assert(!HtmlText.isHtmlContentType("application/http; msgtype=response"))
    assert(!HtmlText.isHtmlContentType(null))
  }

  // ---- WARC → documents → curation composition ----

  private val Iso = StandardCharsets.ISO_8859_1
  private val Utf8 = StandardCharsets.UTF_8

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private def htmlResponse(uri: String, html: String): Array[Byte] = {
    val httpMsg = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n\r\n").getBytes(Iso) ++
      html.getBytes(Utf8)
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$uri>\r\n" +
      s"WARC-Target-URI: http://$uri/\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpMsg.length}\r\n\r\n").getBytes(Iso) ++
      httpMsg ++ "\r\n\r\n".getBytes(Iso)
  }

  test("a raw-WARC segment of HTML pages feeds paragraph dedup and the quality filter end-to-end") {
    val boiler = "Copyright Example Corp — all rights reserved"
    val page1 =
      s"""<html><head><title>Page One</title><script>track();</script></head>
         |<body><p>the quick brown fox jumps over the lazy dog</p>
         |<p>unique to page one with more of the words</p>
         |<footer>$boiler</footer></body></html>""".stripMargin
    val page2 =
      s"""<html><body><p>an entirely different second document body</p>
         |<footer>$boiler</footer></body></html>""".stripMargin
    // a pure-script page: extraction leaves NO corpus text
    val page3 = "<html><body><script>var only = 'code';</script></body></html>"
    val bytes = gz(htmlResponse("one.example.org", page1)) ++
      gz(htmlResponse("two.example.org", page2)) ++
      gz(htmlResponse("three.example.org", page3))
    val dir = Files.createTempDirectory("graft_html_warc")
    val path = dir.resolve("seg.warc.gz")
    Files.write(path, bytes)

    val (records, bad) = Warc.readWarc(spark, path.toString)
    assert(bad.isEmpty, bad.collect().mkString("|"))
    val docs = Warc.toDocuments(records)
    val rows = docs.orderBy("source").collect()
    // the script-only page dropped at the bridge; the others carry
    // extracted paragraphs, not tag soup
    assert(rows.map(_.getAs[String]("source")).toSeq ==
      Seq("one.example.org", "two.example.org"))
    val t1 = rows(0).getAs[String]("text")
    assert(t1 == "Page One\nthe quick brown fox jumps over the lazy dog\n" +
      s"unique to page one with more of the words\n$boiler", t1)
    assert(!t1.contains("<") && !t1.contains("track()"))
    assert(rows.forall(r => r.getAs[Long]("n_chars") ==
      r.getAs[String]("text").length.toLong))

    // paragraph dedup: the shared footer boilerplate survives only in the
    // first document (keep-first), page structure otherwise intact
    val deduped = TextAnalysis.dedupParagraphsOf(docs)
      .join(docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")), Seq("doc_id"))
      .orderBy("source").collect()
    val bySource = deduped.map(r =>
      r.getAs[String]("source") -> r.getAs[String]("clean_text")).toMap
    assert(bySource("one.example.org").endsWith(boiler))
    assert(!bySource("two.example.org").contains(boiler),
      "second copy of the boilerplate footer must dedup away")
    assert(bySource("two.example.org") == "an entirely different second document body")

    // quality filter consumes the same relation unchanged: every doc
    // scored, the word counters live on extracted text
    val q = Curation.qualityFilterOf(docs).collect()
    assert(q.length == 2)
    assert(q.forall(_.getAs[Long]("n_words") > 0))
  }

  // ---- link-density boilerplate rung (jusText-lite) ----

  private val NavFooterPage =
    """<html><head><title>Widget Review</title></head><body>
      |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a> <a href="/blog">Blog</a></nav>
      |<h1>The widget, reviewed honestly</h1>
      |<p>The widget performs admirably under sustained load, and we
      |measured its throughput against <a href="/bench">our benchmark</a>
      |suite across fourteen distinct workloads over two weeks.</p>
      |<p>Short but link-free caption line</p>
      |<div><a href="/p">Prev</a> | <a href="/n">Next</a> | <a href="/i">Index</a></div>
      |<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> <a href="/rss">RSS</a></footer>
      |</body></html>""".stripMargin

  test("extractParagraphs counts anchor characters per paragraph in the same scan") {
    val ps = HtmlText.extractParagraphs(NavFooterPage)
    val byText = ps.map(p => p.text -> p).toMap
    // nav row: every glyph inside an <a> except the inter-link spaces
    val nav = byText("Home About Contact Blog")
    assert(nav.anchorChars >= "HomeAboutContactBlog".length, nav.toString)
    assert(nav.anchorChars * 100 > nav.text.length * 40)
    // heading: no anchors at all
    assert(byText("The widget, reviewed honestly").anchorChars == 0)
    // body prose: linky span counted, but a small share of the paragraph
    val body = ps.find(_.text.startsWith("The widget performs")).get
    // +1: the collapsed space before the link is flushed at the anchor's
    // first glyph and adopts its anchor state — a deterministic tie-break
    assert(body.anchorChars == "our benchmark".length + 1, body.toString)
    assert(body.anchorChars * 100 < body.text.length * 40)
    // joining paragraphs reproduces extract exactly — one scan, one grammar
    assert(ps.map(_.text).mkString("\n") == extract(NavFooterPage))
  }

  test("extractPruned drops nav/footer link rows while body text and captions survive") {
    val pruned = HtmlText.extractPruned(NavFooterPage, 40, 10)
    val kept = pruned.split("\n").toSeq
    assert(kept.exists(_.startsWith("The widget performs")), pruned)
    assert(kept.contains("The widget, reviewed honestly"))
    assert(kept.contains("Widget Review")) // title: short but link-free
    assert(kept.contains("Short but link-free caption line"))
    // menus, pager, footer chrome all drop
    assert(!pruned.contains("Home About"), pruned)
    assert(!pruned.contains("Prev | Next"), pruned)
    assert(!pruned.contains("Privacy"), pruned)
    // thresholds matter: with a 100% link ceiling nothing is "linky"
    assert(HtmlText.extractPruned(NavFooterPage, 100, 10) == extract(NavFooterPage))
  }

  test("line_quality_filter runs on WARC-bridged HTML paragraphs: prose keeps, listing and code pages drop") {
    val prose =
      """<html><body><p>The crawl produced a real paragraph that ends properly.</p>
        |<p>Its second paragraph also reads like prose, with enough words to keep!</p></body></html>""".stripMargin
    val listing =
      """<html><body><ul><li>- alpha entry</li><li>- beta entry</li>
        |<li>- gamma entry</li></ul></body></html>""".stripMargin
    val codey =
      """<html><body><p>if (x) { return y; }</p><p>Please enable javascript now.</p></body></html>"""
    val bytes = gz(htmlResponse("prose.example.org", prose)) ++
      gz(htmlResponse("listing.example.org", listing)) ++
      gz(htmlResponse("codey.example.org", codey))
    val dir = Files.createTempDirectory("graft_html_lineq")
    val path = dir.resolve("seg.warc.gz")
    Files.write(path, bytes)
    val (records, _) = Warc.readWarc(spark, path.toString)
    val docs = Warc.toDocuments(records)
    val out = Curation.lineQualityFilterOf(docs)
      .join(docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")), Seq("doc_id"))
      .collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("prose.example.org").forall(_.getAs[Boolean]("keep")))
    assert(bySrc("prose.example.org").forall(_.getAs[Boolean]("line_keep")))
    val listRows = bySrc("listing.example.org")
    assert(listRows.forall(!_.getAs[Boolean]("keep")))
    assert(listRows.head.getAs[String]("reasons").contains("bullet_heavy"))
    val codeRows = bySrc("codey.example.org")
    assert(codeRows.forall(r => !r.getAs[Boolean]("line_keep")),
      codeRows.mkString("|"))
    assert(codeRows.head.getAs[String]("reasons").contains("no_kept_lines"))
  }

  test("the WARC bridge prunes boilerplate only when the conf knob opts in") {
    val bytes = gz(htmlResponse("review.example.org", NavFooterPage))
    val dir = Files.createTempDirectory("graft_html_boiler")
    val path = dir.resolve("seg.warc.gz")
    Files.write(path, bytes)
    val (records, _) = Warc.readWarc(spark, path.toString)
    // default: bit-stable full extraction
    val full = Warc.toDocuments(records).collect().head.getAs[String]("text")
    assert(full == extract(NavFooterPage))
    spark.conf.set("spark.graft.html.boilerplate", "true")
    try {
      val pruned = Warc.toDocuments(records).collect().head.getAs[String]("text")
      assert(pruned == HtmlText.extractPruned(NavFooterPage, 40, 10))
      assert(!pruned.contains("Home About") &&
        pruned.contains("The widget, reviewed honestly"))
    } finally spark.conf.unset("spark.graft.html.boilerplate")
  }
}
