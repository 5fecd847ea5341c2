package graft.sources

/** Deterministic HTML → text extraction (SURVEY §2B) — the rung between
  * the raw-WARC front door and the curation stack. A `response` record's
  * payload IS HTML; without this rung the dedup/quality/tokenizer
  * operators would ingest tag soup (WET `conversion` records arrive
  * pre-extracted; raw WARC does not). Reference scope: the reference
  * pipeline is single-PDF (main.py:1-40) and has no crawl front door at
  * all — this is the engine's own 100 TB crawl story, the same
  * extraction class CCNet/C4 run before their filters (Wenzek et al.
  * 2020 §3.1; Raffel et al. 2020 §2.2).
  *
  * Design rules, inherited from the ingestion posture:
  *  - NEVER throws, total on arbitrary input: unclosed comments/scripts
  *    drop to end-of-input, stray `<` that opens no tag is literal text,
  *    unknown entities stay literal — malformed fragments degrade to
  *    their raw characters rather than vanishing or raising;
  *  - deterministic: single forward scan, no locale/time dependence, so
  *    doc hashes are stable across re-reads and shards;
  *  - block-level tags (and `<br>`) become `\n` and the output is
  *    newline-delimited non-empty paragraphs — EXACTLY the unit grammar
  *    `TextAnalysis.paragraphUnitsOf` splits on (`split(text, "\n")`),
  *    so `dedup_paragraphs`/`dedup_lines` and the C4/Gopher filters run
  *    unchanged on crawl output;
  *  - `<script>`/`<style>`/`<template>` payloads and comments/CDATA/
  *    DOCTYPE/processing instructions are dropped wholesale: executable
  *    and presentation payloads are not corpus text;
  *  - per-document cost is O(n) in the HTML length with O(paragraph)
  *    buffering — the operator rides `mapPartitions` inside the one
  *    file = one task WARC read, so at 100 TB it scales with the file
  *    fleet exactly like the decode it follows.
  */
object HtmlText {

  /** Tags whose open OR close breaks the text flow (HTML5 block-ish set
    * plus table/list/heading structure); everything else is inline and
    * contributes no separator — `a<b>b</b>c` is `abc`, the usual
    * extractor convention.
    */
  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "dialog", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "header", "hgroup", "hr", "html", "legend", "li", "main", "menu",
    "nav", "ol", "option", "p", "pre", "section", "summary", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul")

  /** Raw-text elements whose payload is dropped wholesale. */
  private val DropTags: Set[String] = Set("script", "style", "template")

  /** HTML 4 named entities for the Latin-1 range plus the handful of
    * punctuation names a crawl actually contains; numeric references
    * cover the rest. `nbsp` maps to a plain space (it IS whitespace to
    * the paragraph grammar) and `shy` (soft hyphen) to nothing.
    */
  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "micro" -> "µ",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "iexcl" -> "¡", "iquest" -> "¿", "sect" -> "§",
    "para" -> "¶", "times" -> "×", "divide" -> "÷",
    "cent" -> "¢", "pound" -> "£", "yen" -> "¥",
    "euro" -> "€", "curren" -> "¤",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "bull" -> "•", "dagger" -> "†",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
    "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
    "iuml" -> "ï", "ntilde" -> "ñ", "ograve" -> "ò",
    "oacute" -> "ó", "ocirc" -> "ô", "otilde" -> "õ",
    "ouml" -> "ö", "oslash" -> "ø", "ugrave" -> "ù",
    "uacute" -> "ú", "ucirc" -> "û", "uuml" -> "ü",
    "yacute" -> "ý", "yuml" -> "ÿ", "szlig" -> "ß",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä",
    "Ccedil" -> "Ç", "Eacute" -> "É", "Ntilde" -> "Ñ",
    "Ouml" -> "Ö", "Uuml" -> "Ü")

  /** True when an HTTP Content-Type names an HTML payload (`text/html`,
    * `application/xhtml+xml`), parameters and case ignored.
    */
  def isHtmlContentType(ct: String): Boolean = {
    if (ct == null) return false
    val mime = ct.split(";", 2)(0).trim.toLowerCase(java.util.Locale.ROOT)
    mime == "text/html" || mime == "application/xhtml+xml"
  }

  /** HTML → newline-delimited paragraphs of entity-decoded text. Total
    * and deterministic on arbitrary (including malformed) input; never
    * throws.
    */
  def extract(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    // paragraph-grain whitespace state: spaces collapse within a line,
    // any number of breaks collapses to one '\n', and empty paragraphs
    // never reach the output
    var pendingSpace = false
    var pendingBreak = false
    var lineHasText = false
    // inside <pre> a literal newline IS a line break; everywhere else
    // source newlines are ordinary inter-word whitespace (HTML collapses
    // them) -- only block TAGS make paragraphs
    var preDepth = 0

    def emitChar(c: Char): Unit = {
      if (c == '\n' || c == '\r') {
        if (preDepth > 0) { if (lineHasText) { pendingBreak = true; lineHasText = false } }
        else if (lineHasText) pendingSpace = true
      } else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f') {
        if (lineHasText) pendingSpace = true
      } else {
        if (pendingBreak) { out.append('\n'); pendingBreak = false; pendingSpace = false }
        else if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
        lineHasText = true
      }
    }
    // after a break, lineHasText restarts false so leading whitespace on
    // the next paragraph is swallowed; emitChar sets it on the first glyph
    def emitBreak(): Unit = if (lineHasText) { pendingBreak = true; lineHasText = false }
    def emitText(s: String): Unit = {
      var i = 0
      while (i < s.length) { emitChar(s.charAt(i)); i += 1 }
    }

    // scan one entity starting at the '&' in position i; returns the
    // index just past it after emitting the decoded text, or emits the
    // literal '&' and returns i+1 when it parses as nothing
    def entity(i: Int): Int = {
      val semi = html.indexOf(';', i + 1)
      // entities are short; a far-away ';' means this '&' is literal
      if (semi < 0 || semi - i > 10) { emitChar('&'); return i + 1 }
      val name = html.substring(i + 1, semi)
      if (name.startsWith("#")) {
        val cp =
          try {
            if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
              Integer.parseInt(name.substring(2), 16)
            else Integer.parseInt(name.substring(1))
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 0x20 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
          emitText(new String(Character.toChars(cp)))
          semi + 1
        } else if (cp == 0x9 || cp == 0xa || cp == 0xd) { // whitespace refs
          emitChar(cp.toChar); semi + 1
        } else { emitChar('&'); i + 1 } // control/invalid: keep literal '&'
      } else Entities.get(name) match {
        case Some(rep) => emitText(rep); semi + 1
        case None => emitChar('&'); i + 1 // unknown name stays literal
      }
    }

    // skip past a tag's closing '>', honoring quoted attribute values
    // (a '>' inside "..." or '...' does not end the tag); -1 = unclosed
    def tagEnd(from: Int): Int = {
      var i = from
      var q = 0.toChar
      while (i < n) {
        val c = html.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '"' || c == '\'') q = c
        else if (c == '>') return i
        i += 1
      }
      -1
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '&') i = entity(i)
      else if (c != '<') { emitChar(c); i += 1 }
      else if (html.regionMatches(i, "<!--", 0, 4)) {
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3 // unclosed comment swallows the rest
      } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
        val end = html.indexOf("]]>", i + 9)
        i = if (end < 0) n else end + 3 // bogus-comment territory in HTML: drop
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        // DOCTYPE / processing instruction / bogus comment: to '>'
        val end = html.indexOf('>', i + 1)
        i = if (end < 0) n else end + 1
      } else {
        // a real tag wants </? ASCII-letter (the HTML5 tag-open rule:
        // '<3' is text); names may carry digits after the first letter
        var j = i + 1
        val closing = j < n && html.charAt(j) == '/'
        if (closing) j += 1
        def asciiLetter(c: Char): Boolean =
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        var k = j
        if (k < n && asciiLetter(html.charAt(k))) {
          k += 1
          while (k < n && (asciiLetter(html.charAt(k)) || html.charAt(k).isDigit)) k += 1
        }
        if (k == j) { emitChar('<'); i += 1 }
        else {
          val name = html.substring(j, k).toLowerCase(java.util.Locale.ROOT)
          val end = tagEnd(k)
          if (end < 0) i = n // unclosed tag swallows the rest
          else if (!closing && DropTags(name)) {
            // raw-text element: drop everything to its end tag (case-
            // insensitive); a missing end tag drops to end-of-input —
            // never let a script payload leak into corpus text. HTML5
            // requires the close-tag NAME be followed by whitespace, '/'
            // or '>' (end-of-input also closes): `</scripty>` must NOT
            // terminate a `<script>` block.
            var m = end + 1
            var found = -1
            while (found < 0 && m < n) {
              if (html.charAt(m) == '<' && m + 1 < n && html.charAt(m + 1) == '/' &&
                html.regionMatches(true, m + 2, name, 0, name.length) && {
                  val after = m + 2 + name.length
                  after >= n || {
                    val a = html.charAt(after)
                    a == '>' || a == '/' || a == ' ' || a == '\t' ||
                      a == '\n' || a == '\r' || a == '\f'
                  }
                }) found = m
              else m += 1
            }
            if (found < 0) i = n
            else {
              val close = html.indexOf('>', found)
              i = if (close < 0) n else close + 1
            }
            emitBreak() // script/style sit at block boundaries
          } else {
            if (name == "pre") {
              if (closing) preDepth = math.max(0, preDepth - 1)
              else preDepth += 1
            }
            if (BlockTags(name)) emitBreak()
            i = end + 1
          }
        }
      }
    }
    out.toString
  }
}
