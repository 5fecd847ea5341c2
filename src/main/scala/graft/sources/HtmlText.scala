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
  *
  * The same single scan also counts, per paragraph, the characters
  * emitted inside `<a>…</a>` — the link-density signal jusText/boiler-
  * pipe use to separate navigation chrome from body prose. [[extract]]
  * returns every paragraph (byte-stable with prior rounds);
  * [[extractPruned]] drops short, link-dominated paragraphs (the
  * boilerplate_prune rung), thresholds passed in at PLAN time by the
  * caller so executors never read session conf.
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

  /** HTML named character references — the full HTML4 table (Latin-1,
    * Greek, math, arrows, letterlike, punctuation: the WHATWG HTML5
    * table's ≤10-char core, which is what a crawl actually contains)
    * plus the HTML5 additions a corpus meets (`apos`, `numero`).
    * Matching is case-SENSITIVE like the spec table. Whitespace-class
    * names map into the paragraph grammar: `nbsp`/`ensp`/`emsp`/
    * `thinsp` are word separators, `shy` (soft hyphen) and the
    * zero-width/bidi format controls (`zwnj`/`zwj`/`lrm`/`rlm`) are
    * not corpus glyphs and decode to nothing. Unknown names stay
    * literal (the HTML5 no-semicolon-match fallback).
    */
  private val Entities: Map[String, String] = Map(
    // XML core + HTML5 apos
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    // whitespace / format controls
    "nbsp" -> " ", "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "shy" -> "", "zwnj" -> "", "zwj" -> "", "lrm" -> "", "rlm" -> "",
    // Latin-1 punctuation & signs (U+00A1–U+00BF, U+00D7, U+00F7)
    "iexcl" -> "¡", "cent" -> "¢", "pound" -> "£", "curren" -> "¤",
    "yen" -> "¥", "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
    "copy" -> "©", "ordf" -> "ª", "laquo" -> "«", "not" -> "¬",
    "reg" -> "®", "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
    "sup2" -> "²", "sup3" -> "³", "acute" -> "´", "micro" -> "µ",
    "para" -> "¶", "middot" -> "·", "cedil" -> "¸", "sup1" -> "¹",
    "ordm" -> "º", "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
    "frac34" -> "¾", "iquest" -> "¿", "times" -> "×", "divide" -> "÷",
    // Latin-1 letters, uppercase
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â", "Atilde" -> "Ã",
    "Auml" -> "Ä", "Aring" -> "Å", "AElig" -> "Æ", "Ccedil" -> "Ç",
    "Egrave" -> "È", "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î", "Iuml" -> "Ï",
    "ETH" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocirc" -> "Ô", "Otilde" -> "Õ", "Ouml" -> "Ö", "Oslash" -> "Ø",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucirc" -> "Û", "Uuml" -> "Ü",
    "Yacute" -> "Ý", "THORN" -> "Þ", "szlig" -> "ß",
    // Latin-1 letters, lowercase
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
    "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
    "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocirc" -> "ô", "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û", "uuml" -> "ü",
    "yacute" -> "ý", "thorn" -> "þ", "yuml" -> "ÿ",
    // Latin Extended / letterlike
    "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š", "scaron" -> "š",
    "Yuml" -> "Ÿ", "fnof" -> "ƒ", "circ" -> "ˆ", "tilde" -> "˜",
    // Greek, uppercase
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ", "Delta" -> "Δ",
    "Epsilon" -> "Ε", "Zeta" -> "Ζ", "Eta" -> "Η", "Theta" -> "Θ",
    "Iota" -> "Ι", "Kappa" -> "Κ", "Lambda" -> "Λ", "Mu" -> "Μ",
    "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο", "Pi" -> "Π",
    "Rho" -> "Ρ", "Sigma" -> "Σ", "Tau" -> "Τ", "Upsilon" -> "Υ",
    "Phi" -> "Φ", "Chi" -> "Χ", "Psi" -> "Ψ", "Omega" -> "Ω",
    // Greek, lowercase + symbol variants
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ", "delta" -> "δ",
    "epsilon" -> "ε", "zeta" -> "ζ", "eta" -> "η", "theta" -> "θ",
    "iota" -> "ι", "kappa" -> "κ", "lambda" -> "λ", "mu" -> "μ",
    "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο", "pi" -> "π",
    "rho" -> "ρ", "sigmaf" -> "ς", "sigma" -> "σ", "tau" -> "τ",
    "upsilon" -> "υ", "phi" -> "φ", "chi" -> "χ", "psi" -> "ψ",
    "omega" -> "ω", "thetasym" -> "ϑ", "upsih" -> "ϒ", "piv" -> "ϖ",
    // general punctuation
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
    "sbquo" -> "‚", "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•", "hellip" -> "…",
    "permil" -> "‰", "prime" -> "′", "Prime" -> "″", "lsaquo" -> "‹",
    "rsaquo" -> "›", "oline" -> "‾", "frasl" -> "⁄", "euro" -> "€",
    "numero" -> "№",
    // letterlike symbols
    "weierp" -> "℘", "image" -> "ℑ", "real" -> "ℜ", "trade" -> "™",
    "alefsym" -> "ℵ",
    // arrows
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "crarr" -> "↵", "lArr" -> "⇐", "uArr" -> "⇑",
    "rArr" -> "⇒", "dArr" -> "⇓", "hArr" -> "⇔",
    // mathematical operators
    "forall" -> "∀", "part" -> "∂", "exist" -> "∃", "empty" -> "∅",
    "nabla" -> "∇", "isin" -> "∈", "notin" -> "∉", "ni" -> "∋",
    "prod" -> "∏", "sum" -> "∑", "minus" -> "−", "lowast" -> "∗",
    "radic" -> "√", "prop" -> "∝", "infin" -> "∞", "ang" -> "∠",
    "and" -> "∧", "or" -> "∨", "cap" -> "∩", "cup" -> "∪",
    "int" -> "∫", "there4" -> "∴", "sim" -> "∼", "cong" -> "≅",
    "asymp" -> "≈", "ne" -> "≠", "equiv" -> "≡", "le" -> "≤",
    "ge" -> "≥", "sub" -> "⊂", "sup" -> "⊃", "nsub" -> "⊄",
    "sube" -> "⊆", "supe" -> "⊇", "oplus" -> "⊕", "otimes" -> "⊗",
    "perp" -> "⊥", "sdot" -> "⋅",
    // technical / geometric / misc symbols
    "lceil" -> "⌈", "rceil" -> "⌉", "lfloor" -> "⌊", "rfloor" -> "⌋",
    "lang" -> "⟨", "rang" -> "⟩", "loz" -> "◊", "spades" -> "♠",
    "clubs" -> "♣", "hearts" -> "♥", "diams" -> "♦")

  /** True when an HTTP Content-Type names an HTML payload (`text/html`,
    * `application/xhtml+xml`), parameters and case ignored.
    */
  def isHtmlContentType(ct: String): Boolean = {
    if (ct == null) return false
    val mime = ct.split(";", 2)(0).trim.toLowerCase(java.util.Locale.ROOT)
    mime == "text/html" || mime == "application/xhtml+xml"
  }

  /** One extracted paragraph: entity-decoded text plus how many of its
    * characters were emitted inside `<a>…</a>` — the link-density signal.
    */
  final case class Para(text: String, anchorChars: Int) {
    def words: Int = if (text.isEmpty) 0 else text.count(_ == ' ') + 1
  }

  /** HTML → newline-delimited paragraphs of entity-decoded text. Total
    * and deterministic on arbitrary (including malformed) input; never
    * throws. Byte-identical to joining [[extractParagraphs]] with `\n`.
    */
  def extract(html: String): String = {
    val ps = extractParagraphs(html)
    if (ps.isEmpty) return ""
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ps.length) {
      if (i > 0) sb.append('\n')
      sb.append(ps(i).text)
      i += 1
    }
    sb.toString
  }

  /** [[extract]] with the jusText-lite boilerplate rung: a paragraph
    * whose anchor-character share exceeds `maxLinkPct` percent AND whose
    * word count is at most `maxShortWords` is navigation chrome (menu,
    * footer link row, breadcrumb), not body prose, and drops. Long
    * paragraphs survive regardless (prose legitimately carries links);
    * link-free short paragraphs survive (headings, captions). The
    * comparison is exact integer math (`anchor·100 > len·pct`) — the
    * quality_filter discipline. Thresholds arrive as ARGUMENTS, captured
    * at plan time by the caller, so this stays a pure executor-side
    * function.
    */
  def extractPruned(html: String, maxLinkPct: Int, maxShortWords: Int): String = {
    val ps = extractParagraphs(html)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var first = true
    while (i < ps.length) {
      val p = ps(i)
      val linky = p.anchorChars.toLong * 100 > p.text.length.toLong * maxLinkPct
      if (!(linky && p.words <= maxShortWords)) {
        if (!first) sb.append('\n')
        sb.append(p.text)
        first = false
      }
      i += 1
    }
    sb.toString
  }

  /** The single-scan core: HTML → non-empty paragraphs with per-paragraph
    * anchor-character counts. Total and deterministic; never throws.
    */
  def extractParagraphs(html: String): Vector[Para] = {
    if (html == null || html.isEmpty) return Vector.empty
    val n = html.length
    val out = Vector.newBuilder[Para]
    val cur = new java.lang.StringBuilder(64)
    // paragraph-grain whitespace state: spaces collapse within a line,
    // any number of breaks collapses to one paragraph boundary, and
    // empty paragraphs never reach the output
    var pendingSpace = false
    var curAnchor = 0
    // inside <pre> a literal newline IS a line break; everywhere else
    // source newlines are ordinary inter-word whitespace (HTML collapses
    // them) -- only block TAGS make paragraphs
    var preDepth = 0
    // <a> nesting depth — chars emitted while > 0 count toward the
    // paragraph's anchorChars (anchors may span paragraph boundaries)
    var anchorDepth = 0

    def flush(): Unit = if (cur.length > 0) {
      out += Para(cur.toString, curAnchor)
      cur.setLength(0)
      curAnchor = 0
      pendingSpace = false
    }

    def emitChar(c: Char): Unit = {
      if (c == '\n' || c == '\r') {
        if (preDepth > 0) flush()
        else if (cur.length > 0) pendingSpace = true
      } else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f') {
        if (cur.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) {
          cur.append(' ')
          if (anchorDepth > 0) curAnchor += 1
          pendingSpace = false
        }
        cur.append(c)
        if (anchorDepth > 0) curAnchor += 1
      }
    }
    def emitBreak(): Unit = flush()
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
            if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else anchorDepth += 1
            }
            if (BlockTags(name)) emitBreak()
            i = end + 1
          }
        }
      }
    }
    flush()
    out.result()
  }
}
