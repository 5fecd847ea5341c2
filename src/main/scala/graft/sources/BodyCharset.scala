package graft.sources

import java.nio.charset.{Charset, StandardCharsets}

/** Charset resolution for crawl payload bytes (SURVEY §2B) — the decode
  * rung between [[Warc]]'s record parse and the text the curation stack
  * sees. A real crawl is NOT UTF-8: a large minority of pages declare
  * (or silently are) windows-1252/-1251, Shift_JIS, GBK, EUC-KR, …, and
  * an unconditional UTF-8 decode garbles every non-ASCII byte of them
  * into U+FFFD before any downstream operator can recover. The reference
  * pipeline is single-PDF and has no crawl decode at all — this is the
  * engine's own front-door rung, the same resolution every production
  * fetcher runs (WHATWG HTML §13.2.3 "determining the character
  * encoding", the published, deterministic algorithm).
  *
  * Resolution chain, in WHATWG precedence order:
  *  1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — a BOM wins over
  *     every declaration, and is consumed;
  *  2. the `charset=` parameter of the transport Content-Type (for a
  *     `response` record the PEELED HTTP header; for conversion/resource
  *     records the WARC-level one). An unknown/unsupported label
  *     degrades to the legacy UTF-8 decode — never a throw;
  *  3. the WHATWG meta prescan over the leading 1024 bytes
  *     (`<meta charset=…>` / `<meta http-equiv=content-type …>`), with
  *     the spec's two corrections (a UTF-16 family prescan result means
  *     the markup itself decoded as ASCII → read as UTF-8;
  *     `x-user-defined` → windows-1252);
  *  4. strict UTF-8 validity check → UTF-8 (the spec's optional "UTF-8
  *     detection" step; this is what keeps the WET/UTF-8 lanes
  *     bit-identical to the pre-charset decoder — undeclared valid
  *     UTF-8 never reroutes through the legacy fallback);
  *  5. windows-1252 — the web's legacy default (what browsers use for
  *     an undeclared non-UTF-8 Latin page).
  *
  * Determinism/scale posture: pure byte arithmetic per document, no
  * locale or heuristic language models, O(min(n, 1024)) sniffing +
  * O(n) decode, total on arbitrary input (malformed sequences decode
  * to U+FFFD via the String constructor, never a throw) — rides the
  * same one-file-one-task `mapPartitions` as the WARC decode itself.
  */
private[graft] object BodyCharset {

  /** WHATWG label → canonical JDK charset name for the labels whose
    * browser meaning DIFFERS from (or is missing in) the JDK alias
    * table: every Latin-1/ASCII label decodes as windows-1252 on the
    * web, `shift_jis` means the windows-31j superset, `gb2312` means
    * GBK, bare `unicode`/`utf-16` mean UTF-16LE (the no-BOM default).
    * Everything else resolves through `Charset.forName`'s own aliases.
    */
  private val Remap: Map[String, String] = Map(
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "iso_8859-1" -> "windows-1252", "latin1" -> "windows-1252",
    "l1" -> "windows-1252", "cp819" -> "windows-1252",
    "iso-ir-100" -> "windows-1252", "us-ascii" -> "windows-1252",
    "ascii" -> "windows-1252", "ansi_x3.4-1968" -> "windows-1252",
    "x-user-defined" -> "windows-1252",
    "iso-8859-9" -> "windows-1254", "iso8859-9" -> "windows-1254",
    "latin5" -> "windows-1254",
    "iso-8859-11" -> "x-windows-874", "tis-620" -> "x-windows-874",
    "shift_jis" -> "windows-31j", "shift-jis" -> "windows-31j",
    "sjis" -> "windows-31j", "x-sjis" -> "windows-31j",
    "ms_kanji" -> "windows-31j",
    "gb2312" -> "GBK", "gb_2312" -> "GBK", "gb_2312-80" -> "GBK",
    "chinese" -> "GBK", "csgb2312" -> "GBK",
    "ks_c_5601-1987" -> "EUC-KR", "korean" -> "EUC-KR",
    "csksc56011987" -> "EUC-KR",
    "unicode" -> "UTF-16LE", "utf-16" -> "UTF-16LE", "ucs-2" -> "UTF-16LE")

  /** A charset label (from a Content-Type parameter or a meta tag) →
    * JDK Charset; None for anything the chain should fall past. Labels
    * are trimmed, unquoted, lowercased before lookup — the WHATWG
    * normalization.
    */
  private[graft] def resolveLabel(label: String): Option[Charset] = {
    if (label == null) return None
    val t = label.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim
      .toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) return None
    val name = Remap.getOrElse(t, t)
    try {
      val cs = Charset.forName(name)
      Some(cs)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The `charset=` parameter of a Content-Type header value, raw
    * (unresolved); None when absent.
    */
  private[graft] def charsetParam(contentType: String): Option[String] = {
    if (contentType == null) return None
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("charset=")
    if (i < 0) return None
    val rest = contentType.substring(i + 8)
    val end = rest.indexWhere(c => c == ';' || c == ' ' || c == '\t')
    Some(if (end < 0) rest else rest.substring(0, end))
  }

  private val MetaCharset = java.util.regex.Pattern.compile(
    """(?i)<meta[^>]{0,512}?charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""")

  /** WHATWG prescan, simplified deterministic form: the first
    * `<meta … charset=…>` (covering both the charset attribute and the
    * `http-equiv` `content="…; charset=…"` spelling — the label follows
    * `charset=` either way) within the leading 1024 bytes. Returns the
    * raw label; the caller applies the UTF-16→UTF-8 correction.
    */
  private[graft] def prescanMeta(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.isEmpty) return None
    val head = new String(bytes, 0, math.min(bytes.length, 1024),
      StandardCharsets.ISO_8859_1)
    val m = MetaCharset.matcher(head)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Strict UTF-8 validity (malformed sequences and unmappable input
    * both fail) — the gate that keeps undeclared valid-UTF-8 bodies on
    * the UTF-8 path instead of the windows-1252 fallback.
    */
  private[graft] def isValidUtf8(bytes: Array[Byte]): Boolean =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes))
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Payload bytes + transport Content-Type → text, via the full chain.
    * Total on arbitrary input; never throws (malformed sequences under
    * the chosen charset decode to U+FFFD).
    */
  def decode(bytes: Array[Byte], contentType: String): String = {
    if (bytes == null || bytes.isEmpty) return ""
    // 1. BOM — consumed, wins over every declaration
    if (bytes.length >= 3 && bytes(0) == 0xef.toByte &&
        bytes(1) == 0xbb.toByte && bytes(2) == 0xbf.toByte)
      return new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
    if (bytes.length >= 2 && bytes(0) == 0xff.toByte && bytes(1) == 0xfe.toByte)
      return new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE)
    if (bytes.length >= 2 && bytes(0) == 0xfe.toByte && bytes(1) == 0xff.toByte)
      return new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE)
    // 2. transport-declared charset; an unknown label degrades to the
    //    legacy UTF-8 decode (the pre-charset behavior), never a throw
    charsetParam(contentType) match {
      case Some(label) =>
        return new String(bytes, resolveLabel(label).getOrElse(StandardCharsets.UTF_8))
      case None =>
    }
    // 3. meta prescan. A UTF-16 prescan result is self-refuting (the
    //    markup itself just decoded as ASCII-compatible) → UTF-8, the
    //    WHATWG correction.
    prescanMeta(bytes).flatMap(resolveLabel) match {
      case Some(cs) =>
        val name = cs.name.toUpperCase(java.util.Locale.ROOT)
        return new String(bytes,
          if (name.startsWith("UTF-16")) StandardCharsets.UTF_8 else cs)
      case None =>
    }
    // 4./5. UTF-8 detection, else the web's legacy windows-1252 default
    if (isValidUtf8(bytes)) new String(bytes, StandardCharsets.UTF_8)
    else new String(bytes, Charset.forName("windows-1252"))
  }
}
