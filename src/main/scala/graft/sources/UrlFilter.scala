package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{GraftConf, Intermediates}

/** URL-grain crawl hygiene (SURVEY §2B) — the C4/RefinedWeb rung that
  * runs at the FRONT DOOR, before any content is tokenized: Raffel et
  * al. 2020 §2.2 and Penedo et al. 2023 §3.1 both drop documents on URL
  * evidence alone (blocklisted words, non-document extensions, junk
  * schemes) because it is orders of magnitude cheaper than content
  * filtering and catches whole classes the content lanes pay dearly
  * for. Together with `host_cap_sample` (host grain) this closes the
  * URL-structure half of the curation funnel.
  *
  * Decisions are COLUMN-NATIVE (when/regexp_extract/contains chains —
  * whole-stage codegen, no UDF) and deterministic; the blocked side is
  * returned as a first-class frame with the tagged reason, the
  * quarantine discipline every front-door seam here follows — a crawl
  * operator drops nothing silently. Test-only seam (no oracle row BY
  * DESIGN): the synthetic corpus carries no URLs — the operator lives
  * on the WARC record frame, and UrlFilterSpec proves the
  * readWarc → urlFilter → toDocuments composition.
  */
object UrlFilter {

  /** Extensions that name non-document payloads: media, styling, code,
    * fonts, archives, executables. A crawl's TEXT pipeline has no
    * business tokenizing any of these even when the server mislabels
    * the Content-Type.
    */
  private[sources] val BlockedExts: Seq[String] = Seq(
    "jpg", "jpeg", "png", "gif", "webp", "bmp", "ico", "svg", "tif", "tiff",
    "css", "js", "mjs", "map", "json", "xml", "rss", "atom",
    "woff", "woff2", "ttf", "otf", "eot",
    "mp3", "mp4", "m4a", "m4v", "avi", "mov", "webm", "mkv", "wav", "ogg",
    "zip", "gz", "tgz", "bz2", "xz", "7z", "rar", "tar",
    "exe", "dmg", "apk", "msi", "iso", "bin", "swf")

  /** Drop reason for a target URI, NULL = keep. Rules in evidence-cost
    * order: presence, scheme, length, extension, blocklisted words
    * (`spark.graft.url.blockWords`, matched on the lowercased URL).
    */
  private[sources] def dropReason(url: Column): Column = {
    val u = lower(url)
    val path = regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val ext = regexp_extract(path, "\\.([a-z0-9]{1,5})$", 1)
    val blockWords = GraftConf.urlBlockWords
    val wordHit =
      if (blockWords.isEmpty) lit(false)
      else blockWords.map(w => u.contains(w)).reduce(_ || _)
    when(url.isNull || length(trim(url)) === 0, "missing url")
      .when(!(u.startsWith("http://") || u.startsWith("https://")),
        "non-http scheme")
      .when(length(url) > GraftConf.urlMaxLen, "url too long")
      .when(ext.isin(BlockedExts: _*), concat(lit("blocked extension ."), ext))
      .when(wordHit, "blocked word")
  }

  /** Split a [[Warc.readWarc]] record frame on URL evidence:
    * (kept records unchanged, dropped as (path, offset, target_uri,
    * reason)). Run it BEFORE [[Warc.toDocuments]] — the point is that a
    * blocked URL never costs a decode, a tokenize, or a dedup shingle.
    * Records without a target URI drop here too ("missing url"): the
    * text-bearing record types this feeds always carry one, and crawl
    * bookkeeping (warcinfo/request/metadata) is excluded by the bridge
    * anyway.
    */
  def apply(records: DataFrame): (DataFrame, DataFrame) = {
    val tagged = Intermediates.persist(
      records.withColumn("url_drop", dropReason(col("target_uri"))))
    (tagged.filter(col("url_drop").isNull).drop("url_drop"),
      tagged.filter(col("url_drop").isNotNull)
        .select(col("path"), col("offset"), col("target_uri"),
          col("url_drop").as("reason")))
  }
}
