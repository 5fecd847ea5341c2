package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.operators.{Classify, NbIndex, TextAnalysis}
import graft.sources.Warc

/** The crawl → curation language seam: a stored NB LID model labels a
  * lang-less WARC-bridged corpus, existing labels win, abstentions stay
  * NULL, and the labeled frame drives `ccnet_filter`'s per-language
  * machinery with no adapter.
  */
class LangIdApplySpec extends SparkSpec {

  private val Iso = StandardCharsets.ISO_8859_1
  private val Utf8 = StandardCharsets.UTF_8

  // same-script lookalike corpora (ClassifySpec's fixture shape): the
  // trigram distributions are disjoint, so a trained model must split
  // them even though a stopword heuristic ties
  private val DeCore = "verwaltung eigenschaft freundlichkeit zusammenarbeit"
  private val EnCore = "nation wondering weathering motivation understanding"

  private def trainedModel(): String = {
    import spark.implicits._
    val labeled = (0L until 60L).map { i =>
      if (i % 2 == 0) (i, s"$DeCore $DeCore $DeCore", "de")
      else (i, s"$EnCore $EnCore $EnCore", "en")
    }.toDF("doc_id", "text", "lang")
    val path = Files.createTempDirectory("graft_lid_model").toString
    NbIndex.writeNbDocs(labeled, path, "chartri")
    path
  }

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

  private def crawlDocs() = {
    val pages = (0 until 9).map { i =>
      val (host, body) =
        if (i % 3 == 0) (s"de$i.example.org", s"<p>$DeCore</p><p>$DeCore $DeCore</p>")
        else (s"en$i.example.org", s"<p>$EnCore</p><p>$EnCore $EnCore</p>")
      htmlResponse(host, s"<html><body>$body</body></html>")
    }
    val dir = Files.createTempDirectory("graft_lid_warc")
    val path = dir.resolve("seg.warc.gz")
    Files.write(path, pages.map(gz).reduce(_ ++ _))
    Warc.toDocuments(Warc.readWarc(spark, path.toString)._1)
  }

  test("WARC-bridged documents arrive lang-NULL and leave labeled per host language") {
    val modelPath = trainedModel()
    val docs = crawlDocs()
    assert(docs.collect().forall(r => r.isNullAt(r.fieldIndex("lang"))),
      "toDocuments must leave lang NULL — LID is downstream's job")
    val labeled = Classify.langIdApply(spark, modelPath, docs)
    assert(labeled.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    val got = labeled.collect().map(r =>
      r.getAs[String]("source") -> r.getAs[String]("lang"))
    assert(got.nonEmpty)
    got.foreach { case (src, lang) =>
      val want = if (src.startsWith("de")) "de" else "en"
      assert(lang == want, s"$src predicted $lang, wanted $want")
    }
    // determinism: a second pass produces the identical labeling
    val again = Classify.langIdApply(spark, modelPath, docs)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[String]("lang"))
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("existing labels win; scorer abstentions stay NULL") {
    import spark.implicits._
    val modelPath = trainedModel()
    val docs = Seq(
      // pre-labeled: the source said 'fr' and the model would say 'de' —
      // apply must NOT overrule the source
      (1L, s"$DeCore $DeCore", "fr", "pre.example.org", 40L),
      // too short for a single trigram: the scorer abstains → NULL
      (2L, "ab", null.asInstanceOf[String], "tiny.example.org", 2L),
      (3L, s"$EnCore $EnCore", null.asInstanceOf[String], "en.example.org", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Classify.langIdApply(spark, modelPath, docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(got(1L) == "fr", s"existing label must win, got ${got(1L)}")
    assert(got(2L) == null, s"abstention must stay NULL, got ${got(2L)}")
    assert(got(3L) == "en")
  }

  test("the labeled crawl drives ccnet_filter's per-language terciles directly") {
    val modelPath = trainedModel()
    val labeled = Classify.langIdApply(spark, modelPath, crawlDocs())
    val out = TextAnalysis.ccnetFilterOf(labeled)
    val rows = out.collect()
    assert(rows.nonEmpty, "ccnet_filter must produce rows from the labeled crawl")
    // every bucket decision is keyed on a PREDICTED language — the seam
    // the operator needed and the wire format could not provide
    val langs = labeled.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("de", "en"), langs.toString)
  }

  test("a conf-drifted or word-trained model fails fast instead of mislabeling") {
    import spark.implicits._
    val labeled = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) DeCore else EnCore,
        if (i % 2 == 0) "de" else "en")).toDF("doc_id", "text", "lang")
    val path = Files.createTempDirectory("graft_lid_words").toString
    NbIndex.writeNbDocs(labeled, path, "words")
    // a words-trained model scores with WORD features (stamp-resolved) —
    // legitimate; but a knob drift between train and apply must throw
    val docs = Seq((9L, EnCore, null.asInstanceOf[String], "x.org", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Classify.langIdApply(spark, path, docs)
      .collect().head.getAs[String]("lang") == "en")
    spark.conf.set("spark.graft.nb.evalMod", "7")
    try {
      val e = intercept[IllegalStateException] {
        Classify.langIdApply(spark, path, docs).collect()
      }
      assert(e.getMessage.contains("conf"), e.getMessage)
    } finally spark.conf.unset("spark.graft.nb.evalMod")
  }
}
