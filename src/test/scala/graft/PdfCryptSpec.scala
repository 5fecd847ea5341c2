package graft

import graft.operators.Ingestion.PdfTextDecoder

/** Empty-user-password /Encrypt decryption (ISO 32000-1 §7.6 + ISO
  * 32000-2 §7.6.4): RC4, AES-128 and AES-256 (/R 5 and /R 6) documents
  * each extract bit-equal to their plaintext twin; a /V 4 /StmF Identity
  * document (streams unencrypted but /U still real) extracts rather than
  * mis-refusing; genuinely passworded documents (classic AND AES-256)
  * still refuse with the tagged reason; hex show strings decode (incl.
  * UTF-16BE) now that the show layer owns text decoding.
  *
  * The spec carries its own §7.6 reference arithmetic (RC4, Algorithms
  * 2/3/5, per-object keys, the 2.B iterated hash, AES-256 key wrapping)
  * so the documents are REAL cipher text a conforming writer would
  * produce, not fixtures tuned to the implementation.
  */
class PdfCryptSpec extends SparkSpec {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // ---- §7.6 reference arithmetic (test-side, independent spelling) ----

  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    for (i <- data.indices) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(i) = (data(i) ^ s((s(a) + s(b)) & 0xff)).toByte
    }
    out
  }

  private def le32(p: Int): Array[Byte] = Array(
    (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
    ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)

  /** Algorithm 3: /O for empty owner+user passwords (R ≥ 3 variant). */
  private def computeO(keyLen: Int): Array[Byte] = {
    var h = md5(Pad)
    for (_ <- 0 until 50) h = md5(h.take(keyLen))
    val ok = h.take(keyLen)
    var o = rc4(ok, Pad)
    for (i <- 1 to 19) o = rc4(ok.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 2: file key from the padded EMPTY user password. */
  private def fileKey(o32: Array[Byte], p: Int, id0: Array[Byte],
      keyLen: Int, r: Int): Array[Byte] = {
    var h = md5(Pad, o32, le32(p), id0)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(keyLen))
    h.take(keyLen)
  }

  /** Algorithm 5: /U for the empty user password (R ≥ 3) — 16 check
    * bytes + 16 bytes of arbitrary padding.
    */
  private def computeU(key: Array[Byte], id0: Array[Byte]): Array[Byte] = {
    var x = rc4(key, md5(Pad, id0))
    for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
    x ++ Array.fill(16)(0x5a.toByte)
  }

  /** Algorithm 1: per-object key. */
  private def objKey(key: Array[Byte], num: Int, gen: Int,
      aes: Boolean): Array[Byte] = {
    val salt = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val as = if (aes) Array[Byte](0x73, 0x41, 0x6c, 0x54) else Array.emptyByteArray
    md5(key, salt, as).take(math.min(key.length + 5, 16))
  }

  private def aesEncrypt(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val iv = Array.tabulate(16)(i => (i * 7 + 3).toByte) // fixed: determinism
    val padLen = 16 - (plain.length % 16)
    val padded = plain ++ Array.fill(padLen)(padLen.toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  // ---- ISO 32000-2 §7.6.4 reference arithmetic (AES-256, test-side) ----

  private def sha(bits: Int, data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance(s"SHA-$bits").digest(data)

  /** Algorithm 2.B as the writer computes it: iterated SHA-256/384/512
    * with an AES-128-CBC step, digest picked by Σ E[0,16) mod 3, stopping
    * after round ≥ 64 once E's last byte ≤ round − 32.
    */
  private def hash2B(pwd: Array[Byte], salt: Array[Byte]): Array[Byte] = {
    var k = sha(256, pwd ++ salt)
    var n = 0
    var e: Array[Byte] = null
    while (n < 64 || (e.last & 0xff) > n - 32) {
      val block = pwd ++ k
      val k1 = Iterator.fill(64)(block).flatten.toArray
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      k = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => sha(256, e)
        case 1 => sha(384, e)
        case 2 => sha(512, e)
      }
      n += 1
    }
    k.take(32)
  }

  /** Wrap the chosen 256-bit file key into /UE: AES-256-CBC under the
    * key-salt hash, zero IV, no padding (Algorithm 8 as a writer).
    */
  private def wrapUE(ikey: Array[Byte], fileKey256: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(fileKey256)
  }

  // ---- document assembly (PdfStructuredSpec's Builder shape) ----

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

  private val Id0 = "0123456789abcdef".getBytes(Latin1)
  private val IdHex = Id0.map("%02X".format(_)).mkString
  private val P = -44

  private def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  /** Two-page document; `encStream` encrypts each content stream with its
    * object identity (identity function = the plaintext twin).
    */
  private def twoPageDoc(encDict: Option[String],
      encStream: (Int, Array[Byte]) => Array[Byte]): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    b.streamObj(5, "", encStream(5, "BT 72 720 Td (Secret one) Tj ET".getBytes(Latin1)))
    b.streamObj(6, "", encStream(6, "BT 72 700 Td (Secret two) Tj ET".getBytes(Latin1)))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    b.obj(4, "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    encDict.foreach(d => b.obj(7, d))
    val encRef = if (encDict.isDefined) " /Encrypt 7 0 R" else ""
    b.classicXref(if (encDict.isDefined) Seq(1, 2, 3, 4, 5, 6, 7) else Seq(1, 2, 3, 4, 5, 6),
      s"<< /Size 8 /Root 1 0 R$encRef /ID [<$IdHex> <$IdHex>] >>")
    b.bytes
  }

  test("RC4-128 /V 2 /R 3 empty-user-password PDF extracts bit-equal to its plaintext twin") {
    val keyLen = 16
    val o = computeO(keyLen)
    val key = fileKey(o, P, Id0, keyLen, r = 3)
    val u = computeU(key, Id0)
    val encDict = s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $P >>"
    val enc = twoPageDoc(Some(encDict),
      (num, data) => rc4(objKey(key, num, 0, aes = false), data))
    val plain = twoPageDoc(None, (_, data) => data)
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got == PdfTextDecoder.decode(plain))
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
  }

  test("RC4-40 /V 1 /R 2 (the legacy 40-bit handler) decrypts too") {
    val keyLen = 5
    // R2's /O chain has no 50-pass loop and no 19 re-encrypts
    val ok = md5(Pad).take(keyLen)
    val o = rc4(ok, Pad)
    val key = fileKey(o, P, Id0, keyLen, r = 2)
    val u = rc4(key, Pad) // Algorithm 4
    val encDict = s"<< /Filter /Standard /V 1 /R 2 " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $P >>"
    val enc = twoPageDoc(Some(encDict),
      (num, data) => rc4(objKey(key, num, 0, aes = false), data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
  }

  test("AES-128 /V 4 /R 4 /AESV2 crypt filter decrypts (IV prefix + PKCS#7)") {
    val keyLen = 16
    val o = computeO(keyLen)
    val key = fileKey(o, P, Id0, keyLen, r = 4)
    val u = computeU(key, Id0)
    val encDict = s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      s"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
      s"/StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $P >>"
    val enc = twoPageDoc(Some(encDict),
      (num, data) => aesEncrypt(objKey(key, num, 0, aes = true), data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
  }

  test("a genuinely passworded document still refuses with the tagged reason") {
    val keyLen = 16
    val o = computeO(keyLen)
    // derive /U from a NON-empty user password: empty-password
    // verification must fail, and the text must never leak
    val userPad = ("hunter2".getBytes(Latin1) ++ Pad).take(32)
    var h = md5(userPad, o, le32(P), Id0)
    for (_ <- 0 until 50) h = md5(h.take(keyLen))
    val realKey = h.take(keyLen)
    var x = rc4(realKey, md5(Pad, Id0))
    for (i <- 1 to 19) x = rc4(realKey.map(b => (b ^ i).toByte), x)
    val u = x ++ Array.fill(16)(0x5a.toByte)
    val encDict = s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $P >>"
    val enc = twoPageDoc(Some(encDict),
      (num, data) => rc4(objKey(realKey, num, 0, aes = false), data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isLeft, "a passworded doc must refuse")
    assert(got.swap.exists(r => r.startsWith("encrypted:") && r.contains("password")),
      got.toString)
    assert(PdfTextDecoder.blocks(enc).isEmpty)
  }

  test("unsupported schemes refuse tagged: unknown /V and a custom handler") {
    val v9 = twoPageDoc(Some("<< /Filter /Standard /V 9 /R 9 " +
      s"/O <${"00" * 48}> /U <${"00" * 48}> /P $P >>"), (_, d) => d)
    val g9 = PdfTextDecoder.decode(v9)
    assert(g9.isLeft && g9.swap.exists(r =>
      r.startsWith("encrypted:") && r.contains("unsupported")), g9.toString)
    val custom = twoPageDoc(Some("<< /Filter /MyDRM /V 2 /R 3 " +
      s"/O <${"00" * 32}> /U <${"00" * 32}> /P $P >>"), (_, d) => d)
    val gc = PdfTextDecoder.decode(custom)
    assert(gc.isLeft && gc.swap.exists(r =>
      r.startsWith("encrypted:") && r.contains("non-standard")), gc.toString)
  }

  // ---- AES-256 (/V 5) and /StmF Identity ----

  private val VSalt = Array.tabulate(8)(i => (i * 11 + 1).toByte)
  private val KSalt = Array.tabulate(8)(i => (i * 13 + 5).toByte)
  private val FileKey256 = Array.tabulate(32)(i => (i * 17 + 9).toByte)

  /** Assemble the /V 5 /Encrypt dict: /U = hash ‖ vsalt ‖ ksalt, /UE =
    * wrapped file key; /O//OE are unused by the user-password path but a
    * conforming dict carries them (48 arbitrary bytes / 32 here).
    */
  private def v5Dict(r: Int, uHash: Array[Byte], ue: Array[Byte]): String = {
    val u = uHash ++ VSalt ++ KSalt
    s"<< /Filter /Standard /V 5 /R $r /Length 256 " +
      s"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> " +
      s"/StmF /StdCF /StrF /StdCF " +
      s"/O <${"a5" * 48}> /OE <${"b6" * 32}> " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> /P $P >>"
  }

  test("AES-256 /V 5 /R 6 empty-user-password PDF extracts bit-equal to its plaintext twin") {
    val none = Array.emptyByteArray
    val uHash = hash2B(none, VSalt)
    val ue = wrapUE(hash2B(none, KSalt), FileKey256)
    // V5 streams encrypt under the FILE key directly — no per-object salt
    val enc = twoPageDoc(Some(v5Dict(6, uHash, ue)),
      (_, data) => aesEncrypt(FileKey256, data))
    val plain = twoPageDoc(None, (_, data) => data)
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got == PdfTextDecoder.decode(plain))
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
  }

  test("AES-256 /V 5 /R 5 (single-SHA-256 hash, the deprecated revision) decrypts too") {
    val uHash = sha(256, VSalt)
    val ue = wrapUE(sha(256, KSalt), FileKey256)
    val enc = twoPageDoc(Some(v5Dict(5, uHash, ue)),
      (_, data) => aesEncrypt(FileKey256, data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
  }

  test("a /V 5 dict whose StdCF names a non-AESV3 method refuses tagged, never decrypts as AES-256") {
    val none = Array.emptyByteArray
    val uHash = hash2B(none, VSalt)
    val ue = wrapUE(hash2B(none, KSalt), FileKey256)
    // same conforming dict but /CFM /V2 — ISO 32000-2 defines only AESV3
    // for V5; silently decrypting this as AES-256 would be a lie
    val u = uHash ++ VSalt ++ KSalt
    val dict = s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      s"/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen >> >> " +
      s"/StmF /StdCF /StrF /StdCF " +
      s"/O <${"a5" * 48}> /OE <${"b6" * 32}> " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> /P $P >>"
    val enc = twoPageDoc(Some(dict), (_, data) => aesEncrypt(FileKey256, data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isLeft, "non-AESV3 /CFM under /V 5 must refuse")
    assert(got.swap.exists(r =>
      r.startsWith("encrypted:") && r.contains("crypt filter method")), got.toString)
  }

  test("a genuinely passworded AES-256 document refuses; text never leaks") {
    val pwd = "hunter2".getBytes(Latin1)
    val uHash = hash2B(pwd, VSalt)
    val ue = wrapUE(hash2B(pwd, KSalt), FileKey256)
    val enc = twoPageDoc(Some(v5Dict(6, uHash, ue)),
      (_, data) => aesEncrypt(FileKey256, data))
    val got = PdfTextDecoder.decode(enc)
    assert(got.isLeft, "a passworded AES-256 doc must refuse")
    assert(got.swap.exists(r => r.startsWith("encrypted:") && r.contains("password")),
      got.toString)
    assert(PdfTextDecoder.blocks(enc).isEmpty)
  }

  test("/V 4 /StmF Identity: streams pass through but /U still verifies with the real key") {
    val keyLen = 16
    val o = computeO(keyLen)
    val key = fileKey(o, P, Id0, keyLen, r = 4)
    val u = computeU(key, Id0)
    // streams are NOT encrypted (Identity), yet /O//U are the real
    // /Length 128 values — a reader deriving a bogus short key would
    // fail /U and mis-refuse this perfectly readable document
    val encDict = s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      s"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
      s"/StmF /Identity /StrF /Identity " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $P >>"
    val enc = twoPageDoc(Some(encDict), (_, data) => data)
    val got = PdfTextDecoder.decode(enc)
    assert(got.isRight, got.toString)
    assert(got.toOption.get.map(_.text) == Seq("Secret one", "Secret two"))
    // and a passworded Identity doc still refuses: pass-through never
    // skips authentication
    val userPad = ("hunter2".getBytes(Latin1) ++ Pad).take(32)
    var h = md5(userPad, o, le32(P), Id0)
    for (_ <- 0 until 50) h = md5(h.take(keyLen))
    val realKey = h.take(keyLen)
    var x = rc4(realKey, md5(Pad, Id0))
    for (i <- 1 to 19) x = rc4(realKey.map(b => (b ^ i).toByte), x)
    val uBad = x ++ Array.fill(16)(0x5a.toByte)
    val encBad = twoPageDoc(Some(s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      s"/CF << /StdCF << /CFM /AESV2 >> >> /StmF /Identity " +
      s"/O <${hex(o)}> /U <${hex(uBad)}> /P $P >>"), (_, data) => data)
    val gotBad = PdfTextDecoder.decode(encBad)
    assert(gotBad.isLeft && gotBad.swap.exists(_.contains("password")), gotBad.toString)
  }

  test("hex show strings decode at the show layer: plain bytes and UTF-16BE BOM") {
    val b = new Builder
    b.raw("%PDF-1.4\n")
    // <48656C6C6F> = "Hello"; <FEFF0048012B> = UTF-16BE "Hī"
    b.streamObj(4, "",
      "BT 72 720 Td <48656C6C6F> Tj ET BT 72 700 Td <FEFF0048012B> Tj ET"
        .getBytes(Latin1))
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.classicXref(Seq(1, 2, 3, 4), "<< /Size 5 /Root 1 0 R >>")
    val got = PdfTextDecoder.blocks(b.bytes)
    assert(got.map(_.text) == Seq("Hello", "Hī"), got.toString)
  }
}
