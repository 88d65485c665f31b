package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PdfCrypt, PdfEncryptEncode, PdfPageTexts}

/** The PDF standard security handler, empty user password
  * (plans.PdfCrypt behind plans.PdfPageTexts). Pins: the full mode
  * matrix round trips (V1/R2 RC4-40, V2/R3 RC4-128, V4/R4 AESV2 with
  * both /EncryptMetadata branches, V5/R6 AESV3 with Algorithm 2.B),
  * the decline envelope (a NON-empty user password via a tampered /U,
  * tampered ciphertext under AES padding, a missing /ID, unsupported
  * /V), the crypto primitives against fixed reference vectors, and
  * the never-throw law. */
class PdfEncSpec extends AnyFunSuite {

  private def pages(b: Array[Byte]): Seq[String] = {
    val arr = PdfPageTexts.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
    }
  }

  test("the mode matrix round trips: RC4-40, RC4-128, AESV2, AESV3/R6, StmF-Identity") {
    for (mode <- 0 to 4; seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 156L, 4242L);
        n <- Seq(1, 2, 3)) {
      val got = pages(PdfEncryptEncode.encode(seed, n, mode))
      assert(got != null, s"mode=$mode seed=$seed n=$n declined")
      assert(got === (0 until n).map(PdfEncryptEncode.decodedPage(seed, _)),
        s"mode=$mode seed=$seed n=$n")
    }
  }

  test("RC4 against the public test vectors") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the classic "Key"/"Plaintext" vector
    assert(PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes).toSeq ===
      hex("BBF316E8D940AF0AD3").toSeq)
    assert(PdfCrypt.rc4("Wiki".getBytes, "pedia".getBytes).toSeq ===
      hex("1021BF0420").toSeq)
    // involution: decrypt(encrypt(x)) == x
    val data = (0 until 257).map(_.toByte).toArray
    val k = hex("0102030405")
    assert(PdfCrypt.rc4(k, PdfCrypt.rc4(k, data)).toSeq === data.toSeq)
  }

  test("a non-empty user password declines: the /U check is load-bearing") {
    for (mode <- 0 to 3) {
      val b = PdfEncryptEncode.encode(21L, 2, mode)
      assert(pages(b) != null, s"mode=$mode baseline declined")
      // tamper one byte of the stored /U inside the /Encrypt dict —
      // exactly what a real user password would change
      val s = new String(b, "ISO-8859-1")
      val uAt = s.indexOf("/U <")
      assert(uAt > 0)
      val m = b.clone()
      // flip a hex digit of the /U value
      m(uAt + 4) = (if (b(uAt + 4) == '0') '1' else '0').toByte
      assert(pages(m) === null, s"mode=$mode tampered /U must decline")
    }
    // mode 4 (/StmF /Identity): streams are plaintext, but the
    // handler contract still authenticates the EMPTY user password —
    // a tampered /U (what a real user password looks like) declines
    // the document rather than leaking its unencrypted streams
    val b4 = PdfEncryptEncode.encode(21L, 2, 4)
    val s4 = new String(b4, "ISO-8859-1")
    val uAt4 = s4.indexOf("/U <")
    val m4 = b4.clone()
    m4(uAt4 + 4) = (if (b4(uAt4 + 4) == '0') '1' else '0').toByte
    assert(pages(m4) === null,
      "StmF-Identity with a failing /U check must decline")
    // an ABSENT /StmF defaults to Identity (§7.6.5): hide the key
    // behind a same-length unknown name and the doc still serves
    val absent = s4.replace("/StmF /Identity", "/Stmf /Identity")
    assert(pages(absent.getBytes("ISO-8859-1")) ===
      (0 until 2).map(PdfEncryptEncode.decodedPage(21L, _)),
      "the absent-/StmF Identity default must serve")
  }

  test("declines: unsupported V, missing /ID, Identity StmF, tampered AES padding") {
    val b = PdfEncryptEncode.encode(33L, 1, 2) // AESV2
    val s = new String(b, "ISO-8859-1")
    // /V 4 -> /V 3 (the undocumented interim variant: unsupported)
    val v3 = new String(b, "ISO-8859-1").replace("/V 4 /R 4", "/V 3 /R 4")
    assert(pages(v3.getBytes("ISO-8859-1")) === null)
    // drop the /ID: the R<=4 key derivation cannot run
    val noId = s.replace("/ID [ <", "/XD [ <")
    assert(pages(noId.getBytes("ISO-8859-1")) === null)
    // /StmF /StdCF -> /Identity on a doc whose streams ARE ciphertext:
    // the Identity selection means "read streams as-is", so the
    // ciphertext parses as garbage content and the pages decline —
    // never the original text (decryption must not run)
    val ident = s.replace("/StmF /StdCF", "/StmF /Identity")
    val identOut = pages(ident.getBytes("ISO-8859-1"))
    assert(identOut == null || identOut.forall(_ == null),
      "ciphertext under /StmF /Identity must never serve")
    // tamper the AES ciphertext tail: strict PKCS#7 must decline,
    // never serve garbage (the content stream is the FIRST page's)
    val streamAt = s.indexOf("stream\n", s.indexOf("5 0 obj"))
    assert(streamAt > 0)
    val m = b.clone()
    m(streamAt + 40) = (m(streamAt + 40) ^ 0x7F).toByte
    val out = pages(m)
    // a flipped CBC byte either breaks padding (page NULL) or breaks
    // the Tj operand parse — it must NEVER serve the original text
    assert(out == null || out.forall(p =>
      p == null || p != PdfEncryptEncode.decodedPage(33L, 0)))
  }

  test("EncryptMetadata false exercises the FFFFFFFF key branch") {
    // mode 2, odd seed -> /EncryptMetadata false (the encoder's rule);
    // a decoder that ignores the flag derives the wrong key and the
    // round trip fails — so this passing IS the branch witness
    val got = pages(PdfEncryptEncode.encode(7L, 2, 2))
    assert(got === Seq(PdfEncryptEncode.decodedPage(7L, 0),
      PdfEncryptEncode.decodedPage(7L, 1)))
    val s = new String(PdfEncryptEncode.encode(7L, 2, 2), "ISO-8859-1")
    assert(s.contains("/EncryptMetadata false"))
  }

  test("truncations and bit flips never throw") {
    val b = PdfEncryptEncode.encode(41L, 2, 3)
    var cut = 1
    while (cut < b.length) {
      PdfPageTexts.parse(java.util.Arrays.copyOf(b, cut))
      cut += 97
    }
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      PdfPageTexts.parse(m)
    }
  }
}

/** The registered query against its own contract at sf0.001. */
class PdfEncQuerySpec extends SparkSpec {

  test("text_pdf_encrypted rows equal the decodedPage contract") {
    val rows = graft.operators.Multimodal.pdfEncryptedTextQ(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, p) = (r.getLong(0), r.getInt(1))
      assert(r.getString(2) === graft.plans.PdfEncryptEncode.decodedPage(doc, p),
        s"doc=$doc page=$p")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 155 != 0), "gate rows absent")
  }
}
