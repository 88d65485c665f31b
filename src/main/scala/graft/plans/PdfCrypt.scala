package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** The PDF STANDARD security handler (ISO 32000-1 §7.6.3, 32000-2
  * §7.6.4) for the empty-USER-password case — the ubiquitous
  * "permissions-protected" PDF (an owner password gates editing, but
  * reading needs no password at all; every viewer opens it silently).
  * The full matrix of public algorithms:
  *
  *  - V=1/R=2 (RC4-40) and V=2/R=3 (RC4, /Length bits): Algorithm 2
  *    file key (MD5 over padded password + /O + P + /ID[0], the 50
  *    MD5 iterations at R3), Algorithm 4/5 /U verification, per-object
  *    keys MD5(key + objnum LE24 + gennum LE16);
  *  - V=4/R=4 crypt filters: /StmF /StdCF with /CFM /V2 (RC4) or
  *    /AESV2 (AES-128-CBC, 16-byte IV prefix, PKCS#7, the extra
  *    "sAlT" bytes in the per-object MD5); /EncryptMetadata false
  *    appends FFFFFFFF to the Algorithm 2 hash;
  *  - V=5/R=5|6 (/AESV3, AES-256-CBC): SHA-256 user validation
  *    (R5), the hardened Algorithm 2.B iterated hash (R6), and the
  *    file key unwrapped from /UE with the intermediate key — the
  *    per-object key IS the file key (no derivation in V5).
  *
  * /StmF /Identity (or an ABSENT /StmF — Identity is the §7.6.5
  * default) under V>=4 means content streams are PLAINTEXT; such
  * documents serve through [[PdfCrypt.IdentityStreams]] — but only
  * AFTER the same empty-user-password /U (or R5/R6 SHA) validation,
  * so a real-password document declines rather than leaking whatever
  * happens to sit unencrypted in its streams.
  *
  * Everything else DECLINES: a non-Standard /Filter, a user password
  * that is not empty (the /U check fails — reading those requires a
  * secret this engine must not guess at), unknown /CFM or /V, and any
  * malformed field. RC4 is hand-rolled (20 lines of public spec);
  * MD5/SHA-2 and AES-CBC come from the JDK. */
private[graft] final class PdfCrypt(
    val cfm: Int, // 0 = RC4 per-object, 1 = AESV2, 2 = AESV3
    fileKey: Array[Byte]) {

  /** Decrypt one stream's raw bytes; null = decline (bad padding /
    * short input). */
  def decryptStream(num: Long, gen: Int, data: Array[Byte]): Array[Byte] = {
    if (cfm < 0) return data // /StmF /Identity: streams are plaintext
    if (cfm == 0) return PdfCrypt.rc4(objectKey(num, gen, aes = false), data)
    val key = if (cfm == 1) objectKey(num, gen, aes = true) else fileKey
    if (data.length < 16 || (data.length - 16) % 16 != 0 ||
      data.length == 16) return null
    try {
      val c = PdfCrypt.cbcCipher()
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data, 0, 16))
      val plain = c.doFinal(data, 16, data.length - 16)
      // strict PKCS#7: 1..16, every pad byte equal to the count
      val pad = plain(plain.length - 1) & 0xFF
      if (pad < 1 || pad > 16 || pad > plain.length) return null
      var i = plain.length - pad
      while (i < plain.length) {
        if ((plain(i) & 0xFF) != pad) return null
        i += 1
      }
      java.util.Arrays.copyOf(plain, plain.length - pad)
    } catch { case _: java.security.GeneralSecurityException => null }
  }

  /** Algorithm 1's per-object key (V <= 4). */
  private def objectKey(num: Long, gen: Int, aes: Boolean): Array[Byte] = {
    val md = PdfCrypt.md5Digest()
    md.update(fileKey)
    md.update(Array(num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      gen.toByte, (gen >> 8).toByte))
    if (aes) md.update(Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte))
    val h = md.digest()
    java.util.Arrays.copyOf(h, math.min(fileKey.length + 5, 16))
  }
}

private[graft] object PdfCrypt {

  /** The §7.6.3.3 padding string. */
  private[graft] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Per-task-thread crypto primitives, constructed once and reused:
    * `MessageDigest.getInstance` / `Cipher.getInstance` do a provider
    * lookup + allocation on every call, and the hot paths here invoke
    * them inside per-round loops (Algorithm 2's 50 MD5 rounds,
    * Algorithm 2.B's >= 64 AES+SHA rounds) for every document of a
    * corpus scan — reuse cuts that to one lookup per executor thread
    * for the life of the task (digest() resets the digest; Cipher
    * re-`init` with the round key is the supported reuse path). */
  private def mdLocal(alg: String) = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance(alg)
  }
  private val md5TL = mdLocal("MD5")
  private val sha256TL = mdLocal("SHA-256")
  private val sha384TL = mdLocal("SHA-384")
  private val sha512TL = mdLocal("SHA-512")
  private val aesCbcTL = new ThreadLocal[javax.crypto.Cipher] {
    override def initialValue(): javax.crypto.Cipher =
      javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
  }
  private[plans] def cbcCipher(): javax.crypto.Cipher = aesCbcTL.get()
  private[plans] def md5Digest(): java.security.MessageDigest = {
    val md = md5TL.get(); md.reset(); md
  }
  private def shaTL(alg: String): java.security.MessageDigest = (alg match {
    case "SHA-256" => sha256TL
    case "SHA-384" => sha384TL
    case _ => sha512TL
  }).get()

  private[graft] def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = md5TL.get()
    md.reset()
    parts.foreach(md.update)
    md.digest()
  }
  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = shaTL(alg)
    md.reset()
    parts.foreach(md.update)
    md.digest()
  }

  /** Plain RC4 (the public KSA + PRGA). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def intLE(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Algorithm 2: the R 2-4 file key for a given (padded-empty) user
    * password. */
  private[graft] def algo2Key(o: Array[Byte], p: Long, id0: Array[Byte],
      r: Int, lengthBits: Int, encryptMetadata: Boolean): Array[Byte] = {
    val md = md5TL.get()
    md.reset()
    md.update(Pad) // the empty user password pads to exactly Pad
    md.update(o, 0, 32)
    md.update(intLE(p))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
    var h = md.digest()
    val n = if (r == 2) 5 else lengthBits / 8
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(java.util.Arrays.copyOf(h, n)); i += 1 }
    }
    java.util.Arrays.copyOf(h, n)
  }

  /** Algorithms 4/5 — what /U must hold for the empty user password. */
  private[graft] def expectedU(key: Array[Byte], id0: Array[Byte],
      r: Int): Array[Byte] = {
    if (r == 2) return rc4(key, Pad)
    var t = rc4(key, md5(Pad, id0))
    var i = 1
    while (i <= 19) {
      val k = new Array[Byte](key.length)
      var j = 0
      while (j < key.length) { k(j) = (key(j) ^ i).toByte; j += 1 }
      t = rc4(k, t)
      i += 1
    }
    t // 16 bytes; the stored /U's tail is arbitrary padding
  }

  /** Algorithm 2.B (ISO 32000-2): the hardened R6 hash. `udata` is
    * empty for /U, the 48-byte /U value for /O. */
  private[graft] def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var round = 0
    var lastE = 0
    var done = false
    // k's length cycles 32/48/64 across rounds; size the repeat buffer
    // once for the largest block and slice per round
    val k1 = new Array[Byte]((password.length + 64 + udata.length) * 64)
    val c = aesCbcTL.get()
    while (!done) {
      val block = password ++ k ++ udata
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e = c.doFinal(k1, 0, block.length * 64)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xFF; i += 1 }
      k = (sum % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      lastE = e(e.length - 1) & 0xFF
      round += 1
      done = round >= 64 && lastE <= round - 32
      if (round > 1024) return null // spec terminates long before this
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** AES-CBC with an explicit key/IV, no padding (the /UE unwrap and
    * the 2.A wrap use exact 32-byte blocks). */
  private[graft] def aesCbc(encrypt: Boolean, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte]): Array[Byte] =
    try {
      val c = aesCbcTL.get()
      c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    } catch { case _: java.security.GeneralSecurityException => null }

  /** The /StmF /Identity sentinel: streams pass through untouched.
    * Installed only after [[verifyEmptyUser]] succeeds. */
  private[graft] val IdentityStreams: PdfCrypt =
    new PdfCrypt(-1, new Array[Byte](0))

  /** The empty-user-password validation ALONE — Algorithm 4/5 at V=4,
    * the R5/R6 SHA check at V=5 — without building a decryptor. The
    * /StmF /Identity path needs no key schedule (streams are
    * plaintext) but the handler contract still gates serving on this
    * check: a document whose /U does not authenticate the empty
    * password requires a secret this engine must not guess. */
  private[graft] def verifyEmptyUser(v: Int, r: Int, lengthBits: Int,
      o: Array[Byte], u: Array[Byte], p: Long, encryptMetadata: Boolean,
      id0: Array[Byte]): Boolean = {
    if (v == 4) {
      if (r != 4 || o == null || o.length != 32 || u == null ||
        u.length < 16 || id0 == null) return false
      if (lengthBits < 40 || lengthBits > 128 || lengthBits % 8 != 0)
        return false
      val key = algo2Key(o, p, id0, r, lengthBits, encryptMetadata)
      constEq(expectedU(key, id0, r), u, 16)
    } else if (v == 5) {
      if ((r != 5 && r != 6) || u == null || u.length < 48) return false
      val hash = java.util.Arrays.copyOfRange(u, 0, 32)
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val empty = new Array[Byte](0)
      val check =
        if (r == 5) sha("SHA-256", empty, vSalt)
        else hash2B(empty, vSalt, empty)
      check != null && constEq(check, hash, 32)
    } else false
  }

  /** Build the decryptor from the /Encrypt dict's resolved fields, or
    * null (unsupported variant / the user password is not empty).
    * `cfmName` is the /StdCF /CFM name for V=4 ("" otherwise);
    * `stmfStd` = /StmF named /StdCF (required at V>=4). */
  private[graft] def make(filter: String, v: Int, r: Int, lengthBits: Int,
      o: Array[Byte], u: Array[Byte], oe: Array[Byte], ue: Array[Byte],
      p: Long, encryptMetadata: Boolean, cfmName: String, stmfStd: Boolean,
      id0: Array[Byte]): PdfCrypt = {
    if (filter != "Standard") return null
    if (v == 1 || v == 2) {
      if (o == null || o.length != 32 || u == null || u.length < 16) return null
      if (id0 == null) return null
      val rr = if (v == 1) 2 else 3
      if (r != rr && !(v == 2 && r == 2)) return null
      val bits = if (v == 1) 40 else lengthBits
      if (bits < 40 || bits > 128 || bits % 8 != 0) return null
      val key = algo2Key(o, p, id0, r, bits, encryptMetadata = true)
      val want = expectedU(key, id0, r)
      if (!constEq(want, u, if (r == 2) 32 else 16)) return null
      new PdfCrypt(0, key)
    } else if (v == 4) {
      if (r != 4 || !stmfStd) return null
      if (o == null || o.length != 32 || u == null || u.length < 16 ||
        id0 == null) return null
      val key = algo2Key(o, p, id0, r, lengthBits, encryptMetadata)
      if (!constEq(expectedU(key, id0, r), u, 16)) return null
      cfmName match {
        case "V2" => new PdfCrypt(0, key)
        case "AESV2" =>
          if (lengthBits != 128) return null
          new PdfCrypt(1, key)
        case _ => null
      }
    } else if (v == 5) {
      if ((r != 5 && r != 6) || !stmfStd || cfmName != "AESV3") return null
      if (u == null || u.length < 48 || ue == null || ue.length != 32)
        return null
      val hash = java.util.Arrays.copyOfRange(u, 0, 32)
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val empty = new Array[Byte](0)
      val check =
        if (r == 5) sha("SHA-256", empty, vSalt)
        else hash2B(empty, vSalt, empty)
      if (check == null || !constEq(check, hash, 32)) return null
      val ik =
        if (r == 5) sha("SHA-256", empty, kSalt)
        else hash2B(empty, kSalt, empty)
      if (ik == null) return null
      val fileKey = aesCbc(encrypt = false, ik, new Array[Byte](16), ue)
      if (fileKey == null || fileKey.length != 32) return null
      new PdfCrypt(2, fileKey)
    } else null
  }

  private def constEq(a: Array[Byte], b: Array[Byte], n: Int): Boolean = {
    if (a == null || b == null || a.length < n || b.length < n) return false
    var diff = 0
    var i = 0
    while (i < n) { diff |= (a(i) ^ b(i)); i += 1 }
    diff == 0
  }
}

/** `graft_pdf_encrypt_encode(seed, n_pages, mode)` → binary: a REAL
  * encrypted PDF (classic xref, WinAnsi Helvetica, one content stream
  * per page) written per the standard security handler with an EMPTY
  * user password and a seed-derived owner password — mode 0 = V1/R2
  * RC4-40, 1 = V2/R3 RC4-128, 2 = V4/R4 /AESV2 (with
  * /EncryptMetadata false on odd seeds, exercising the FFFFFFFF key
  * branch), 3 = V5/R6 /AESV3 (AES-256, Algorithm 2.B hashes, /UE key
  * wrap, the spec /Perms blob), 4 = V4/R4 with /StmF /Identity (a
  * real /Encrypt dict but content streams PLAINTEXT — the handler's
  * stream filter selection, §7.6.5, whose default is Identity).
  * Every shown character is (seed, p) arithmetic:
  * [[PdfEncryptEncode.decodedPage]]. */
case class PdfEncryptEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType, IntegerType)
    if (children.length == 3 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pdf_encrypt_encode expects (long seed, int n_pages, int mode)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_encrypt_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PdfEncryptEncode.encode(vs(0).asInstanceOf[Long],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfEncryptEncode =
    copy(children = newChildren)
}

object PdfEncryptEncode {

  /** What [[PdfPageTexts]] must decode page p (0-based) to — the
    * oracle's contract (é is WinAnsi 0xE9). */
  def decodedPage(seed: Long, p: Int): String =
    s"Enc $seed page ${p + 1} café ${(seed + p) % 7}"

  private def bin(bytes: Array[Byte]): String = new String(bytes, "ISO-8859-1")

  /** Deterministic pseudo-random bytes (the fixture has no entropy
    * source by design — resume-safe). */
  private def detBytes(seed: Long, tag: Int, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 6364136223846793005L + tag * 1442695040888963407L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 33).toByte
      i += 1
    }
    out
  }

  def encode(seed: Long, nPages: Int, mode: Int): Array[Byte] = {
    if (seed < 0 || nPages < 1 || nPages > 64 || mode < 0 || mode > 4)
      return null
    val id0 = detBytes(seed, 1, 16)
    val ownerPwd = s"own$seed".getBytes("ISO-8859-1")
    val p = -44L // print + copy denied: a typical permissions mask
    val encMeta = mode != 2 || seed % 2 == 0
    // mode 4: V4/R4 with /StmF /Identity — the /Encrypt dict is real
    // (O/U computed like mode 2) but content STREAMS are plaintext,
    // per the handler's stream-filter selection

    // ---- the handler's file key + /Encrypt dict fields -------------
    var fileKey: Array[Byte] = null
    var encDict: String = null
    def hex(b: Array[Byte]): String =
      "<" + b.map(x => f"${x & 0xFF}%02x").mkString + ">"
    if (mode <= 2 || mode == 4) {
      val r = if (mode == 0) 2 else if (mode == 1) 3 else 4
      val bits = if (mode == 0) 40 else 128
      val n = bits / 8
      // Algorithm 3: /O from the owner password
      var ho = PdfCrypt.md5(java.util.Arrays.copyOf(
        ownerPwd ++ PdfCrypt.Pad, 32))
      if (r >= 3) {
        var i = 0
        while (i < 50) { ho = PdfCrypt.md5(ho); i += 1 }
      }
      val oKey = java.util.Arrays.copyOf(ho, n)
      var o = PdfCrypt.rc4(oKey, PdfCrypt.Pad) // empty user pwd pads to Pad
      if (r >= 3) {
        var i = 1
        while (i <= 19) {
          val k = new Array[Byte](n)
          var j = 0
          while (j < n) { k(j) = (oKey(j) ^ i).toByte; j += 1 }
          o = PdfCrypt.rc4(k, o)
          i += 1
        }
      }
      fileKey = PdfCrypt.algo2Key(o, p, id0, r, bits, encMeta)
      val uCore = PdfCrypt.expectedU(fileKey, id0, r)
      val u = if (r == 2) uCore
        else uCore ++ detBytes(seed, 2, 16) // R>=3: 16-byte arbitrary tail
      val vPart =
        if (mode == 0) "/V 1 /R 2"
        else if (mode == 1) "/V 2 /R 3 /Length 128"
        else if (mode == 4) "/V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          "/StmF /Identity /StrF /StdCF"
        else "/V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF" +
          (if (encMeta) "" else " /EncryptMetadata false")
      encDict = s"<< /Filter /Standard $vPart /O ${hex(o)} /U ${hex(u)} /P $p >>"
    } else {
      // V5/R6: the 2.A computation with Algorithm 2.B hashes
      fileKey = detBytes(seed, 3, 32)
      val vSalt = detBytes(seed, 4, 8)
      val kSalt = detBytes(seed, 5, 8)
      val empty = new Array[Byte](0)
      val uHash = PdfCrypt.hash2B(empty, vSalt, empty)
      val ue = PdfCrypt.aesCbc(encrypt = true,
        PdfCrypt.hash2B(empty, kSalt, empty), new Array[Byte](16), fileKey)
      val u = uHash ++ vSalt ++ kSalt
      val oVSalt = detBytes(seed, 6, 8)
      val oKSalt = detBytes(seed, 7, 8)
      val oHash = PdfCrypt.hash2B(ownerPwd, oVSalt, u)
      val oe = PdfCrypt.aesCbc(encrypt = true,
        PdfCrypt.hash2B(ownerPwd, oKSalt, u), new Array[Byte](16), fileKey)
      val o = oHash ++ oVSalt ++ oKSalt
      // /Perms: AES-256-ECB of P + FFFFFFFF + 'T'(encMeta) + "adb" + 4
      val permsPlain = Array[Byte](
        p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte,
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        'T', 'a', 'd', 'b') ++ detBytes(seed, 8, 4)
      val perms = try {
        val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
        c.doFinal(permsPlain)
      } catch { case _: java.security.GeneralSecurityException => return null }
      encDict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
        s"/StmF /StdCF /StrF /StdCF /O ${hex(o)} /U ${hex(u)} " +
        s"/OE ${hex(oe)} /UE ${hex(ue)} /P $p /Perms ${hex(perms)} >>"
    }
    val crypt = new PdfCrypt(if (mode == 2) 1 else if (mode == 3) 2 else 0,
      fileKey)

    // ---- the document ----------------------------------------------
    val sb = new StringBuilder()
    sb.append("%PDF-1.6\n%âãÏÓ\n")
    val offsets = new scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Int = {
      offsets += sb.length
      val num = offsets.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
      num
    }
    val kids = (0 until nPages).map(p => s"${4 + p * 2} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>")
    (0 until nPages).foreach { pg =>
      val contentNum = 4 + pg * 2 + 1
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentNum 0 R >>")
      val text = s"Enc $seed page ${pg + 1} café ${(seed + pg) % 7}"
      val src = (s"BT /F1 12 Tf 72 720 Td ($text) Tj ET")
        .getBytes("ISO-8859-1")
      // encrypt the content stream with ITS object number's key —
      // mode 4 (/StmF /Identity) writes it PLAINTEXT
      val data =
        if (mode == 4) src
        else if (crypt.cfm == 0) PdfCrypt.rc4(objKeyFor(crypt, fileKey,
          contentNum, aes = false), src)
        else {
          val key = if (crypt.cfm == 1)
            objKeyFor(crypt, fileKey, contentNum, aes = true) else fileKey
          val iv = detBytes(seed, 100 + pg, 16)
          val pad = 16 - src.length % 16
          val padded = src ++ Array.fill(pad)(pad.toByte)
          iv ++ PdfCrypt.aesCbc(encrypt = true, key, iv, padded)
        }
      obj(s"<< /Length ${data.length} >>\nstream\n" + bin(data) + "\nendstream")
    }
    val encNum = obj(encDict)
    val size = offsets.length + 1
    val xrefAt = sb.length
    sb.append(s"xref\n0 $size\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $size /Root 1 0 R /Encrypt $encNum 0 R " +
      s"/ID [ ${"<" + id0.map(x => f"${x & 0xFF}%02x").mkString + ">"} " +
      s"${"<" + id0.map(x => f"${x & 0xFF}%02x").mkString + ">"} ] >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  /** The encoder's twin of Algorithm 1 (per-object key). */
  private def objKeyFor(crypt: PdfCrypt, fileKey: Array[Byte], num: Int,
      aes: Boolean): Array[Byte] = {
    val md = PdfCrypt.md5Digest()
    md.update(fileKey)
    md.update(Array(num.toByte, (num >> 8).toByte, (num >> 16).toByte,
      0.toByte, 0.toByte))
    if (aes) md.update(Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte))
    java.util.Arrays.copyOf(md.digest(), math.min(fileKey.length + 5, 16))
  }
}
