package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TarEncode, TarEntries}

/** tar member census (plans.TarEntries): the checksum-verified
  * 512-byte header walk. Pins: fixture round trips (names/sizes/
  * flags/mtimes = the TarEncode contract the oracle restates), the
  * GNU 'L' long-name protocol, POSIX prefix composition, pax 'x'/'g'
  * extended headers (path/size/mtime applied, inert keys ignored,
  * size authoritative over the octal field), both checksum
  * conventions, the decline envelope (bad magic/checksum, base-256
  * sizes, a dangling 'L'/'x', malformed pax records, sparse keys,
  * truncation, content past the terminator), and the never-throw
  * law. */
class TarSpec extends AnyFunSuite {

  /** A spec-local ustar header builder (the encoder's private
    * twin) so decline pins can craft hostile pax members without
    * reaching into TarEncode. */
  private def mkHeader(name: String, size: Long, mtime: Long,
      flag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(off: Int, len: Int, v: Long): Unit = {
      var i = off + len - 2; var x = v
      while (i >= off) { h(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
    }
    oct(100, 8, 420); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, size); oct(136, 12, mtime)
    h(156) = flag
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L; var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    var j = 153; var x = sum
    while (j >= 148) { h(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    h(154) = 0; h(155) = ' '
    h
  }
  private def padded(data: Array[Byte]): Array[Byte] = {
    val p = new Array[Byte](((data.length + 511) / 512) * 512)
    System.arraycopy(data, 0, p, 0, data.length); p
  }
  private def rec(key: String, value: String): Array[Byte] = {
    val body = s" $key=$value\n".getBytes("UTF-8")
    var digits = 1
    while (s"${body.length + digits}".length > digits) digits += 1
    s"${body.length + digits}".getBytes("US-ASCII") ++ body
  }
  /** dir + [x header with `recs`] + one 5-byte file + terminator. */
  private def paxArchive(recs: Array[Byte]): Array[Byte] = {
    mkHeader("d/", 0, 100, '5') ++
      mkHeader("PaxHeaders.0/f.dat", recs.length, 0, 'x') ++ padded(recs) ++
      mkHeader("f.dat", 5, 7, '0') ++ padded("hello".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
  }

  private def entries(b: Array[Byte]): Seq[(String, String, Long, Long)] = {
    val arr = TarEntries.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getLong(2), r.getLong(3))
    }
  }

  test("fixture round trips: the census equals the encoder contract") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 41L, 170L, 4242L); n <- Seq(1, 3, 5)) {
      val got = entries(TarEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      val expected = (0 until n).map { i =>
        (TarEncode.entryName(seed, i),
          if (i == 0) "5" else "0",
          TarEncode.entrySize(seed, i),
          if (i == 0) seed * 100 else seed * 100 + i)
      }
      assert(got === expected, s"seed=$seed n=$n")
    }
  }

  test("GNU long names round the 100-char field; prefix composes") {
    // seed 3, i 1: (3+1)%4==0 → the 'L' path with a 121-char name
    val name = TarEncode.entryName(3L, 1)
    assert(name.length > 100)
    val got = entries(TarEncode.encode(3L, 2))
    assert(got(1)._1 === name)
    // seed 6, i 1: (6+1)%7==0 → prefix-split
    assert(entries(TarEncode.encode(6L, 2))(1)._1 === "p6/f1.dat")
  }

  test("checksum is load-bearing: a flipped payload passes, a flipped header declines") {
    val b = TarEncode.encode(11L, 3)
    // flip a byte INSIDE the first file's data area: censuses don't
    // hash payloads, the walk must still serve
    val dataAt = 512 + 512 // dir header + file header → file data
    val m1 = b.clone(); m1(dataAt) = (m1(dataAt) ^ 0x40).toByte
    assert(entries(m1) != null)
    // flip a byte inside a HEADER: the checksum catches it
    val m2 = b.clone(); m2(5) = (m2(5) ^ 0x01).toByte
    assert(entries(m2) === null)
    // the SIGNED-sum legacy convention is accepted: rewrite header 0's
    // checksum as the signed sum (identical here since all bytes are
    // positive — so instead plant a high byte in uname and re-sum both
    // ways to prove the signed fallback path)
    val m3 = b.clone()
    m3(270) = 0xE9.toByte // uname byte, parser never reads it as text
    var sumS = 0L
    var i = 0
    while (i < 512) {
      sumS += (if (i >= 148 && i < 156) 32L else m3(i).toLong)
      i += 1
    }
    var j = 153; var x = sumS
    java.util.Arrays.fill(m3, 148, 156, ' '.toByte)
    while (j >= 148) { m3(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    m3(154) = 0; m3(155) = ' '
    assert(entries(m3) != null, "signed checksum convention rejected")
  }

  test("pax 'x': path/size/mtime applied, inert keys ignored, size authoritative") {
    // the honest round trip: path with a non-ASCII char, fractional
    // mtime floored, atime ignored, size from the pax key while the
    // member header's octal field says 5
    val ok = paxArchive(rec("path", "d/pé.dat") ++ rec("mtime", "41.75") ++
      rec("atime", "99") ++ rec("uname", "nobody"))
    assert(entries(ok) === Seq(("d/", "5", 0L, 100L), ("d/pé.dat", "0", 5L, 41L)))
    // pax size OUTRANKS the octal field for both the report and the
    // data skip: octal says 0, pax says 5 — the walk must still land
    // on the next header
    val sz = mkHeader("d/", 0, 100, '5') ++
      mkHeader("PaxHeaders.0/f.dat", rec("size", "5").length, 0, 'x') ++
      padded(rec("size", "5")) ++
      mkHeader("f.dat", 0, 7, '0') ++ padded("hello".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
    assert(entries(sz) === Seq(("d/", "5", 0L, 100L), ("f.dat", "0", 5L, 7L)))
    // a global 'g' default applies to following members; a per-member
    // 'x' key beats it
    val g = mkHeader("pax_global_header", rec("mtime", "1000").length, 0, 'g') ++
      padded(rec("mtime", "1000")) ++
      mkHeader("a.dat", 5, 7, '0') ++ padded("aaaaa".getBytes("US-ASCII")) ++
      mkHeader("PaxHeaders.0/b.dat", rec("mtime", "2000").length, 0, 'x') ++
      padded(rec("mtime", "2000")) ++
      mkHeader("b.dat", 5, 7, '0') ++ padded("bbbbb".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
    assert(entries(g) === Seq(("a.dat", "0", 5L, 1000L), ("b.dat", "0", 5L, 2000L)))
  }

  test("pax size on link/directory members is ignored: no phantom data skip") {
    // POSIX: size has no meaning for members without data blocks
    // ('1'/'2'/'5'); real tar ignores a pax size there — honoring it
    // would skip nonexistent data and desynchronize the walk
    val sym = mkHeader("d/", 0, 100, '5') ++
      mkHeader("PaxHeaders.0/ln", rec("size", "512").length, 0, 'x') ++
      padded(rec("size", "512")) ++
      mkHeader("ln", 0, 7, '2') ++
      mkHeader("f.dat", 5, 9, '0') ++ padded("hello".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
    assert(entries(sym) === Seq(("d/", "5", 0L, 100L), ("ln", "2", 0L, 7L),
      ("f.dat", "0", 5L, 9L)))
    // same for a hard link and a directory under an 'x' size
    val hard = mkHeader("PaxHeaders.0/h", rec("size", "512").length, 0, 'x') ++
      padded(rec("size", "512")) ++
      mkHeader("h", 0, 3, '1') ++
      mkHeader("d2/", 0, 50, '5') ++
      new Array[Byte](1024)
    assert(entries(hard) === Seq(("h", "1", 0L, 3L), ("d2/", "5", 0L, 50L)))
    // a GLOBAL pax size: ignored by the directory, authoritative for
    // the regular file that follows (per-key precedence unchanged)
    val g = mkHeader("pax_global_header", rec("size", "3").length, 0, 'g') ++
      padded(rec("size", "3")) ++
      mkHeader("d3/", 0, 60, '5') ++
      mkHeader("g.dat", 0, 9, '0') ++ padded("abc".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
    assert(entries(g) === Seq(("d3/", "5", 0L, 60L), ("g.dat", "0", 3L, 9L)))
  }

  test("pax decline envelope: malformed records, sparse, bad UTF-8, dangling") {
    // a record whose length field lies declines
    assert(entries(paxArchive("7 a=b\n".getBytes("US-ASCII"))) === null)
    // records must tile the data exactly — a trailing byte declines
    assert(entries(paxArchive(rec("atime", "9") ++ Array('x'.toByte))) === null)
    // a key with no '=' declines
    assert(entries(paxArchive("6 abcd\n".getBytes("US-ASCII"))) === null)
    // GNU sparse members change the data layout: decline
    assert(entries(paxArchive(rec("GNU.sparse.size", "5"))) === null)
    // a non-UTF-8 declared hdrcharset declines
    assert(entries(paxArchive(rec("hdrcharset", "BINARY"))) === null)
    // a malformed UTF-8 path declines (mojibake-never)
    val raw = paxArchive(rec("path", "d/pé.dat"))
    var at = 1024 // the x data block
    while (!(raw(at) == 'd' && raw(at + 1) == '/' && raw(at + 2) == 'p')) at += 1
    raw(at + 3) = 0xFF.toByte // clobber the é's lead byte
    assert(entries(raw) === null)
    // a negative / non-decimal pax size declines
    assert(entries(paxArchive(rec("size", "-1"))) === null)
    assert(entries(paxArchive(rec("size", "5x"))) === null)
    // an mtime whose digits overflow a Long declines — a wrap can land
    // POSITIVE, so this must never serve a garbage timestamp
    assert(entries(paxArchive(rec("mtime", "20000000000000000000"))) === null)
    assert(entries(paxArchive(rec("mtime", "99999999999999999999999"))) === null)
    // a dangling 'x' (no member follows) declines like a dangling 'L'
    val dangling = mkHeader("PaxHeaders.0/f.dat", rec("atime", "9").length, 0, 'x') ++
      padded(rec("atime", "9")) ++ new Array[Byte](1024)
    assert(entries(dangling) === null)
    // two 'x' members in a row decline
    val xx = mkHeader("PaxHeaders.0/f.dat", rec("atime", "9").length, 0, 'x') ++
      padded(rec("atime", "9")) ++
      mkHeader("PaxHeaders.0/f.dat", rec("atime", "9").length, 0, 'x') ++
      padded(rec("atime", "9")) ++
      mkHeader("f.dat", 5, 7, '0') ++ padded("hello".getBytes("US-ASCII")) ++
      new Array[Byte](1024)
    assert(entries(xx) === null)
  }

  test("decline envelope: magic, base-256, dangling L, terminator") {
    // seed 13: no 'g' header (13%3!=0), so member 1's header sits at
    // offset 512 — the byte surgeries below rely on that layout
    val b = TarEncode.encode(13L, 3)
    // pre-POSIX v7 magic (zeros where ustar lives) declines
    val v7 = b.clone()
    java.util.Arrays.fill(v7, 257, 265, 0.toByte)
    assert(entries(v7) === null)
    // a GNU base-256 size (high bit) declines, never misparses
    val b256 = b.clone()
    b256(512 + 124) = 0x80.toByte
    assert(entries(b256) === null)
    // content after the two-zero-block terminator declines (it would
    // vanish silently otherwise)
    val extra = b ++ new Array[Byte](512)
    extra(b.length) = 'Z'.toByte
    assert(entries(extra.dropRight(512)) != null) // sanity: b itself serves
    assert(entries(extra) === null)
    // not block-aligned / too short
    assert(entries(b.dropRight(1)) === null)
    assert(entries(new Array[Byte](512)) === null)
  }

  test("truncations and bit flips never throw") {
    val b = TarEncode.encode(41L, 5)
    var cut = 0
    while (cut < b.length) {
      entries(java.util.Arrays.copyOf(b, cut))
      cut += 512
    }
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      entries(m)
    }
  }
}

/** The registered census query against its own contract at sf0.001. */
class TarQuerySpec extends SparkSpec {

  test("mm_tar_entries rows equal the encoder contract at sf0.001") {
    val rows = graft.operators.Multimodal.tarEntriesQ(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, i) = (r.getLong(0), r.getInt(1))
      assert(r.getString(2) === graft.plans.TarEncode.entryName(doc, i), s"doc=$doc i=$i")
      assert(r.getString(3) === (if (i == 0) "5" else "0"))
      assert(r.getLong(4) === graft.plans.TarEncode.entrySize(doc, i))
      assert(r.getLong(5) === (if (i == 0) doc * 100 else doc * 100 + i))
    }
    assert(rows.map(_.getLong(0)).forall(_ % 169 != 0), "gate rows absent")
  }
}
