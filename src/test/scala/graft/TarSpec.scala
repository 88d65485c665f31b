package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TarEncode, TarEntries}

/** tar member census (plans.TarEntries): the checksum-verified
  * 512-byte header walk. Pins: fixture round trips (names/sizes/
  * flags/mtimes = the TarEncode contract the oracle restates), the
  * GNU 'L' long-name protocol, POSIX prefix composition, both
  * checksum conventions, the decline envelope (bad magic/checksum,
  * pax headers, base-256 sizes, a dangling 'L', truncation, content
  * past the terminator), and the never-throw law. */
class TarSpec extends AnyFunSuite {

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

  test("decline envelope: magic, pax, base-256, dangling L, terminator") {
    val b = TarEncode.encode(12L, 3)
    // pre-POSIX v7 magic (zeros where ustar lives) declines
    val v7 = b.clone()
    java.util.Arrays.fill(v7, 257, 265, 0.toByte)
    assert(entries(v7) === null)
    // a pax 'x' typeflag declines (its payload can override the very
    // fields this census reports) — re-checksum so ONLY the flag gate
    // fires
    val pax = b.clone()
    pax(512 + 156) = 'x'.toByte
    var sum = 0L; var i = 512
    while (i < 1024) {
      sum += (if (i >= 512 + 148 && i < 512 + 156) 32L else pax(i) & 0xFF)
      i += 1
    }
    var j = 512 + 153; var x = sum
    java.util.Arrays.fill(pax, 512 + 148, 512 + 156, ' '.toByte)
    while (j >= 512 + 148) { pax(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    pax(512 + 154) = 0; pax(512 + 155) = ' '.toByte
    assert(entries(pax) === null)
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
