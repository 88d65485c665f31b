package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GzipEncode, GzipMeta}

/** Gzip member triage (plans.GzipMeta): RFC 1952 header walk + JDK
  * inflate + trailer validation. Pins: fixture-shape round trips
  * across the three header variants and multi-member files, BOTH
  * JDK differential directions (our triage reads GZIPOutputStream's
  * files; GZIPInputStream inflates our encoder's), the decline
  * envelope (hostile headers NULL, never throw), the honest-report
  * contract for corrupt trailers on inflatable streams, and the
  * bomb ceiling. */
class GzipSpec extends AnyFunSuite {

  private case class Fields(fname: String, mtime: Long, os: Int,
      text: Boolean, isize: Long, nBytes: Long, crcOk: Boolean, members: Int)
  private def fld(r: org.apache.spark.sql.catalyst.InternalRow): Fields =
    Fields(
      if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
      r.getLong(1), r.getInt(2), r.getBoolean(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6), r.getInt(7))

  test("round trips across the three header variants and member counts") {
    for (seed <- Seq(1L, 7L, 123L, 99999L); variant <- 0 to 2;
         members <- Seq(1, 2, 3)) {
      val n = (seed % 120 + 30).toInt
      val b = GzipEncode.encode(seed, n, variant, members)
      val r = GzipMeta.parse(b)
      assert(r != null, s"seed=$seed variant=$variant members=$members")
      val f = fld(r)
      if (variant == 0) assert(f.fname == null)
      else assert(f.fname === s"doc${seed % 1000}.txt")
      assert(f.mtime === seed % 100000)
      assert(f.os === 3)
      assert(f.text === (variant == 1))
      assert(f.isize === n.toLong)
      assert(f.nBytes === n.toLong)
      assert(f.crcOk)
      assert(f.members === members)
    }
  }

  test("JDK differential both directions") {
    // direction 1: GZIPInputStream inflates OUR encoder's stream to
    // the exact deterministic payload (first member)
    val b = GzipEncode.encode(42L, 200, 1, 1)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    var k = in.read(buf)
    while (k > 0) { out.write(buf, 0, k); k = in.read(buf) }
    assert(out.toByteArray.toSeq === GzipEncode.payloadBytes(42L, 200).toSeq,
      "JDK inflate of our stream diverges from the deterministic payload")

    // direction 2: our triage reads the JDK writer's stream (bare
    // header, OS and mtime as GZIPOutputStream writes them)
    val payload = GzipEncode.payloadBytes(7L, 300)
    val jb = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(jb)
    gz.write(payload); gz.close()
    val r = GzipMeta.parse(jb.toByteArray)
    assert(r != null, "triage declined a JDK-written gzip stream")
    val f = fld(r)
    assert(f.fname == null && !f.text)
    assert(f.nBytes === 300L && f.isize === 300L && f.crcOk && f.members === 1)
  }

  test("decline envelope: hostile headers NULL, never throw") {
    def dies(b: Array[Byte]): Unit = assert(GzipMeta.parse(b) == null)
    val good = GzipEncode.encode(5L, 40, 2, 1)
    // bad magic / non-deflate CM / reserved FLG bits
    dies(Array[Byte](0x1F, 0x8B.toByte))
    val badMagic = good.clone(); badMagic(1) = 0x8C.toByte; dies(badMagic)
    val badCm = good.clone(); badCm(2) = 7; dies(badCm)
    val reserved = good.clone(); reserved(3) = (reserved(3) | 0x40).toByte; dies(reserved)
    // FHCRC mismatch (variant 2 carries one: flip a header byte AFTER
    // the fixed fields so the stored CRC16 no longer matches)
    val hcrc = good.clone(); hcrc(4) = (hcrc(4) ^ 0x01).toByte; dies(hcrc)
    // unterminated FNAME: name runs to end of buffer without a NUL
    val unterminated = Array[Byte](0x1F, 0x8B.toByte, 8, 0x08) ++
      Array.fill[Byte](6)(0) ++ "neverending".getBytes("ISO-8859-1")
    dies(unterminated)
    // trailing garbage after a valid member is hostile
    dies(GzipEncode.encode(5L, 40, 0, 1) ++ Array[Byte](1, 2, 3))
    // truncation law: EVERY prefix parses or NULLs, never throws
    (0 until good.length).foreach(i => GzipMeta.parse(good.take(i)))
  }

  test("corrupt trailer on an inflatable stream reports crc_ok=false, not a decline") {
    val b = GzipEncode.encode(9L, 50, 0, 1)
    // the trailer CRC is the 8th-from-last byte group; flip one bit
    val corrupt = b.clone()
    corrupt(b.length - 8) = (corrupt(b.length - 8) ^ 0x01).toByte
    val r = GzipMeta.parse(corrupt)
    assert(r != null, "a corrupt trailer must be REPORTED, not declined")
    val f = fld(r)
    assert(!f.crcOk && f.nBytes === 50L)
    // and a lying ISIZE likewise
    val lying = b.clone()
    lying(b.length - 4) = (lying(b.length - 4) ^ 0x01).toByte
    val r2 = GzipMeta.parse(lying)
    assert(r2 != null && !fld(r2).crcOk)
  }

  test("member-count ceiling is a decline, not a silent cap") {
    val one = GzipEncode.encode(3L, 4, 0, 1)
    val many = new java.io.ByteArrayOutputStream()
    (0 until 4097).foreach(_ => many.write(one, 0, one.length))
    assert(GzipMeta.parse(many.toByteArray) == null,
      "a file with more members than the walk ceiling must decline")
    // and exactly AT the ceiling still parses honestly
    val atCap = new java.io.ByteArrayOutputStream()
    (0 until 4096).foreach(_ => atCap.write(one, 0, one.length))
    val r = GzipMeta.parse(atCap.toByteArray)
    assert(r != null && fld(r).members === 4096)
  }

  test("decompression bomb ceiling declines instead of materializing") {
    // 2 MiB of zeros compresses to ~2 KB: over the 1 MiB ceiling
    val payload = new Array[Byte](2 << 20)
    val jb = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(jb)
    gz.write(payload); gz.close()
    assert(GzipMeta.parse(jb.toByteArray) == null,
      "a member inflating past the ceiling must decline")
  }
}
