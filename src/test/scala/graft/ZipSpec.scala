package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{ZipEncode, ZipEntries}

/** ZIP central-directory triage (plans.ZipEntries): EOCD-located,
  * directory-walked — against archives written by the JDK's own
  * ZipOutputStream (the reference implementation as fixture writer).
  * Pins: entry census across methods and comment tails, the
  * comment-consistency EOCD rule (PK\5\6 bytes inside a comment must
  * not be taken for the record), ZIP64/multi-disk declines, and the
  * truncation law. */
class ZipSpec extends AnyFunSuite {

  private def rows(b: Array[Byte]): Seq[(String, Int, Long)] = {
    val arr = ZipEntries.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2))
    }
  }

  test("JDK-written archives census exactly, with and without comments") {
    for (seed <- Seq(1L, 7L, 999L); n <- Seq(1, 3, 6); comment <- Seq(false, true)) {
      val got = rows(ZipEncode.encode(seed, n, comment))
      assert(got != null, s"seed=$seed n=$n comment=$comment")
      val expected = (0 until n).map(i =>
        (s"e$i.txt", if (i % 2 == 0) 0 else 8, ((seed + i) % 100 + 10)))
      assert(got === expected)
    }
  }

  test("EOCD comment-consistency: PK\\5\\6 bytes inside a comment do not fool the scan") {
    // a comment that CONTAINS the EOCD magic: the embedded bytes fail
    // the comment-length-reaches-end rule, the real record wins
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.setComment("decoy PK\u0005\u0006 inside")
    val e = new java.util.zip.ZipEntry("a.txt")
    z.putNextEntry(e); z.write("hi".getBytes); z.closeEntry(); z.close()
    val got = rows(bos.toByteArray)
    assert(got === Seq(("a.txt", 8, 2L)))
  }

  test("declines: multi-disk, ZIP64 sentinels, lying directory, truncation law") {
    def dies(b: Array[Byte]): Unit = assert(ZipEntries.parse(b) == null)
    val good = ZipEncode.encode(5L, 3, false)
    // locate the EOCD (no comment → last 22 bytes)
    val eocd = good.length - 22
    assert(good(eocd) == 'P' && good(eocd + 1) == 'K')
    // multi-disk: nonzero disk number
    val disk = good.clone(); disk(eocd + 4) = 1; dies(disk)
    // ZIP64 sentinel entry count
    val z64 = good.clone(); z64(eocd + 10) = 0xFF.toByte; z64(eocd + 11) = 0xFF.toByte
    dies(z64)
    // lying central-directory offset
    val lie = good.clone(); lie(eocd + 16) = (lie(eocd + 16) ^ 0x01).toByte; dies(lie)
    // count disagreeing with the walked directory size
    val cnt = good.clone(); cnt(eocd + 10) = (cnt(eocd + 10) + 1).toByte
    cnt(eocd + 8) = cnt(eocd + 10); dies(cnt)
    // truncation law
    (0 until good.length).foreach(i => ZipEntries.parse(good.take(i)))
  }
}
