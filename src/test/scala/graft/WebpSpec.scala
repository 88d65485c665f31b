package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{WebpEncode, WebpMeta}

/** WebP triage: encode→parse round trips across all three container
  * variants, the flag matrix, RIFF-walk robustness (padding, unknown
  * leading chunks), and the decline envelope. */
class WebpSpec extends AnyFunSuite {

  test("all three variants round-trip every reported field") {
    for {
      (w, h) <- Seq((1, 1), (10, 490), (640, 480), (16383, 16383))
      seed <- 0L until 36L
      variant <- 0 to 2
    } {
      val b = WebpEncode.encode(w, h, seed, variant)
      assert(b != null, s"encode refused w=$w h=$h v=$variant")
      val m = WebpMeta.parse(b)
      assert(m != null, s"parse refused w=$w h=$h seed=$seed v=$variant")
      val expVariant = Seq("lossy", "lossless", "extended")(variant)
      assert(m.getString(0) === expVariant)
      assert(m.getInt(1) === w && m.getInt(2) === h,
        s"dims diverge v=$variant: ${m.getInt(1)}x${m.getInt(2)}")
      val (alpha, anim, exif) = variant match {
        case 0 => (false, false, false)
        case 1 => (seed % 2 == 0, false, false)
        case _ => (seed % 2 == 0, seed % 7 == 0, seed % 5 == 0)
      }
      assert(m.getBoolean(3) === alpha, s"alpha v=$variant seed=$seed")
      assert(m.getBoolean(4) === anim, s"anim v=$variant seed=$seed")
      assert(m.getBoolean(5) === exif, s"exif v=$variant seed=$seed")
    }
  }

  test("RIFF walk: unknown leading chunks skip with word alignment") {
    val base = WebpEncode.encode(33, 21, 9L, 0)
    // splice an unknown odd-sized chunk (5 bytes + pad) before VP8
    val junk = "JUNK".getBytes ++ Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF form size to cover the insertion
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xFF).toByte; spliced(5) = ((sz >> 8) & 0xFF).toByte
    spliced(6) = ((sz >> 16) & 0xFF).toByte; spliced(7) = ((sz >> 24) & 0xFF).toByte
    val m = WebpMeta.parse(spliced)
    assert(m != null && m.getString(0) === "lossy" &&
      m.getInt(1) === 33 && m.getInt(2) === 21,
      "padded unknown chunk broke the walk")
  }

  test("decline envelope: bad magic, lying sizes, broken bitstreams") {
    val good = WebpEncode.encode(50, 40, 3L, 0)
    // every truncation parses or NULLs, never throws
    for (n <- 0 until good.length) WebpMeta.parse(good.take(n))
    // wrong form type
    val notWebp = good.clone(); notWebp(8) = 'W'; notWebp(9) = 'A'
    notWebp(10) = 'V'; notWebp(11) = 'E'
    assert(WebpMeta.parse(notWebp) == null)
    // RIFF size past the buffer: hostile, refused
    val lying = good.clone(); lying(4) = 0xFF.toByte; lying(5) = 0xFF.toByte
    assert(WebpMeta.parse(lying) == null)
    // corrupt VP8 start code
    val badStart = good.clone(); badStart(12 + 8 + 3) = 0x00
    assert(WebpMeta.parse(badStart) == null)
    // inter-frame bit set: cannot lead a file
    val inter = good.clone(); inter(12 + 8) = (inter(12 + 8) | 1).toByte
    assert(WebpMeta.parse(inter) == null)
    // lossless with a nonzero version field declines
    val ll = WebpEncode.encode(50, 40, 4L, 1)
    val badVer = ll.clone()
    badVer(12 + 8 + 4) = (badVer(12 + 8 + 4) | 0x20).toByte // version bit 29
    assert(WebpMeta.parse(badVer) == null)
    // encoder refuses out-of-range dims and variants
    assert(WebpEncode.encode(0, 5, 1L, 0) == null)
    assert(WebpEncode.encode(5, 16384, 1L, 0) == null)
    assert(WebpEncode.encode(5, 5, 1L, 3) == null)
  }

  test("extended variant reads canvas dims from VP8X, not the inner VP8") {
    // inner VP8 carries the SAME dims in the fixture; force them to
    // differ to prove precedence
    val b = WebpEncode.encode(100, 80, 10L, 2)
    val m0 = WebpMeta.parse(b)
    assert(m0 != null && m0.getString(0) === "extended")
    // VP8X is the first chunk at offset 12; canvas w-1 at 12+8+4
    val patched = b.clone()
    patched(12 + 8 + 4) = ((200 - 1) & 0xFF).toByte
    patched(12 + 8 + 5) = 0; patched(12 + 8 + 6) = 0
    val m = WebpMeta.parse(patched)
    assert(m != null && m.getInt(1) === 200 && m.getInt(2) === 80,
      "canvas dims must come from VP8X")
  }
}
