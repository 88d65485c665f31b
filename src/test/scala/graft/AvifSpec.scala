package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AvifEncode, AvifMeta}

/** AVIF triage: encode→parse round trips across brands, depths and
  * channel counts; the box-walk robustness matrix; and the decline
  * envelope (parse-or-NULL, never a throw or overrun). */
class AvifSpec extends AnyFunSuite {

  test("round trips every reported field across the fixture matrix") {
    for {
      (w, h) <- Seq((1, 1), (816, 616), (0xFFFFFF, 0xFFFFFF))
      seed <- 0L until 12L
      animated <- Seq(false, true)
    } {
      val b = AvifEncode.encode(w, h, seed, animated)
      assert(b != null)
      val m = AvifMeta.parse(b)
      assert(m != null, s"parse refused w=$w seed=$seed anim=$animated")
      assert(m.getString(0) === (if (animated) "avis" else "avif"))
      assert(m.getInt(1) === w && m.getInt(2) === h)
      assert(m.getInt(3) === Array(8, 10, 12)((seed % 3).toInt))
      assert(m.getInt(4) === (if (seed % 2 == 0) 1 else 3))
      assert(m.getBoolean(5) === animated)
    }
  }

  test("box-walk robustness: unknown siblings skip, largesize accepted") {
    val base = AvifEncode.encode(100, 80, 4L, false)
    // splice an unknown top-level box between ftyp and meta
    val ftypEnd = (((base(0) & 0xFF) << 24) | ((base(1) & 0xFF) << 16) |
      ((base(2) & 0xFF) << 8) | (base(3) & 0xFF))
    val junk = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++
      Array[Byte](1, 2, 3, 4)
    val spliced = base.take(ftypEnd) ++ junk ++ base.drop(ftypEnd)
    val m = AvifMeta.parse(spliced)
    assert(m != null && m.getInt(1) === 100, "free box broke the walk")
    // rewrite the mdat as a largesize box (size=1 + 64-bit length)
    val mdatAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 8 <= base.length) {
        if (base(i + 4) == 'm' && base(i + 5) == 'd' && base(i + 6) == 'a' &&
          base(i + 7) == 't') at = i
        else i += 1
      }
      at
    }
    assert(mdatAt > 0)
    val mdatSize = (((base(mdatAt) & 0xFF) << 24) | ((base(mdatAt + 1) & 0xFF) << 16) |
      ((base(mdatAt + 2) & 0xFF) << 8) | (base(mdatAt + 3) & 0xFF))
    val ls = base.take(mdatAt) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (mdatSize + 8).toByte) ++
      base.slice(mdatAt + 8, mdatAt + mdatSize)
    assert(AvifMeta.parse(ls) != null, "largesize mdat broke the walk")
  }

  test("decline envelope: wrong brand, missing meta, hostile sizes, mixed pixi") {
    val good = AvifEncode.encode(50, 40, 3L, false)
    for (n <- 0 until good.length) AvifMeta.parse(good.take(n)) // never throws
    // a HEIC (same container, different brand) is not an AVIF
    val heic = good.clone()
    System.arraycopy("heic".getBytes, 0, heic, 8, 4)
    assert(AvifMeta.parse(heic) == null)
    // a bare ftyp with no meta declines
    val ftypOnly = good.take((((good(0) & 0xFF) << 24) |
      ((good(1) & 0xFF) << 16) | ((good(2) & 0xFF) << 8) | (good(3) & 0xFF)))
    assert(AvifMeta.parse(ftypOnly) == null)
    // a lying box size past the buffer declines
    val lying = good.clone(); lying(0) = 0x7F
    assert(AvifMeta.parse(lying) == null)
    // mixed per-channel pixi depths decline the depth/channel FIELDS
    val mixed = AvifEncode.encode(50, 40, 1L, false) // channels=3 (seed odd)
    val pixiAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 8 <= mixed.length) {
        if (mixed(i + 4) == 'p' && mixed(i + 5) == 'i' && mixed(i + 6) == 'x' &&
          mixed(i + 7) == 'i') at = i
        else i += 1
      }
      at
    }
    assert(pixiAt > 0)
    mixed(pixiAt + 8 + 5 + 1) = 9 // second channel depth differs
    val mm = AvifMeta.parse(mixed)
    assert(mm != null && mm.isNullAt(3) && mm.isNullAt(4),
      "mixed pixi depths must decline the fields, not misreport")
    assert(mm.getInt(1) === 50, "dims survive a declined pixi")
    // encoder refuses out-of-range dims
    assert(AvifEncode.encode(0, 5, 1L, false) == null)
    assert(AvifEncode.encode(5, 0x1000000, 1L, false) == null)
  }
}
