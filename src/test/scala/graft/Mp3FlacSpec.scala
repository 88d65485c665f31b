package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{FlacMeta, Mp3Meta}

/** Compressed-audio triage: FLAC metadata-chain and MPEG Layer III
  * frame-chain encode→parse round trips, the chain-integrity laws
  * (truncation → NULL, desync → NULL), the ID3v2/ID3v1 envelope
  * handling, and the deliberate declines (Layer I/II, free-format
  * bitrate, reserved indices) — the parse-or-NULL contract everything
  * at corpus scale rests on. */
class Mp3FlacSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- FLAC

  test("FLAC STREAMINFO round-trips across the packed-field space") {
    // sweep each field through its bit-boundary values: 20-bit rate,
    // 3-bit channels, 5-bit depth, 36-bit total crossing 2^32
    val cases = Seq(
      (8000, 1, 4, 0L), (44100, 2, 16, 1234567L), (96000, 8, 24, 0xFFFFFFFFL),
      (655350, 3, 32, (1L << 36) - 1), (11025, 6, 12, 1L << 32))
    for (((sr, ch, bits, total), k) <- cases.zipWithIndex) {
      val b = FlacMeta.encode(sr, ch, bits, total, 31L + k, 5 * k)
      val m = FlacMeta.parse(b)
      assert(m != null, s"case $k parse")
      assert(m.getInt(0) === sr); assert(m.getInt(1) === ch)
      assert(m.getInt(2) === bits); assert(m.getLong(3) === total)
      assert(m.getLong(4) === total * 1000L / sr)
      assert(m.getInt(5) === 3) // STREAMINFO + VORBIS_COMMENT + PADDING
      val md5 = (0 until 16).map(i => f"${(31L + k + 7 * i) % 256}%02x").mkString
      assert(m.getString(6) === md5)
    }
  }

  test("FLAC chain walk enforces structure: every violation is NULL, never a throw") {
    val good = FlacMeta.encode(48000, 2, 16, 99999L, 7L, 12)
    assert(FlacMeta.parse(good) != null)
    // truncation law: any prefix of a valid file is NULL, never a throw
    for (n <- 0 until good.length)
      assert(FlacMeta.parse(good.take(n)) == null, s"truncation at $n")
    // not-fLaC magic
    val notMagic = good.clone(); notMagic(0) = 'g'
    assert(FlacMeta.parse(notMagic) == null)
    // first block must be STREAMINFO (type 0, length 34)
    val wrongFirst = good.clone(); wrongFirst(4) = 0x04
    assert(FlacMeta.parse(wrongFirst) == null)
    // duplicate STREAMINFO mid-chain is a spec violation → NULL
    val dupInfo = good.clone(); dupInfo(42) = 0x00
    assert(FlacMeta.parse(dupInfo) == null)
    // forbidden block type 127 → NULL
    val forbidden = good.clone(); forbidden(42) = 0x7F
    assert(FlacMeta.parse(forbidden) == null)
    // hostile block length pointing past the buffer → NULL
    val hostileLen = good.clone()
    hostileLen(43) = 0xFF.toByte; hostileLen(44) = 0xFF.toByte
    assert(FlacMeta.parse(hostileLen) == null)
    // a chain that never sets the last-block flag → NULL (no overrun)
    val neverLast = good.dropRight(12 + 4) // drop the PADDING block
    assert(FlacMeta.parse(neverLast) == null)
    // zero sample rate is invalid per spec
    val zeroRate = FlacMeta.encode(1, 1, 8, 0L, 0L, 0)
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = (zeroRate(20) & 0x0F).toByte
    assert(FlacMeta.parse(zeroRate) == null)
  }

  // ----------------------------------------------------------------- MP3

  test("MP3 frame chains round-trip: CBR and VBR, all versions and rates") {
    for {
      verSel <- 0 to 2
      rateIdx <- 0 to 2
      vbrStep <- Seq(0, 3) // CBR and per-frame bitrate churn
    } {
      val n = 17
      val b = Mp3Meta.encode(n, verSel, rateIdx, mono = verSel == 1,
        seed = 5L, vbrStep = vbrStep, id3Len = 0, id3v1 = false)
      val m = Mp3Meta.parse(b)
      assert(m != null, s"v$verSel r$rateIdx s$vbrStep parse")
      assert(m.getString(0) === Seq("1", "2", "2.5")(verSel))
      val rate = (verSel match {
        case 0 => Mp3Meta.RateV1; case 1 => Mp3Meta.RateV2
        case _ => Mp3Meta.RateV25
      })(rateIdx)
      assert(m.getInt(1) === rate)
      assert(m.getInt(2) === (if (verSel == 1) 1 else 2))
      val brTable = if (verSel == 0) Mp3Meta.BitrateV1 else Mp3Meta.BitrateV2
      assert(m.getInt(3) === brTable(1 + 5 % 7)) // first frame, seed=5
      assert(m.getInt(4) === n)
      val spf = if (verSel == 0) 1152 else 576
      assert(m.getLong(5) === n.toLong * spf * 1000L / rate)
      assert(!m.getBoolean(6))
    }
  }

  test("MP3 ID3v2 prefix is skipped via syncsafe size; ID3v1 trailer accepted") {
    // syncsafe sizes that would differ under a plain 32-bit read
    for (id3Len <- Seq(1, 127, 128, 300, 16383, 16384)) {
      val b = Mp3Meta.encode(5, 0, 0, mono = false, seed = 9L,
        vbrStep = 1, id3Len = id3Len, id3v1 = true)
      val m = Mp3Meta.parse(b)
      assert(m != null, s"id3Len=$id3Len")
      assert(m.getInt(4) === 5)
      assert(m.getBoolean(6), "has_id3v2")
    }
    // a non-syncsafe size byte (high bit set) refuses the parse
    val bad = Mp3Meta.encode(3, 0, 0, mono = false, seed = 1L,
      vbrStep = 0, id3Len = 10, id3v1 = false)
    bad(6) = 0x80.toByte
    assert(Mp3Meta.parse(bad) == null)
    // ID3v1 trailer alone (no frames) is not an MP3
    val tagOnly = new Array[Byte](128)
    tagOnly(0) = 'T'; tagOnly(1) = 'A'; tagOnly(2) = 'G'
    assert(Mp3Meta.parse(tagOnly) == null)
  }

  test("MP3 truncation law and mid-stream desync → NULL") {
    val good = Mp3Meta.encode(8, 0, 1, mono = true, seed = 3L,
      vbrStep = 2, id3Len = 20, id3v1 = true)
    assert(Mp3Meta.parse(good) != null)
    // truncation law: a cut exactly on a frame boundary is itself a
    // valid shorter chain (fewer frames — or all 8 when only the
    // ID3v1 trailer was dropped); any other cut is NULL — never a
    // throw either way
    for (n <- 0 until good.length) {
      val m = Mp3Meta.parse(good.take(n))
      if (m != null) assert(m.getInt(4) <= 8, s"truncation at $n")
    }
    // trailing junk that is neither a frame nor a 128-byte TAG → NULL
    assert(Mp3Meta.parse(good ++ Array[Byte](1, 2, 3)) == null)
    // a mid-stream sample-rate-index drift breaks chain consistency
    val noTag = Mp3Meta.encode(4, 0, 1, mono = true, seed = 3L,
      vbrStep = 0, id3Len = 0, id3v1 = false)
    val frameLen = 144000 * Mp3Meta.BitrateV1(1 + 3 % 7) / Mp3Meta.RateV1(1) + 1
    val drift = noTag.clone()
    drift(frameLen + 2) = (drift(frameLen + 2) ^ 0x04).toByte // rate idx bit
    assert(Mp3Meta.parse(drift) == null)
  }

  test("audio tags: VORBIS_COMMENT and ID3v2.3/2.4 frames round-trip") {
    import graft.plans.AudioTags
    // FLAC: the encoder's real comment block, several seeds
    for (seed <- Seq(0L, 7L, 99L, 999L, 12345L)) {
      val f = FlacMeta.encode(44100, 2, 16, 1000L, seed, 4)
      val m = AudioTags.parse(f)
      assert(m != null, s"flac tags seed=$seed")
      assert(m.getString(0) === "flac")
      assert(m.getString(1) === s"t${seed % 1000}")
      assert(m.getString(2) === s"a${seed % 100}")
      assert(m.getString(3) === s"b${seed % 50}")
      assert(m.getString(4) === "graft")
    }
    // MP3: both tag versions (seed%3==0 -> v2.4 syncsafe frame sizes)
    for (seed <- Seq(6L, 7L, 77L * 3, 101L)) {
      val p = Mp3Meta.encode(4, 0, 1, mono = false, seed = seed,
        vbrStep = 1, id3Len = 120, id3v1 = false)
      val m = AudioTags.parse(p)
      assert(m != null, s"mp3 tags seed=$seed")
      assert(m.getString(0) === "mp3")
      assert(m.getString(1) === s"t${seed % 1000}", s"v2.${if (seed % 3 == 0) 4 else 3}")
      assert(m.getString(2) === s"a${seed % 100}")
      assert(m.getString(3) === s"b${seed % 50}")
      assert(m.isNullAt(4))
    }
    // an MP3 with no ID3 tag has no tag structure: NULL, not a row
    val bare = Mp3Meta.encode(3, 0, 0, mono = true, seed = 5L,
      vbrStep = 0, id3Len = 0, id3v1 = false)
    assert(AudioTags.parse(bare) == null)
    // an ID3 area too small for the frames carries opaque filler:
    // parse-or-NULL, never a misread title
    val filler = Mp3Meta.encode(3, 0, 0, mono = true, seed = 5L,
      vbrStep = 0, id3Len = 12, id3v1 = false)
    val fm = AudioTags.parse(filler)
    assert(fm == null || fm.isNullAt(1))
  }

  test("audio tags: UTF-16 text frames decode strictly, order never guessed") {
    import graft.plans.AudioTags
    // fixture rotation: seed%5==1 -> encoding 1 (BOM'd UTF-16LE);
    // seed%5==2 on v2.4 (seed%3==0) -> encoding 2 (UTF-16BE). Decoded
    // values must equal the ISO seeds' — the oracle is encoding-blind.
    for (seed <- Seq(6L, 101L, 12L, 66L)) {
      val p = Mp3Meta.encode(4, 0, 1, mono = false, seed = seed,
        vbrStep = 1, id3Len = 120, id3v1 = false)
      val m = AudioTags.parse(p)
      assert(m != null && m.getString(1) === s"t${seed % 1000}" &&
        m.getString(2) === s"a${seed % 100}" &&
        m.getString(3) === s"b${seed % 50}", s"utf16 fixture seed=$seed")
    }
    // hand-built v2.4 tag: non-ASCII BE and LE payloads round-trip
    def tag(ver: Int, enc: Int, payload: Array[Byte]): Array[Byte] = {
      val fsize = 1 + payload.length
      val size = 10 + fsize + 6 // frame + a little padding
      Array[Byte]('I', 'D', '3', ver.toByte, 0, 0,
        ((size >>> 21) & 0x7F).toByte, ((size >>> 14) & 0x7F).toByte,
        ((size >>> 7) & 0x7F).toByte, (size & 0x7F).toByte,
        'T', 'I', 'T', '2') ++ (
        if (ver == 4) Array[Byte](((fsize >>> 21) & 0x7F).toByte,
          ((fsize >>> 14) & 0x7F).toByte, ((fsize >>> 7) & 0x7F).toByte,
          (fsize & 0x7F).toByte)
        else Array[Byte]((fsize >>> 24).toByte, ((fsize >>> 16) & 0xFF).toByte,
          ((fsize >>> 8) & 0xFF).toByte, (fsize & 0xFF).toByte)) ++
        Array[Byte](0, 0, enc.toByte) ++ payload ++ Array.fill[Byte](6)(0)
    }
    val uml = "Müller"
    // encoding 1, BE BOM
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ uml.getBytes("UTF-16BE")
    val mBe = AudioTags.parse(tag(4, 1, be))
    assert(mBe != null && mBe.getString(1) === uml, "BOM'd UTF-16BE")
    // encoding 1, LE BOM, with trailing 16-bit NUL terminator
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++
      uml.getBytes("UTF-16LE") ++ Array[Byte](0, 0)
    val mLe = AudioTags.parse(tag(3, 1, le))
    assert(mLe != null && mLe.getString(1) === uml, "BOM'd UTF-16LE + NUL")
    // encoding 2 (BOM-less BE): v2.4 decodes, v2.3 declines the field
    val bare = uml.getBytes("UTF-16BE")
    val m24 = AudioTags.parse(tag(4, 2, bare))
    assert(m24 != null && m24.getString(1) === uml, "v2.4 encoding 2")
    val m23 = AudioTags.parse(tag(3, 2, bare))
    assert(m23 != null && m23.isNullAt(1), "encoding 2 is not valid in v2.3")
    // strictness: odd length, lone surrogate, missing BOM all decline
    assert(AudioTags.parse(tag(4, 1, be.dropRight(1))).isNullAt(1), "odd length")
    val loneSurrogate = Array[Byte](0xFE.toByte, 0xFF.toByte, 0xD8.toByte, 0x00)
    assert(AudioTags.parse(tag(4, 1, loneSurrogate)).isNullAt(1), "lone surrogate")
    assert(AudioTags.parse(tag(4, 1, uml.getBytes("UTF-16BE"))).isNullAt(1),
      "encoding 1 without a BOM must decline, never guess the order")
  }

  test("audio tags: ID3v2.2 six-byte frames decode, both encodings") {
    import graft.plans.AudioTags
    // hand-built v2.2 tag: 3-char IDs, 3-byte plain-BE sizes, no flags
    def tag22(frames: Seq[(String, Int, Array[Byte])], pad: Int): Array[Byte] = {
      val body = frames.flatMap { case (id, enc, payload) =>
        id.getBytes("US-ASCII").toSeq ++ Seq[Byte](
          0, 0, (1 + payload.length).toByte) ++ Seq(enc.toByte) ++ payload
      } ++ Seq.fill[Byte](pad)(0)
      val size = body.length
      Array[Byte]('I', 'D', '3', 2, 0, 0,
        ((size >>> 21) & 0x7F).toByte, ((size >>> 14) & 0x7F).toByte,
        ((size >>> 7) & 0x7F).toByte, (size & 0x7F).toByte) ++ body
    }
    val uml = "Müller"
    val iso = tag22(Seq(
      ("TT2", 0, "Old Rip".getBytes("ISO-8859-1")),
      ("TP1", 0, uml.getBytes("ISO-8859-1")),
      ("TAL", 0, "B".getBytes("ISO-8859-1"))), pad = 4)
    val m = AudioTags.parse(iso)
    assert(m != null && m.getString(0) === "mp3")
    assert(m.getString(1) === "Old Rip" && m.getString(2) === uml &&
      m.getString(3) === "B", "v2.2 ISO frames")
    // encoding 1 = BOM'd UCS-2 (both orders), decoded strictly
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ uml.getBytes("UTF-16BE")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ uml.getBytes("UTF-16LE")
    val u16 = tag22(Seq(("TT2", 1, be), ("TP1", 1, le)), pad = 2)
    val mu = AudioTags.parse(u16)
    assert(mu != null && mu.getString(1) === uml && mu.getString(2) === uml,
      "v2.2 UCS-2 frames")
    // BOM-less UCS-2 declines the field (order never guessed)
    val noBom = tag22(Seq(("TT2", 1, uml.getBytes("UTF-16BE"))), pad = 2)
    assert(AudioTags.parse(noBom).isNullAt(1))
    // hostile frame size past the tag: NULL, never a misread
    val hostile = iso.clone()
    val tt2 = new String(hostile, "ISO-8859-1").indexOf("TT2")
    hostile(tt2 + 5) = 0x7F // 3-byte size now far past tagEnd
    assert(AudioTags.parse(hostile) == null)
    // truncation law
    for (n <- 0 until iso.length) AudioTags.parse(iso.take(n))
    for (n <- 0 until u16.length) AudioTags.parse(u16.take(n))
  }

  test("audio tags: key case-insensitivity, UTF-16 decline, hostile lengths") {
    import graft.plans.AudioTags
    val good = FlacMeta.encode(48000, 1, 8, 10L, 42L, 2)
    // lowercase 'title' key must still resolve (Vorbis keys are
    // case-insensitive): rewrite the KEY bytes in place
    val lc = good.clone()
    val tIdx = new String(lc, "ISO-8859-1").indexOf("TITLE=")
    assert(tIdx > 0)
    "title".zipWithIndex.foreach { case (c, i) => lc(tIdx + i) = c.toByte }
    val lm = AudioTags.parse(lc)
    assert(lm != null && lm.getString(1) === "t42")
    // a hostile comment length pointing past the block: NULL
    val hostile = good.clone()
    val vcLenIdx = tIdx - 4 // the comment's own LE length field
    hostile(vcLenIdx) = 0xFF.toByte; hostile(vcLenIdx + 1) = 0xFF.toByte
    assert(AudioTags.parse(hostile) == null)
    // ID3: a UTF-16 text frame declines the FIELD, not the row
    val mp3 = Mp3Meta.encode(3, 0, 0, mono = true, seed = 7L,
      vbrStep = 0, id3Len = 120, id3v1 = false)
    val enc16 = mp3.clone()
    val titleAt = new String(enc16, "ISO-8859-1").indexOf("TIT2")
    assert(titleAt > 0)
    enc16(titleAt + 10) = 1 // encoding byte: UTF-16 with BOM
    val em = AudioTags.parse(enc16)
    assert(em != null && em.isNullAt(1) && em.getString(2) === "a7")
    // truncation law over both containers: never a throw
    for (n <- 0 until good.length) AudioTags.parse(good.take(n))
    for (n <- 0 until mp3.length) AudioTags.parse(mp3.take(n))
    // REGRESSION (r13 review): a hostile v2.3 frame size near 2^31
    // overflowed the Int bounds sum and crashed instead of NULLing —
    // the bounds must compare in Long
    val overflow = Array[Byte]('I', 'D', '3', 3, 0, 0,
      0, 0, 0, 21, // syncsafe tag size 21
      'T', 'I', 'T', '2',
      0x7F, 0xFF.toByte, 0xFF.toByte, 0xF0.toByte, // fsize ~ 2^31
      0, 0, // flags
      0) ++ Array.fill[Byte](10)(0x41)
    assert(AudioTags.parse(overflow) == null, "overflowing frame size must NULL")
  }

  test("MP3 declines: Layer I/II, free-format, reserved version/rate, non-III chains") {
    val good = Mp3Meta.encode(3, 0, 0, mono = false, seed = 0L,
      vbrStep = 0, id3Len = 0, id3v1 = false)
    // Layer bits: 01 = III (accepted); 10 = II, 11 = I, 00 = reserved
    for (layerBits <- Seq(0x0, 0x2, 0x3)) {
      val b = good.clone()
      b(1) = ((b(1) & ~0x06) | (layerBits << 1)).toByte
      assert(Mp3Meta.parse(b) == null, s"layer bits $layerBits")
    }
    // reserved version (01)
    val rv = good.clone(); rv(1) = ((rv(1) & ~0x18) | 0x08).toByte
    assert(Mp3Meta.parse(rv) == null)
    // free-format bitrate (index 0) and invalid (index 15)
    for (brIdx <- Seq(0x0, 0xF)) {
      val b = good.clone()
      b(2) = ((b(2) & 0x0F) | (brIdx << 4)).toByte
      assert(Mp3Meta.parse(b) == null, s"bitrate idx $brIdx")
    }
    // reserved sample-rate index (3)
    val rr = good.clone(); rr(2) = ((rr(2) & ~0x0C) | 0x0C).toByte
    assert(Mp3Meta.parse(rr) == null)
  }
}
