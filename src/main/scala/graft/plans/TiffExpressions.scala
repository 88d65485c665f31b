package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** TIFF pixel decode — extending the EXIF-substrate coverage past the
  * r10 header triage (ImageExpressions.scala parseTiff, dims only) to
  * real raster data, from the public TIFF 6.0 spec alone.
  *
  * The DECODE envelope (everything below has passing round-trip
  * oracles and both-direction JDK differentials): grayscale
  * (PhotometricInterpretation=1), RGB (=2) and 8-bit Palette (=3,
  * ColorMap tag 320), BOTH byte orders, uncompressed (Compression=1),
  * TIFF-flavor LZW (=5, see [[TiffLzw]]) with or without the
  * horizontal predictor (317), or PackBits RLE (=32773, see
  * [[TiffPackBits]]; predictor declined — the tag is LZW's
  * companion), organized as chunky strips, 16×16+
  * tiles (322-325, padded edges ignored), or separate planes
  * (PlanarConfiguration=2, decoded in strips), 16-bit samples in
  * chunky strips (summed by the HIGH byte, the PNG-16 convention),
  * and 1/2/4-bit packed grayscale/bilevel (the fax/scan shapes,
  * photometric 0 or 1) plus 4-bit PACKED PALETTES in chunky strips — MSB-first within each
  * byte, rows byte-aligned, RAW sample-value sums, BitsPerSample
  * defaulting to 1 when the tag is absent per spec.
  *
  * The DECLINE envelope (NULL, never wrong-valued; format/dims still
  * triage via graft_img_meta): JPEG-in-TIFF and other compressions,
  * palette outside 4/8-bit chunky strips (and any index-width /
  * ColorMap-size disagreement), 16-bit tiled/planar
  * combinations, sub-8-bit outside single-sample chunky strips (or
  * with a predictor — tag 317 is defined on 8/16-bit samples),
  * WhiteIsZero outside the sub-byte shapes, and >16-bit samples.
  *
  * `graft_tiff_pixels(binary)` → the [[BmpStats]] schema (width,
  * height, channel sums, n_pixels; grayscale replicates its sum to
  * all three channels; palette sums the looked-up ColorMap high
  * bytes).
  *
  * The strip walk is the part the oracle certifies: IFD0's
  * StripOffsets / StripByteCounts / RowsPerStrip (SHORT or LONG,
  * inline or out-of-line by the count×size>4 rule) partition the
  * image into row bands; every strip's byte count must equal exactly
  * rows_in_strip × width × samples, land inside the buffer, and the
  * strips must tile the height. That strictness makes the parse
  * total AND time-bounded with no extra ceiling: every decoded byte
  * exists in the input, so work is O(input). Per-row byte walk
  * inside whole-stage codegen, same execution shape as
  * [[BmpStats]]. */
case class TiffPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tiff_pixels expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_pixels"

  override def nullSafeEval(input: Any): Any =
    TiffPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.TiffPixels.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TiffPixels =
    copy(child = newChild)
}

object TiffPixels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 14) return null
    val le =
      if (u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0) true
      else if (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 42) false
      else return null
    def r16(i: Int): Int =
      if (le) u8(b, i) | (u8(b, i + 1) << 8) else (u8(b, i) << 8) | u8(b, i + 1)
    def r32(i: Int): Long =
      if (le) u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
      else (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
        (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = r16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n > b.length) return null

    // entry value reader: SHORT(3)/LONG(4) arrays, inline when
    // count×size <= 4, else behind the 32-bit offset in the value
    // field (TIFF 6.0 §2). Returns null on any bound violation.
    def readArray(off: Int): Array[Long] = {
      val typ = r16(off + 2)
      val count = r32(off + 4)
      val size = typ match {
        case 3 => 2L
        case 4 => 4L
        case _ => return null
      }
      // 3 * 65536: a 16-bit palette's ColorMap, the largest legal array
      if (count <= 0 || count > 3 * 65536) return null
      val total = count * size
      val at =
        if (total <= 4) off + 8L
        else {
          val p = r32(off + 8)
          if (p < 8 || p + total > b.length) return null
          p
        }
      if (at + total > b.length) return null
      val out = new Array[Long](count.toInt)
      var i = 0
      while (i < count) {
        out(i) = if (size == 2) r16((at + 2 * i).toInt) else r32((at + 4 * i).toInt)
        i += 1
      }
      out
    }
    def readScalar(off: Int): Long = {
      val a = readArray(off)
      if (a == null || a.length != 1) -1L else a(0)
    }

    var w = -1L; var h = -1L
    var comp = 1L; var photo = -1L; var spp = 1L; var planar = 1L
    var pred = 1L // Predictor (317): 1 = none, 2 = horizontal differencing
    var rps = -1L // absent = one strip spanning the whole image
    var bps: Array[Long] = null
    var offsets: Array[Long] = null
    var counts: Array[Long] = null
    var tw = -1L; var th = -1L // tiled organization (322/323)
    var tileOffsets: Array[Long] = null
    var tileCounts: Array[Long] = null
    var colorMap: Array[Long] = null // ColorMap (320): r[..], g[..], b[..]
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + 12 * e
      r16(off) match {
        case 256 => w = readScalar(off)
        case 257 => h = readScalar(off)
        case 258 => bps = readArray(off); if (bps == null) return null
        case 259 => comp = readScalar(off)
        case 262 => photo = readScalar(off)
        case 273 => offsets = readArray(off); if (offsets == null) return null
        case 277 => spp = readScalar(off)
        case 278 => rps = readScalar(off)
        case 279 => counts = readArray(off); if (counts == null) return null
        case 284 => planar = readScalar(off)
        case 317 => pred = readScalar(off)
        case 320 => colorMap = readArray(off); if (colorMap == null) return null
        case 322 => tw = readScalar(off)
        case 323 => th = readScalar(off)
        case 324 => tileOffsets = readArray(off); if (tileOffsets == null) return null
        case 325 => tileCounts = readArray(off); if (tileCounts == null) return null
        case _ => // unknown tags are skipped (EXIF etc.)
      }
      e += 1
    }

    // the decode envelope: 8-bit chunky gray or RGB, uncompressed,
    // TIFF-flavor LZW, or PackBits (=32773, TIFF 6.0 §9 RLE),
    // horizontal predictor or none
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    if ((comp != 1L && comp != 5L && comp != 32773L) ||
      (planar != 1L && planar != 2L)) return null
    if (pred != 1L && pred != 2L) return null
    // the predictor (317) is LZW's companion in the spec; a PackBits
    // file carrying it is out of envelope — decline, never misread
    if (pred == 2L && comp == 32773L) return null
    // the LZW/PackBits paths allocate the decompressed strip (the
    // input bytes no longer bound it): hostile headers need a ceiling
    if ((comp == 5L || comp == 32773L) && w * h > MaxLzwPixels) return null
    if (photo == 0L || photo == 1L) { if (spp != 1L) return null }
    else if (photo == 2L) { if (spp != 3L) return null }
    else if (photo == 3L) {
      // Palette color (TIFF 6.0 §5): one 4-, 8- or 16-bit index per
      // pixel looked up in ColorMap (320) — 3 × 2^bits 16-bit planes
      // (r, g, b). Envelope: chunky strips (reusing the strip / LZW /
      // PackBits machinery); tiles and planar decline.
      if (spp != 1L || colorMap == null ||
        (colorMap.length != 3 * 256 && colorMap.length != 3 * 16 &&
          colorMap.length != 3 * 65536))
        return null
    }
    else return null
    val palette = photo == 3L
    // BitsPerSample: 8-bit everywhere; 16-bit (summed by the HIGH
    // byte, the PNG-16 convention) in chunky strips; 1/2/4-bit packed
    // grayscale/bilevel (the fax/scan shapes — raw sample-value sums,
    // MSB-first within the byte, rows byte-aligned) in chunky strips.
    // An ABSENT tag 258 defaults to 1 bit per the spec — the classic
    // minimal bilevel file.
    var bitsN = 1L
    if (bps != null) {
      if (bps.length != spp.toInt) return null
      bitsN = bps(0)
      var bi = 1
      while (bi < bps.length) { if (bps(bi) != bitsN) return null; bi += 1 }
    }
    if (bitsN != 1L && bitsN != 2L && bitsN != 4L && bitsN != 8L && bitsN != 16L)
      return null
    val bits16 = bitsN == 16L
    val subByte = bitsN < 8L
    // exactly ONE organization: classic strips or tiles (322-325);
    // the planar (separate-plane) layout decodes in strips only
    val tiled = tileOffsets != null || tileCounts != null || tw > 0 || th > 0
    if (tiled && (offsets != null || counts != null)) return null
    if (!tiled && (offsets == null || counts == null)) return null
    if (tiled && planar == 2L) return null
    if (palette && ((bitsN != 8L && bitsN != 4L && bitsN != 16L) ||
      tiled || planar == 2L))
      return null // 4/8/16-bit chunky strips only
    // the index width and the ColorMap size must agree — a 4-bit file
    // with a 256-entry map (or vice versa) is malformed, not guessable
    if (palette && colorMap.length != 3 * (1 << bitsN.toInt)) return null
    // sub-8-bit: single-sample gray/bilevel/palette chunky strips, no
    // predictor (tag 317's byte/value differencing is defined on
    // 8/16-bit samples)
    if (subByte && (spp != 1L || tiled || planar == 2L || pred != 1L))
      return null
    // WhiteIsZero only enters through the sub-byte fax/scan shapes;
    // the certified 8/16-bit envelope stays at photometric 1/2/3
    if (photo == 0L && !subByte) return null

    val sppI = spp.toInt
    var (sr, sg, sb) = (0L, 0L, 0L)

    // one strip/tile's bytes: raw samples (comp=1, byte count must
    // equal the block size exactly) or a decompressed buffer (comp=5,
    // byte count is the COMPRESSED size); then the tag-317 horizontal
    // predictor integrated per stored row of `widthBytes` with the
    // given sample stride (spp for chunky rows, 1 inside a plane)
    def loadBlock(at: Long, cnt: Long, expect: Long, rows: Int,
        widthBytes: Int, stride: Int): Array[Byte] = {
      if (expect > (1L << 26)) return null // hostile tile/strip geometry
      val block: Array[Byte] =
        if (comp == 1L) {
          if (cnt != expect) return null
          if (at < 8 || at + expect > b.length) return null
          java.util.Arrays.copyOfRange(b, at.toInt, (at + expect).toInt)
        } else if (comp == 32773L) {
          if (cnt <= 0 || at < 8 || at + cnt > b.length) return null
          val out = new Array[Byte](expect.toInt)
          if (!TiffPackBits.decode(b, at.toInt, (at + cnt).toInt, out)) return null
          out
        } else {
          if (cnt <= 0 || at < 8 || at + cnt > b.length) return null
          val out = new Array[Byte](expect.toInt)
          if (!TiffLzw.decode(b, at.toInt, (at + cnt).toInt, out)) return null
          out
        }
      if (pred == 2L && !bits16) {
        var r0 = 0
        while (r0 < rows) {
          var i = r0 * widthBytes + stride
          val end = (r0 + 1) * widthBytes
          while (i < end) { block(i) = (block(i) + block(i - stride)).toByte; i += 1 }
          r0 += 1
        }
      } else if (pred == 2L) {
        // 16-bit predictor differences whole VALUES (mod 2^16), stored
        // in the file's byte order
        def rd(i: Int): Int =
          if (le) (block(i) & 0xFF) | ((block(i + 1) & 0xFF) << 8)
          else ((block(i) & 0xFF) << 8) | (block(i + 1) & 0xFF)
        def wr(i: Int, v: Int): Unit =
          if (le) { block(i) = (v & 0xFF).toByte; block(i + 1) = ((v >> 8) & 0xFF).toByte }
          else { block(i) = ((v >> 8) & 0xFF).toByte; block(i + 1) = (v & 0xFF).toByte }
        var r0 = 0
        while (r0 < rows) {
          var i = r0 * widthBytes + 2 * stride
          val end = (r0 + 1) * widthBytes
          while (i < end) { wr(i, (rd(i) + rd(i - 2 * stride)) & 0xFFFF); i += 2 }
          r0 += 1
        }
      }
      block
    }

    // 8- vs 16-bit stride and the HIGH byte's offset in the file byte
    // order — shared by every organization (chunky/planar/tiled)
    val bytesPerG = if (bits16) 2 else 1
    val hbOffG = if (bits16 && le) 1 else 0
    if (!tiled && planar == 2L) {
      // separate-plane layout (PlanarConfiguration = 2): the strip
      // arrays hold plane 0's strips, then plane 1's, ... — each strip
      // carries ONE sample per pixel, so the plane index IS the channel
      if (rps == -1L) rps = h
      if (rps <= 0) return null
      val nStrips = ((h + rps - 1) / rps).toInt
      if (offsets.length != nStrips * sppI || counts.length != nStrips * sppI)
        return null
      var c = 0
      while (c < sppI) {
        var s = 0
        while (s < nStrips) {
          val rows = math.min(rps, h - s.toLong * rps)
          val expect = rows * w * bytesPerG
          if (expect > Int.MaxValue) return null
          val strip = loadBlock(offsets(c * nStrips + s), counts(c * nStrips + s),
            expect, rows.toInt, (w * bytesPerG).toInt, 1)
          if (strip == null) return null
          var i = 0
          while (i < strip.length) {
            val v = u8(strip, i + hbOffG)
            if (c == 0) sr += v else if (c == 1) sg += v else sb += v
            i += bytesPerG
          }
          s += 1
        }
        c += 1
      }
    } else if (!tiled) {
      if (rps == -1L) rps = h // default 2^32-1: all rows in one strip
      if (rps <= 0) return null
      val nStrips = ((h + rps - 1) / rps).toInt
      if (offsets.length != nStrips || counts.length != nStrips) return null
      val bytesPer = bytesPerG
      val rowBytes =
        if (subByte) (w * bitsN + 7) / 8 // packed rows, byte-aligned
        else w * spp * bytesPer
      val hbOff = hbOffG
      var s = 0
      while (s < nStrips) {
        val rows = math.min(rps, h - s.toLong * rps)
        val expect = rows * rowBytes
        if (expect > Int.MaxValue) return null
        val strip = loadBlock(offsets(s), counts(s), expect, rows.toInt,
          rowBytes.toInt, sppI)
        if (strip == null) return null
        var i = 0
        if (subByte) {
          // packed sub-byte samples: MSB-first within each byte, every
          // row padded to a byte boundary — the pad bits are ignored,
          // only the w real samples of each row are summed (raw
          // sample values: 0..2^bits-1, the stored fax/scan levels)
          val bitsI = bitsN.toInt
          val perByte = 8 / bitsI
          val mask = (1 << bitsI) - 1
          val rb = rowBytes.toInt
          val wI = w.toInt
          val cmSize = if (palette) 1 << bitsI else 0
          var r0 = 0
          while (r0 < rows.toInt) {
            val base = r0 * rb
            var x = 0
            while (x < wI) {
              val shift = 8 - bitsI * (x % perByte + 1)
              val v = (u8(strip, base + x / perByte) >> shift) & mask
              if (palette) {
                // packed palette index → ColorMap high bytes (the
                // same convention as the 8-bit palette path)
                sr += colorMap(v) >> 8
                sg += colorMap(cmSize + v) >> 8
                sb += colorMap(2 * cmSize + v) >> 8
              } else sr += v
              x += 1
            }
            r0 += 1
          }
        } else if (palette && bits16) {
          // 16-bit index in the FILE byte order (unlike the sample
          // path's high-byte shortcut, the whole index addresses the
          // 65536-entry map — both bytes are load-bearing)
          while (i + 1 < strip.length) {
            val idx =
              if (le) u8(strip, i) | (u8(strip, i + 1) << 8)
              else (u8(strip, i) << 8) | u8(strip, i + 1)
            sr += colorMap(idx) >> 8
            sg += colorMap(65536 + idx) >> 8
            sb += colorMap(2 * 65536 + idx) >> 8
            i += 2
          }
        } else if (palette) {
          // index → 16-bit ColorMap entry; report the HIGH byte, the
          // same 8-bit convention as the 16-bit sample path (and what
          // the JDK's TIFF reader hands back for palette files)
          while (i < strip.length) {
            val idx = u8(strip, i)
            sr += colorMap(idx) >> 8
            sg += colorMap(256 + idx) >> 8
            sb += colorMap(512 + idx) >> 8
            i += 1
          }
        } else if (spp == 1L) {
          while (i < strip.length) { sr += u8(strip, i + hbOff); i += bytesPer }
        } else {
          while (i < strip.length) {
            sr += u8(strip, i + hbOff)
            sg += u8(strip, i + bytesPer + hbOff)
            sb += u8(strip, i + 2 * bytesPer + hbOff)
            i += 3 * bytesPer
          }
        }
        s += 1
      }
    } else {
      // tiled organization (the GeoTIFF / whole-slide layout): every
      // tile is stored FULL-SIZE — edge tiles carry padding past the
      // image bounds whose bytes are arbitrary and must NOT be summed
      if (tw <= 0 || th <= 0 || tileOffsets == null || tileCounts == null)
        return null
      val across = ((w + tw - 1) / tw).toInt
      val down = ((h + th - 1) / th).toInt
      val nTiles = across.toLong * down
      if (nTiles > 65536 ||
          tileOffsets.length != nTiles || tileCounts.length != nTiles)
        return null
      val tileRowBytes = (tw * spp * bytesPerG).toInt
      val expect = tw * th * spp * bytesPerG
      var t = 0
      while (t < nTiles) {
        val tile = loadBlock(tileOffsets(t), tileCounts(t), expect,
          th.toInt, tileRowBytes, sppI)
        if (tile == null) return null
        val x0 = (t % across) * tw
        val y0 = (t / across) * th
        val xs = math.min(tw, w - x0).toInt // in-image extent
        val ys = math.min(th, h - y0).toInt
        var y2 = 0
        while (y2 < ys) {
          var i = y2 * tileRowBytes
          val end = i + xs * sppI * bytesPerG
          if (spp == 1L) {
            while (i < end) { sr += u8(tile, i + hbOffG); i += bytesPerG }
          } else {
            while (i < end) {
              sr += u8(tile, i + hbOffG)
              sg += u8(tile, i + bytesPerG + hbOffG)
              sb += u8(tile, i + 2 * bytesPerG + hbOffG)
              i += 3 * bytesPerG
            }
          }
          y2 += 1
        }
        t += 1
      }
    }
    if (spp == 1L && !palette) { sg = sr; sb = sr } // gray replicates, like JPEG gray
    new GenericInternalRow(Array[Any](w.toInt, h.toInt, sr, sg, sb, w * h))
  }

  /** Hostile-header ceiling on decompressed pixels for the LZW path —
    * the compressed input no longer bounds the output allocation. */
  val MaxLzwPixels: Long = 1L << 22
}

/** TIFF-flavor LZW (TIFF 6.0 §13) — shares the LZW idea with the GIF
  * core but differs in every framing detail: codes pack MSB-first
  * (GIF: LSB-first), there are no data sub-blocks, the dictionary
  * starts at 258 (256 = ClearCode, 257 = EOI), and the code width
  * uses the EARLY-CHANGE rule — it grows one entry sooner than GIF's
  * (at table size 511/1023/2047), certified here in both directions
  * against the JDK's own TIFF codec. Encoder and decoder live
  * together so their width schedule cannot drift: the decoder widens
  * on ITS table counter, the encoder on the counter the decoder WILL
  * have when reading that code (one entry behind its own). */
object TiffLzw {

  private def widthOf(next: Int): Int =
    if (next >= 2047) 12 else if (next >= 1023) 11 else if (next >= 511) 10 else 9

  /** Decodes [from, to) into `out` (whose length is the EXACT expected
    * strip size). Returns false on any structural error: code beyond
    * the table, output over/underflow, truncated stream. */
  def decode(b: Array[Byte], from: Int, to: Int, out: Array[Byte]): Boolean = {
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258; var width = 9
    var bitBuf = 0L; var bits = 0; var p = from
    var prev = -1
    var o = 0
    def readCode(): Int = {
      while (bits < width) {
        if (p >= to) return -1
        bitBuf = (bitBuf << 8) | (b(p) & 0xFF); p += 1; bits += 8
      }
      bits -= width
      ((bitBuf >> bits) & ((1 << width) - 1)).toInt
    }
    // first byte of a code's expansion (walks the prefix chain)
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= 258) c = prefix(c)
      c
    }
    // append code's expansion to out; false on overflow/corruption
    def emit(code: Int): Boolean = {
      var c = code; var sp = 0
      while (c >= 258) {
        if (sp >= stack.length) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (c >= 256) return false // Clear/EOI inside a chain: corrupt
      if (o + sp + 1 > out.length) return false
      out(o) = c.toByte; o += 1
      while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
      true
    }
    while (true) {
      val code = readCode()
      if (code < 0) return false // ran out of input before EOI
      if (code == 256) { next = 258; width = 9; prev = -1 }
      else if (code == 257) return o == out.length
      else if (prev == -1) {
        if (code > 255) return false // first code after clear: literal only
        if (o >= out.length) return false
        out(o) = code.toByte; o += 1
        prev = code
      } else {
        if (next >= 4096) return false // table overflow without a clear
        if (code < next) {
          prefix(next) = prev; suffix(next) = firstOf(code).toByte
          next += 1
          if (!emit(code)) return false
        } else if (code == next) { // KwKwK
          prefix(next) = prev; suffix(next) = firstOf(prev).toByte
          next += 1
          if (!emit(code)) return false
        } else return false // beyond the table: corrupt
        prev = code
        width = widthOf(next) // early change: on the DECODER's counter
      }
    }
    false // unreachable
  }

  /** Compresses `data` as one TIFF LZW strip (leading ClearCode,
    * trailing EOI, early-change width schedule on the decoder's
    * lagged counter). Real dictionary compression, not literal-only —
    * the width transitions actually occur on realistic strips. */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var bitBuf = 0L; var bits = 0
    var next = 258
    val table = new java.util.HashMap[Integer, Integer]()
    // the decoder adds one entry per received code but the encoder adds
    // one per MISS, so DURING the stream the decoder runs one entry
    // behind — mid-stream codes pack at the lagged width
    def put(code: Int): Unit = putAt(code, widthOf(math.max(next - 1, 258)))
    def putAt(code: Int, width: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bits += width
      while (bits >= 8) { bits -= 8; out.write(((bitBuf >> bits) & 0xFF).toInt) }
    }
    put(256) // spec: every strip begins with a ClearCode
    var prev = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xFF
      if (prev == -1) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val hit = table.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          table.put(key, Integer.valueOf(next)); next += 1
          if (next >= 4094) { // table nearly full: reset (spec §13)
            put(256)
            table.clear(); next = 258
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    // the final flush emission above comes from end-of-data, not a
    // miss — it adds NO table entry, so the decoder (which adds one
    // per code) has CAUGHT UP by the time it reads EOI: the EOI packs
    // at the UNLAGGED width, or a width boundary landing exactly at
    // the stream end desyncs the last code
    putAt(257, widthOf(next)) // EOI
    if (bits > 0) out.write(((bitBuf << (8 - bits)) & 0xFF).toInt)
    out.toByteArray
  }
}

/** TIFF PackBits (TIFF 6.0 §9) — the Apple-heritage byte-RLE every
  * scanner pipeline emits: a signed control byte n, then n in 0..127
  * copies n+1 literal bytes, n in -127..-1 repeats the next byte
  * 1-n times, and -128 is a no-op. Decode is parse-or-NULL: any
  * packet overrunning the input or the output, or a stream that
  * fails to fill the strip exactly, refuses the file. */
private[graft] object TiffPackBits {

  def decode(b: Array[Byte], from: Int, to: Int, out: Array[Byte]): Boolean = {
    var i = from
    var o = 0
    while (i < to && o < out.length) {
      val n = b(i)
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > to || o + cnt > out.length) return false
        System.arraycopy(b, i, out, o, cnt)
        i += cnt; o += cnt
      } else if (n != -128) { // -128 is a spec no-op
        val cnt = 1 - n
        if (i >= to || o + cnt > out.length) return false
        java.util.Arrays.fill(out, o, o + cnt, b(i))
        i += 1; o += cnt
      }
    }
    o == out.length
  }

  /** Per-ROW compression (the spec's boundary rule: packets never
    * cross row boundaries): greedy runs of >= 3 identical bytes
    * become repeat packets, everything else literal packets of up to
    * 128 bytes — real RLE, not literal-only, so the fixture exercises
    * both packet kinds and the -128 no-op never appears. */
  def encode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < data.length) {
      val end = math.min(r + rowBytes, data.length)
      var i = r
      while (i < end) {
        // length of the run starting at i (capped at 128)
        var run = 1
        while (i + run < end && run < 128 && data(i + run) == data(i)) run += 1
        if (run >= 3) {
          out.write(1 - run) // repeat packet
          out.write(data(i))
          i += run
        } else {
          // literal packet: up to 128 bytes, stopping before a >=3 run
          var j = i + run
          var lit = run
          while (j < end && lit < 128) {
            var r2 = 1
            while (j + r2 < end && r2 < 3 && data(j + r2) == data(j)) r2 += 1
            if (r2 >= 3) j = end // force stop: next packet takes the run
            else { j += 1; lit += 1 }
          }
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      r = end
    }
    out.toByteArray
  }
}

/** `graft_tiff_encode(w, h, seed, mode, rows_per_strip)` → binary: a
  * valid baseline TIFF. Modes 0..11 are chunky strips (`mode % 4`:
  * 0 = LE RGB, 1 = BE RGB, 2 = LE gray, 3 = BE gray; `mode / 4`:
  * 0 = uncompressed, 1 = TIFF LZW ([[TiffLzw]]), 2 = LZW + horizontal
  * predictor); 12..23 the same matrix as 16×16 tiles; 24..35 as
  * separate planes; 36..47 as 16-bit chunky strips (sample = v·257);
  * 48..51 palette color (bit 0 = byte order, bit 1 = LZW); 52..63
  * sub-8-bit packed grayscale/bilevel — (mode−52)/4 picks bits 1/2/4,
  * bit 0 = byte order (photometric alternates 0/1 with it), bit 1 =
  * LZW, and the 1-bit modes omit BitsPerSample (spec default). Pixel
  * (x,y) channels come from the same seed arithmetic as [[PngEncode]]
  * (r=(s+3x+7y)%256, g=(2s+5x+y)%256, b=(3s+x+11y)%256;
  * gray=(s+5x+3y)%256, reduced mod 2^bits for the packed modes) so
  * the DuckDB oracle recomputes exact sums regardless of the strip
  * encoding. rows_per_strip < h forces a multi-strip layout with
  * out-of-line StripOffsets/StripByteCounts arrays, certifying the
  * inline/out-of-line value rule in the decoder. */
case class TiffEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, LongType, IntegerType, IntegerType)
    if (children.length == 5 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_tiff_encode expects (int w, int h, long seed, int mode, int rowsPerStrip)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else TiffEncode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TiffEncode = copy(children = newChildren)
}

object TiffEncode {

  /** Fixed tile geometry for the tiled modes (spec: tile dims must be
    * multiples of 16). */
  val TileDim = 16

  def encode(w: Int, h: Int, seed: Long, mode: Int, rowsPerStrip: Int): Array[Byte] = {
    if (w <= 0 || w > 4096 || h <= 0 || h > 4096 || seed < 0) return null
    if (mode < 0 || mode > 83 || rowsPerStrip <= 0) return null
    // modes 48..51: palette color (photometric 3) in chunky strips —
    // bit 0 = byte order, bit 1 = LZW; indices use the gray formula,
    // ColorMap maps index i to (i, 2i%256, 3i%256) scaled to 16-bit.
    // modes 52..63: sub-8-bit packed grayscale/bilevel (the fax/scan
    // shapes) in chunky strips — bit 0 = byte order, bit 1 = LZW,
    // (mode-52)/4 picks bits 1/2/4; the bilevel (1-bit) modes OMIT
    // the BitsPerSample tag entirely, pinning the spec's default-1
    // path through the fixture itself; photometric alternates 0/1 on
    // the byte-order bit (both fax polarities land in the corpus)
    // modes 68..71: 4-bit palette chunky strips (bit 0 = byte order,
    // bit 1 = LZW) — packed indices through the sub-byte machinery,
    // ColorMap of 16 entries scaled i*17 to the 8-bit domain
    // modes 72..75: 16-bit TILES; 76..79: 16-bit SEPARATE PLANES —
    // bit 0 = byte order, bit 1 = gray vs RGB; uncompressed, no
    // predictor (the organizations are the point, the sample path is
    // the certified v*257 16-bit convention)
    // modes 80..83: 16-BIT palette chunky strips (bit 0 = byte order,
    // bit 1 = LZW) — the scanner-pipeline shape with a 65536-entry
    // ColorMap; indices are (seed+5x+3y)%65536 in the REAL file byte
    // order (both bytes load-bearing, unlike the v*257 sample trick),
    // and the map's planes fold mod 256 so the channel sums match the
    // 8-bit palette oracle exactly — the layouts are invisible BY
    // DESIGN under one oracle
    val pal16 = mode >= 80
    val t16 = mode >= 72 && mode < 76
    val p16 = mode >= 76 && mode < 80
    val wide = t16 || p16
    val pal4 = mode >= 68 && mode < 72
    // modes 64..67: PackBits chunky strips, same 4-way matrix as the
    // base modes (0 = LE RGB, 1 = BE RGB, 2 = LE gray, 3 = BE gray)
    val pb = mode >= 64 && mode < 68
    val subB = mode >= 52 && mode < 64
    val subBits =
      if (subB) Array(1, 2, 4)((mode - 52) / 4) else if (pal4) 4 else 8
    val pal = mode >= 48 && mode < 52
    val tiledOrg = (mode >= 12 && mode < 24) || t16
    val planarOrg = (mode >= 24 && mode < 36) || p16
    val bits16 = (mode >= 36 && mode < 48) || wide || pal16
    val sub = if (pb) mode - 64 else mode % 12
    val le =
      if (pal16) (mode & 1) == 0
      else if (wide) (mode & 1) == 0
      else if (pal4) ((mode - 68) & 1) == 0
      else if (subB) ((mode - 52) & 1) == 0
      else if (pal) ((mode - 48) & 1) == 0 else (sub & 1) == 0
    val gray =
      if (pal16) true // single sample: the 16-bit INDEX
      else if (wide) (mode & 2) != 0
      else pal || pal4 || subB || (sub % 4) >= 2 // pal: gray px formula as INDEX
    val lzw = !pb && !wide && (
      if (pal16) (mode & 2) != 0
      else if (pal4) ((mode - 68) & 2) != 0
      else if (subB) ((mode - 52) & 2) != 0
      else if (pal) ((mode - 48) & 2) != 0 else sub >= 4)
    val pred2 = !pal16 && !pal4 && !pb && !pal && !subB && !wide && sub >= 8
    val spp = if (gray) 1 else 3
    val rps = math.min(rowsPerStrip, h)
    val nStrips = if (tiledOrg) 0 else (h + rps - 1) / rps
    val rowBytes = w * spp
    val across = (w + TileDim - 1) / TileDim
    val down = (h + TileDim - 1) / TileDim
    val nTiles = if (tiledOrg) across * down else 0

    def diffRows(out: Array[Byte], rows: Int, widthBytes: Int,
        stride: Int): Unit = {
      var r0 = 0
      while (r0 < rows) {
        var j = (r0 + 1) * widthBytes - 1
        val start = r0 * widthBytes + stride
        while (j >= start) { out(j) = (out(j) - out(j - stride)).toByte; j -= 1 }
        r0 += 1
      }
    }
    def px(c: Int, x: Int, y: Int): Byte = (if (gray)
      (seed + 5L * x + 3L * y) % 256
    else c match {
      case 0 => (seed + 3L * x + 7L * y) % 256
      case 1 => (2L * seed + 5L * x + y) % 256
      case _ => (3L * seed + x + 11L * y) % 256
    }).toByte

    // block payloads first (compressed sizes vary), offsets after
    def rawStrip(s: Int): Array[Byte] = {
      val rows = math.min(rps, h - s * rps)
      if (subB || pal4) {
        // packed sub-byte rows, MSB-first, byte-aligned per row; the
        // sample is the gray formula reduced mod 2^bits
        val rb = (w * subBits + 7) / 8
        val perByte = 8 / subBits
        val out = new Array[Byte](rows * rb)
        var r0 = 0
        while (r0 < rows) {
          val y = s * rps + r0
          var x = 0
          while (x < w) {
            val v = ((seed + 5L * x + 3L * y) % (1 << subBits)).toInt
            val idx = r0 * rb + x / perByte
            val shift = 8 - subBits * (x % perByte + 1)
            out(idx) = (out(idx) | (v << shift)).toByte
            x += 1
          }
          r0 += 1
        }
        out
      } else if (pal16) {
        // 16-bit index in the REAL file byte order — both bytes carry
        // information ((seed+5x+3y)%65536), so the decoder's byte-order
        // index assembly is load-bearing on every pixel
        val out = new Array[Byte](rows * w * 2)
        var i = 0
        var y = s * rps
        val yEnd = y + rows
        while (y < yEnd) {
          var x = 0
          while (x < w) {
            val v = ((seed + 5L * x + 3L * y) % 65536).toInt
            if (le) { out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte }
            else { out(i) = ((v >> 8) & 0xFF).toByte; out(i + 1) = (v & 0xFF).toByte }
            i += 2
            x += 1
          }
          y += 1
        }
        out
      } else if (!bits16) {
        val out = new Array[Byte](rows * rowBytes)
        var i = 0
        var y = s * rps
        val yEnd = y + rows
        while (y < yEnd) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < spp) { out(i) = px(c, x, y); i += 1; c += 1 }
            x += 1
          }
          y += 1
        }
        if (pred2) diffRows(out, rows, rowBytes, spp)
        out
      } else {
        // 16-bit sample = v<<8 | v: the high byte carries the 8-bit
        // formula, so decoded high-byte sums match the 8-bit oracle
        val wb = rowBytes * 2
        val out = new Array[Byte](rows * wb)
        var i = 0
        var y = s * rps
        val yEnd = y + rows
        while (y < yEnd) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < spp) {
              val v = px(c, x, y)
              out(i) = v; out(i + 1) = v // v*257: byte order immaterial
              i += 2; c += 1
            }
            x += 1
          }
          y += 1
        }
        if (pred2) { // 16-bit predictor: per-VALUE mod 2^16, file order
          def rd(i: Int): Int =
            if (le) (out(i) & 0xFF) | ((out(i + 1) & 0xFF) << 8)
            else ((out(i) & 0xFF) << 8) | (out(i + 1) & 0xFF)
          def wr(i: Int, v: Int): Unit =
            if (le) { out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte }
            else { out(i) = ((v >> 8) & 0xFF).toByte; out(i + 1) = (v & 0xFF).toByte }
          var r0 = 0
          while (r0 < rows) {
            var j = (r0 + 1) * wb - 2
            val start = r0 * wb + 2 * spp
            while (j >= start) { wr(j, (rd(j) - rd(j - 2 * spp)) & 0xFFFF); j -= 2 }
            r0 += 1
          }
        }
        out
      }
    }
    // one PLANE's strip (PlanarConfiguration = 2): one sample per px
    // (two bytes when 16-bit: v*257, byte order immaterial)
    def rawPlanarStrip(c: Int, s: Int): Array[Byte] = {
      val rows = math.min(rps, h - s * rps)
      val bp = if (bits16) 2 else 1
      val out = new Array[Byte](rows * w * bp)
      var i = 0
      var y = s * rps
      val yEnd = y + rows
      while (y < yEnd) {
        var x = 0
        while (x < w) {
          val v = px(c, x, y)
          out(i) = v
          if (bits16) { out(i + 1) = v; i += 2 } else i += 1
          x += 1
        }
        y += 1
      }
      if (pred2) diffRows(out, rows, w, 1)
      out
    }
    // full-size tile; pixels past the image bounds are zero padding
    // (arbitrary by spec — the decoder must ignore them)
    def rawTile(t: Int): Array[Byte] = {
      val x0 = (t % across) * TileDim
      val y0 = (t / across) * TileDim
      val bp = if (bits16) 2 else 1
      val out = new Array[Byte](TileDim * TileDim * spp * bp)
      var y2 = 0
      while (y2 < TileDim) {
        var x2 = 0
        while (x2 < TileDim) {
          val x = x0 + x2; val y = y0 + y2
          if (x < w && y < h) {
            var c = 0
            while (c < spp) {
              val at = ((y2 * TileDim + x2) * spp + c) * bp
              val v = px(c, x, y)
              out(at) = v
              if (bits16) out(at + 1) = v
              c += 1
            }
          }
          x2 += 1
        }
        y2 += 1
      }
      if (pred2) diffRows(out, TileDim, TileDim * spp, spp)
      out
    }
    val strips: Array[Array[Byte]] =
      if (tiledOrg) Array.tabulate(nTiles)(t =>
        if (lzw) TiffLzw.encode(rawTile(t)) else rawTile(t))
      else if (planarOrg) Array.tabulate(nStrips * spp) { i =>
        val raw = rawPlanarStrip(i / nStrips, i % nStrips)
        if (lzw) TiffLzw.encode(raw) else raw
      }
      else Array.tabulate(nStrips) { s =>
        val raw = rawStrip(s)
        if (pb) TiffPackBits.encode(raw, rowBytes)
        else if (lzw) TiffLzw.encode(raw) else raw
      }

    val nBlocks = strips.length
    val stripOffsets = new Array[Long](nBlocks)
    var cursor = 8L
    var s = 0
    while (s < nBlocks) {
      stripOffsets(s) = cursor
      cursor += strips(s).length + (strips(s).length & 1) // word-align
      s += 1
    }
    val auxStart = cursor.toInt
    val bpsOff = auxStart // RGB: 3 SHORTs out-of-line (6 bytes)
    val bpsLen = if (gray) 0 else 6
    val cmOff = bpsOff + bpsLen // palette ColorMap: 3 * 2^bits SHORTs
    val cmLen = if (pal16) 3 * 65536 * 2
      else if (pal) 3 * 256 * 2 else if (pal4) 3 * 16 * 2 else 0
    val soOff = cmOff + cmLen
    val soLen = if (nBlocks > 1) nBlocks * 4 else 0
    val scOff = soOff + soLen
    val scLen = soLen
    val ifdOff = scOff + scLen
    val nEntries = (if (tiledOrg) 11 else 10) +
      (if (pred2) 1 else 0) + (if (pal || pal4 || pal16) 1 else 0) +
      (if (subB && subBits == 1) -1 else 0) // bilevel omits tag 258
    val total = ifdOff + 2 + nEntries * 12 + 4

    val b = new Array[Byte](total)
    var p = 0
    def w8(v: Int): Unit = { b(p) = v.toByte; p += 1 }
    def w16(v: Int): Unit =
      if (le) { w8(v & 0xFF); w8((v >> 8) & 0xFF) }
      else { w8((v >> 8) & 0xFF); w8(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { w8((v & 0xFF).toInt); w8(((v >> 8) & 0xFF).toInt)
        w8(((v >> 16) & 0xFF).toInt); w8(((v >> 24) & 0xFF).toInt) }
      else { w8(((v >> 24) & 0xFF).toInt); w8(((v >> 16) & 0xFF).toInt)
        w8(((v >> 8) & 0xFF).toInt); w8((v & 0xFF).toInt) }

    // header
    if (le) { w8('I'); w8('I'); w8(42); w8(0) } else { w8('M'); w8('M'); w8(0); w8(42) }
    w32(ifdOff.toLong)

    // strip data, each word-aligned
    strips.foreach { st =>
      System.arraycopy(st, 0, b, p, st.length); p += st.length
      if ((st.length & 1) == 1) w8(0)
    }

    // out-of-line arrays
    if (!gray) {
      val sb16 = if (bits16) 16 else 8
      w16(sb16); w16(sb16); w16(sb16)
    }
    if (pal) {
      // ColorMap planes: 16-bit entries; i*257 keeps the high byte = i
      var i = 0
      while (i < 256) { w16(i * 257); i += 1 } // red: identity
      i = 0
      while (i < 256) { w16(((2 * i) % 256) * 257); i += 1 } // green
      i = 0
      while (i < 256) { w16(((3 * i) % 256) * 257); i += 1 } // blue
    }
    if (pal4) {
      // 16-entry map scaled to the 8-bit domain: high byte = f(i)*17
      var i = 0
      while (i < 16) { w16((i * 17) * 257); i += 1 } // red
      i = 0
      while (i < 16) { w16((((2 * i) % 16) * 17) * 257); i += 1 } // green
      i = 0
      while (i < 16) { w16((((3 * i) % 16) * 17) * 257); i += 1 } // blue
    }
    if (pal16) {
      // 65536-entry map whose planes FOLD mod 256 (high byte =
      // f(i) % 256): the decoded channel sums coincide with the 8-bit
      // palette twin's, so one oracle covers both index widths
      var i = 0
      while (i < 65536) { w16((i % 256) * 257); i += 1 } // red
      i = 0
      while (i < 65536) { w16(((2 * i) % 256) * 257); i += 1 } // green
      i = 0
      while (i < 65536) { w16(((3 * i) % 256) * 257); i += 1 } // blue
    }
    if (nBlocks > 1) {
      stripOffsets.foreach(w32)
      strips.foreach(st => w32(st.length.toLong))
    }

    // IFD: entries in ascending tag order (spec requirement)
    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(count)
      val before = p
      value
      while (p < before + 4) w8(0) // value field pads to 4 bytes
    }
    entry(256, 4, 1)(w32(w.toLong)) // ImageWidth
    entry(257, 4, 1)(w32(h.toLong)) // ImageLength
    val sampleBits = if (bits16) 16 else if (subB || pal4) subBits else 8
    if (subB && subBits == 1) () // bilevel: tag 258 omitted (defaults 1)
    else if (gray) entry(258, 3, 1)(w16(sampleBits)) // BitsPerSample inline
    else entry(258, 3, 3)(w32(bpsOff.toLong)) // out-of-line 3 SHORTs
    entry(259, 3, 1)(w16(if (pb) 32773 else if (lzw) 5 else 1)) // Compression
    entry(262, 3, 1)(w16(
      if (subB) (if (le) 1 else 0) // both fax polarities in the corpus
      else if (pal || pal4 || pal16) 3 else if (gray) 1 else 2)) // Photometric
    if (!tiledOrg) {
      if (nBlocks > 1) entry(273, 4, nBlocks.toLong)(w32(soOff.toLong))
      else entry(273, 4, 1)(w32(stripOffsets(0)))
    }
    entry(277, 3, 1)(w16(spp)) // SamplesPerPixel
    if (!tiledOrg) entry(278, 4, 1)(w32(rps.toLong)) // RowsPerStrip
    if (!tiledOrg) {
      if (nBlocks > 1) entry(279, 4, nBlocks.toLong)(w32(scOff.toLong))
      else entry(279, 4, 1)(w32(strips(0).length.toLong))
    }
    entry(284, 3, 1)(w16(if (planarOrg) 2 else 1)) // PlanarConfiguration
    if (pred2) entry(317, 3, 1)(w16(2)) // Predictor = horizontal
    if (pal) entry(320, 3, 3 * 256)(w32(cmOff.toLong)) // ColorMap
    if (pal4) entry(320, 3, 3 * 16)(w32(cmOff.toLong)) // 16-entry ColorMap
    if (pal16) entry(320, 3, 3 * 65536)(w32(cmOff.toLong)) // 65536-entry map
    if (tiledOrg) {
      entry(322, 4, 1)(w32(TileDim.toLong)) // TileWidth
      entry(323, 4, 1)(w32(TileDim.toLong)) // TileLength
      if (nBlocks > 1) entry(324, 4, nBlocks.toLong)(w32(soOff.toLong))
      else entry(324, 4, 1)(w32(stripOffsets(0)))
      if (nBlocks > 1) entry(325, 4, nBlocks.toLong)(w32(scOff.toLong))
      else entry(325, 4, 1)(w32(strips(0).length.toLong))
    }
    w32(0L) // next IFD: none
    b
  }
}
