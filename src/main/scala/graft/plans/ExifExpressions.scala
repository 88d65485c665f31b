package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata triage: `graft_exif_meta(binary)` walks the EXIF IFD
  * chain of a JPEG (APP1 segment, "Exif\0\0" prefix, embedded TIFF
  * stream) or of a bare TIFF (the EXIF container IS the TIFF IFD
  * grammar) and returns the curation signals a crawl pipeline filters
  * and groups on BEFORE any pixel decode:
  *
  *  - `orientation` (tag 274): rotation-aware thumbnailing — a resize
  *    pass that ignores it produces sideways thumbnails for ~1/8 of
  *    phone photos;
  *  - `datetime_original` (EXIF sub-IFD tag 36867, falling back to
  *    IFD0 DateTime 306): dedup-by-capture-time and temporal
  *    partitioning of photo corpora;
  *  - `make` (tag 271): per-device quality cohorts.
  *
  * The walk reuses the TIFF IFD grammar the image-triage family
  * already speaks (ImageMeta.parseTiff; both byte orders, SHORT/LONG
  * scalars inline in the 4-byte value field, ASCII values out-of-line
  * past 4 bytes) plus the one EXIF addition: the private sub-IFD
  * behind pointer tag 34665. Parse-or-NULL with hostile offsets/counts
  * bounds-checked against the buffer and an entry ceiling; O(entries)
  * work, O(1) memory, whole-stage codegen — at 100 TB the pass is
  * scan-speed. (Reference analogue: aristoteles.py:334-478 carries
  * payloads as opaque columns; this deepens that model the same way
  * the MP4/TIFF triage tiers do.)
  *
  * [[ExifMeta.encode]] synthesizes the fixture: a spec-conformant EXIF
  * TIFF stream (IFD0: Make, Orientation, ExifIFD pointer; sub-IFD:
  * DateTimeOriginal) either bare (the TIFF case) or spliced as APP1
  * into a REAL entropy-coded JPEG (JpegEncode.encodeBlocky), so the
  * DuckDB oracle certifies the construct→store→walk round trip across
  * both byte orders and both containers. */
case class ExifMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_exif_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ExifMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_meta"

  override def nullSafeEval(input: Any): Any =
    ExifMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.ExifMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ExifMeta =
    copy(child = newChild)
}

object ExifMeta {

  val schema: StructType = StructType(Seq(
    StructField("container", StringType), // "jpeg" | "tiff"
    StructField("orientation", IntegerType),
    StructField("datetime_original", StringType),
    StructField("make", StringType),
    // GPS position in signed CENTISECONDS of arc (S/W negative):
    // integer-exact for den=1 rationals, truncating division
    // otherwise — never float, so cross-engine compares are stable
    StructField("lat_csec", IntegerType),
    StructField("lon_csec", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** NULL unless the bytes are a JPEG carrying an APP1/EXIF segment or
    * a bare TIFF whose IFD0 resolves at least one of the three tags. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8) return null
    if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      // JPEG: walk the segment chain for APP1 "Exif\0\0"; stop at SOS
      // (no EXIF rides after the entropy stream in practice, and the
      // triage pass must not scan megabytes of coded data)
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xFF) return null
        var m = u8(b, i + 1)
        while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
        else if (m == 0xD9 || m == 0xDA) return null // EOI / SOS: no EXIF found
        else {
          // re-check AFTER the fill-byte skip moved i: a hostile FF run
          // ending at the buffer edge must not read past it
          if (i + 3 >= b.length) return null
          val segLen = be16(b, i + 2)
          if (segLen < 2 || i + 2 + segLen > b.length) return null
          if (m == 0xE1 && segLen >= 10 &&
              u8(b, i + 4) == 'E' && u8(b, i + 5) == 'x' && u8(b, i + 6) == 'i' &&
              u8(b, i + 7) == 'f' && u8(b, i + 8) == 0 && u8(b, i + 9) == 0) {
            return parseTiffStream(b, i + 10, i + 2 + segLen, "jpeg")
          }
          i += 2 + segLen
        }
      }
      null
    } else parseTiffStream(b, 0, b.length, "tiff")
  }

  /** The TIFF-grammar walk over b[start, end): IFD0 entries for Make
    * (271), Orientation (274), DateTime (306), and the EXIF sub-IFD
    * pointer (34665) whose IFD yields DateTimeOriginal (36867). All
    * offsets are relative to `start` (the TIFF header), per EXIF. */
  private def parseTiffStream(b: Array[Byte], start: Int, end: Int,
      container: String): InternalRow = {
    if (end - start < 14 || end > b.length) return null
    val le =
      if (u8(b, start) == 'I' && u8(b, start + 1) == 'I' &&
        u8(b, start + 2) == 42 && u8(b, start + 3) == 0) true
      else if (u8(b, start) == 'M' && u8(b, start + 1) == 'M' &&
        u8(b, start + 2) == 0 && u8(b, start + 3) == 42) false
      else return null
    def r16(i: Int): Int =
      if (le) u8(b, i) | (u8(b, i + 1) << 8) else (u8(b, i) << 8) | u8(b, i + 1)
    def r32(i: Int): Long =
      if (le) u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
      else (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
        (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

    var orientation = -1
    var make: String = null
    var dtOriginal: String = null
    var dtFallback: String = null
    var latRef = 0; var lonRef = 0 // +1 N/E, -1 S/W
    var latC = Int.MinValue; var lonC = Int.MinValue // unsigned centiseconds

    /** ASCII value of an entry (count includes the NUL); inline when
      * count <= 4, else out-of-line at the value-field offset. */
    def ascii(entryOff: Int, count: Long): String = {
      if (count < 1 || count > 256) return null
      val at =
        if (count <= 4) entryOff + 8
        else {
          val o = r32(entryOff + 8)
          if (o < 0 || start + o + count > end) return null
          (start + o).toInt
        }
      if (at + count > end) return null
      // strip the trailing NUL(s); refuse non-printable bytes so
      // hostile buffers cannot masquerade as timestamps
      var n = count.toInt
      while (n > 0 && u8(b, at + n - 1) == 0) n -= 1
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        val c = u8(b, at + i)
        if (c < 0x20 || c > 0x7E) return null
        sb.append(c.toChar); i += 1
      }
      sb.toString
    }

    /** A GPS coordinate: RATIONAL count 3 (deg, min, sec as u32/u32
      * pairs, always out-of-line at 24 bytes) → unsigned centiseconds
      * of arc via truncating integer division. Int.MinValue = bad. */
    def gpsCoord(entryOff: Int, count: Long): Int = {
      if (count != 3L) return Int.MinValue
      val o = r32(entryOff + 8)
      if (o < 8 || start + o + 24 > end) return Int.MinValue
      val at = (start + o).toInt
      var total = 0L
      var i = 0
      val scale = Array(360000L, 6000L, 100L)
      while (i < 3) {
        val num = r32(at + 8 * i)
        val den = r32(at + 8 * i + 4)
        if (den <= 0 || num < 0) return Int.MinValue
        total += num * scale(i) / den
        i += 1
      }
      if (total > Int.MaxValue) Int.MinValue else total.toInt
    }

    /** N/E → +1, S/W → -1, anything else 0 (field declines). */
    def gpsRef(entryOff: Int, count: Long): Int = {
      if (count < 1 || count > 2) return 0
      (entryOff + 8 < end) match {
        case true => u8(b, entryOff + 8) match {
          case 'N' | 'E' => 1
          case 'S' | 'W' => -1
          case _ => 0
        }
        case false => 0
      }
    }

    /** Walk one IFD; returns false on structural violation.
      * kind: 0 = IFD0, 1 = EXIF sub-IFD, 2 = GPS IFD. */
    def walk(ifdStart: Long, kind: Int): Boolean = {
      val ifd = start + ifdStart
      if (ifdStart < 8 || ifd + 2 > end) return false
      val n = r16(ifd.toInt)
      if (n <= 0 || n > 512 || ifd + 2 + 12L * n > end) return false
      var e = 0
      while (e < n) {
        val off = (ifd + 2 + 12 * e).toInt
        val tag = r16(off)
        val typ = r16(off + 2)
        val count = r32(off + 4)
        if (kind == 0) tag match {
          case 271 if typ == 2 => make = ascii(off, count)
          case 274 if typ == 3 && count == 1L =>
            val v = r16(off + 8)
            if (v < 1 || v > 8) return false
            orientation = v
          case 306 if typ == 2 => dtFallback = ascii(off, count)
          case 34665 if (typ == 4 || typ == 3) && count == 1L =>
            val sub = if (typ == 4) r32(off + 8) else r16(off + 8).toLong
            if (!walk(sub, kind = 1)) return false
          case 34853 if (typ == 4 || typ == 3) && count == 1L =>
            val sub = if (typ == 4) r32(off + 8) else r16(off + 8).toLong
            if (!walk(sub, kind = 2)) return false
          case _ => ()
        } else if (kind == 1) tag match {
          case 36867 if typ == 2 => dtOriginal = ascii(off, count)
          case _ => ()
        } else tag match { // GPS IFD (EXIF 2.3 §4.6.6)
          case 1 if typ == 2 => latRef = gpsRef(off, count)
          case 2 if typ == 5 => latC = gpsCoord(off, count)
          case 3 if typ == 2 => lonRef = gpsRef(off, count)
          case 4 if typ == 5 => lonC = gpsCoord(off, count)
          case _ => ()
        }
        e += 1
      }
      true
    }

    if (!walk(r32(start + 4), kind = 0)) return null
    val dt = if (dtOriginal != null) dtOriginal else dtFallback
    // a coordinate surfaces only when value AND hemisphere are sound
    val lat = if (latC != Int.MinValue && latRef != 0) latRef * latC else Int.MinValue
    val lon = if (lonC != Int.MinValue && lonRef != 0) lonRef * lonC else Int.MinValue
    if (orientation < 0 && dt == null && make == null &&
      lat == Int.MinValue && lon == Int.MinValue) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(container),
      if (orientation < 0) null else orientation,
      if (dt == null) null else UTF8String.fromString(dt),
      if (make == null) null else UTF8String.fromString(make),
      if (lat == Int.MinValue) null else lat,
      if (lon == Int.MinValue) null else lon))
  }

  // ---- fixture synthesis ---------------------------------------------

  /** A spec-conformant EXIF TIFF stream: IFD0 with Make (ASCII,
    * out-of-line), Orientation (SHORT, inline), DateTime (ASCII 20,
    * out-of-line), ExifIFD pointer (LONG) → sub-IFD with
    * DateTimeOriginal (ASCII 20), and GPSInfo pointer (LONG) → GPS
    * IFD with LatitudeRef/Latitude/LongitudeRef/Longitude — the
    * coordinates are signed CENTISECONDS of arc, decomposed into the
    * spec's (deg/1, min/1, centisec/100) RATIONAL triple so the
    * truncating-division decode replays them exactly. Entries
    * tag-sorted per spec; both byte orders. */
  def encodeTiffStream(le: Boolean, orientation: Int, make: String,
      dt: String, dtOriginal: String,
      latCsec: Int, lonCsec: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8 &&
      make.nonEmpty && make.length <= 32 &&
      dt.length == 19 && dtOriginal.length == 19 &&
      math.abs(latCsec) <= 90 * 360000 && math.abs(lonCsec) <= 180 * 360000)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit =
      if (le) { w8(v); w8(v >>> 8) } else { w8(v >>> 8); w8(v) }
    def w32(v: Long): Unit =
      if (le) { w8(v.toInt); w8((v >>> 8).toInt); w8((v >>> 16).toInt); w8((v >>> 24).toInt) }
      else { w8((v >>> 24).toInt); w8((v >>> 16).toInt); w8((v >>> 8).toInt); w8(v.toInt) }
    // header
    if (le) { w8('I'); w8('I'); w8(42); w8(0) } else { w8('M'); w8('M'); w8(0); w8(42) }
    w32(8L) // IFD0 right after the header
    // layout: IFD0 (2 + 5*12 + 4), value area, EXIF sub-IFD, GPS IFD
    val ifd0 = 8
    val valueArea = ifd0 + 2 + 5 * 12 + 4
    val makeBytes = make.length + 1 // NUL-terminated
    val makeOff = valueArea
    val dtOff = makeOff + makeBytes
    val subIfdOff = dtOff + 20
    val dtoOff = subIfdOff + 2 + 1 * 12 + 4
    val gpsIfdOff = dtoOff + 20
    val latOff = gpsIfdOff + 2 + 4 * 12 + 4
    val lonOff = latOff + 24
    def entry(tag: Int, typ: Int, count: Long, inline: Long => Unit): Unit = {
      w16(tag); w16(typ); w32(count); inline(count)
    }
    w16(5) // IFD0 entry count
    entry(271, 2, makeBytes.toLong, _ => w32(makeOff.toLong))
    entry(274, 3, 1L, _ => { w16(orientation); w16(0) })
    entry(306, 2, 20L, _ => w32(dtOff.toLong))
    entry(34665, 4, 1L, _ => w32(subIfdOff.toLong))
    entry(34853, 4, 1L, _ => w32(gpsIfdOff.toLong))
    w32(0L) // no IFD1
    make.foreach(c => w8(c)); w8(0)
    dt.foreach(c => w8(c)); w8(0)
    w16(1) // EXIF sub-IFD entry count
    entry(36867, 2, 20L, _ => w32(dtoOff.toLong))
    w32(0L)
    dtOriginal.foreach(c => w8(c)); w8(0)
    // GPS IFD: refs inline ("N\0" padded), coords out-of-line
    w16(4)
    entry(1, 2, 2L, _ => { w8(if (latCsec >= 0) 'N' else 'S'); w8(0); w16(0) })
    entry(2, 5, 3L, _ => w32(latOff.toLong))
    entry(3, 2, 2L, _ => { w8(if (lonCsec >= 0) 'E' else 'W'); w8(0); w16(0) })
    entry(4, 5, 3L, _ => w32(lonOff.toLong))
    w32(0L)
    def coord(csec: Int): Unit = {
      val a = math.abs(csec)
      w32(a / 360000L); w32(1L)          // degrees
      w32((a % 360000L) / 6000L); w32(1L) // minutes
      w32(a % 6000L); w32(100L)           // centiseconds / 100 = seconds
    }
    coord(latCsec); coord(lonCsec)
    out.toByteArray
  }

  /** The full fixture: the TIFF stream either bare or spliced as an
    * APP1 EXIF segment into a REAL entropy-coded baseline JPEG
    * (JpegEncode.encodeBlocky seeded from the same arithmetic) right
    * after SOI — the exact byte layout a camera writes. */
  def encode(seed: Long, le: Boolean, wrapJpeg: Boolean, orientation: Int,
      make: String, dt: String, dtOriginal: String,
      latCsec: Int = 0, lonCsec: Int = 0): Array[Byte] = {
    val tiff = encodeTiffStream(le, orientation, make, dt, dtOriginal,
      latCsec, lonCsec)
    if (!wrapJpeg) tiff
    else {
      val jpeg = JpegEncode.encodeBlocky(
        (seed % 23 + 9).toInt, (seed * 3 % 19 + 9).toInt, seed, seed % 2 == 0)
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xFF); out.write(0xD8) // SOI
      val segLen = 2 + 6 + tiff.length
      out.write(0xFF); out.write(0xE1) // APP1
      out.write((segLen >>> 8) & 0xFF); out.write(segLen & 0xFF)
      out.write('E'); out.write('x'); out.write('i'); out.write('f')
      out.write(0); out.write(0)
      out.write(tiff, 0, tiff.length)
      out.write(jpeg, 2, jpeg.length - 2) // everything after the SOI
      out.toByteArray
    }
  }
}
