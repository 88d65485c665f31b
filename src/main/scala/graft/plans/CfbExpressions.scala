package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compound File Binary (OLE2) container — the D0 CF 11 E0 wrapper
  * around the legacy binary Office family (.doc/.xls/.ppt), MSI
  * packages, and thumbs.db (MS-CFB, an open Microsoft spec). A CFB
  * file is a little FAT filesystem: a 512-byte header with a DIFAT
  * locating FAT sectors, FAT chains of 512-byte (v3) or 4096-byte
  * (v4) sectors, a directory of 128-byte entries (names UTF-16LE),
  * and a MINI stream (64-byte mini sectors, their own miniFAT) for
  * streams under the 4096-byte cutoff.
  *
  * [[CfbParse.open]] is the shared walk ([[DocText]] builds on it);
  * [[CfbEntries]] (`graft_cfb_entries(binary)` → `array<struct<name
  * string, obj_type int, n_bytes long>>`) is the census query's
  * expression — one element per directory entry in directory order,
  * free entries skipped.
  *
  * Parse-or-NULL: bad magic/byte-order/sector-shift, a FAT/miniFAT/
  * directory chain that leaves the file or cycles, a directory name
  * with a bad length, or over-cap (4 MiB input, 8192 sectors, 1024
  * directory entries) NULLs the document. */
case class CfbEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cfb_entries expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(CfbEntries.entrySchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cfb_entries"

  override def nullSafeEval(input: Any): Any =
    CfbEntries.census(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.CfbEntries.census($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): CfbEntries =
    copy(child = newChild)
}

object CfbEntries {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("obj_type", IntegerType),
    StructField("n_bytes", LongType)))

  def census(b: Array[Byte]): GenericArrayData = {
    val cfb = CfbParse.open(b)
    if (cfb == null) return null
    val out = cfb.entries.map { e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.name), e.objType, e.size))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** One directory entry of an opened container. */
private[graft] final case class CfbEntry(
    name: String, objType: Int, startSector: Long, size: Long)

/** An opened CFB container: the directory plus enough state to read
  * any stream (FAT chains for big streams, the root's mini stream +
  * miniFAT for small ones). */
private[graft] final class CfbFile(
    val bytes: Array[Byte],
    val sectorSize: Int,
    val miniCutoff: Long,
    val fat: Array[Long],
    val miniFat: Array[Long],
    val entries: Vector[CfbEntry],
    val miniStream: Array[Byte]) {

  /** A named stream's bytes, or null (absent name / broken chain).
    * CFB name comparison is case-insensitive upper-case per MS-CFB
    * §2.6.4. */
  def stream(name: String): Array[Byte] = {
    val up = name.toUpperCase(java.util.Locale.ROOT)
    val e = entries.find(x =>
      x.objType == 2 && x.name.toUpperCase(java.util.Locale.ROOT) == up).orNull
    if (e == null) return null
    if (e.size < miniCutoff) CfbParse.readMini(this, e)
    else CfbParse.readBig(this, e)
  }
}

private[graft] object CfbParse {

  private val MaxLen = 1 << 22
  private val MaxSectors = 8192
  private val MaxEntries = 1024
  private val End = 0xFFFFFFFEL
  private val Free = 0xFFFFFFFFL

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Parse the container, or null. The whole walk is bounded: every
    * chain is capped at the file's own sector count, so a crafted
    * cyclic FAT terminates immediately. */
  def open(b: Array[Byte]): CfbFile = {
    if (b == null || b.length < 512 + 128 || b.length > MaxLen) return null
    if (!(b(0) == 0xD0.toByte && b(1) == 0xCF.toByte && b(2) == 0x11.toByte &&
      b(3) == 0xE0.toByte && b(4) == 0xA1.toByte && b(5) == 0xB1.toByte &&
      b(6) == 0x1A.toByte && b(7) == 0xE1.toByte)) return null
    if (u16(b, 0x1C) != 0xFFFE) return null // byte order mark
    val shift = u16(b, 0x1E)
    if (shift != 9 && shift != 12) return null // v3 / v4 only
    val sectorSize = 1 << shift
    if (u16(b, 0x20) != 6) return null // mini shift is always 6
    val nFat = u32(b, 0x2C)
    val firstDir = u32(b, 0x30)
    val miniCutoff = u32(b, 0x38)
    val firstMiniFat = u32(b, 0x3C)
    val nMiniFat = u32(b, 0x40)
    val firstDifat = u32(b, 0x44)
    val nDifat = u32(b, 0x48)
    val nSectors = (b.length - 512) / sectorSize
    if (nSectors < 1 || nSectors > MaxSectors) return null
    if (nFat < 1 || nFat > nSectors) return null
    def sectorOff(s: Long): Int = {
      if (s < 0 || s >= nSectors) -1 else (512 + s * sectorSize).toInt
    }
    // DIFAT: 109 header slots + the DIFAT sector chain (each DIFAT
    // sector holds sectorSize/4 - 1 FAT locators + a next pointer)
    val fatSectors = new Array[Long](nFat.toInt)
    var fi = 0
    var i = 0
    while (fi < nFat && i < 109) {
      val s = u32(b, 0x4C + i * 4)
      if (s != Free) {
        if (sectorOff(s) < 0) return null
        fatSectors(fi) = s
        fi += 1
      }
      i += 1
    }
    var difat = firstDifat
    var difatSteps = 0L
    while (fi < nFat) {
      if (difat == End || difatSteps > nDifat || difatSteps > nSectors)
        return null
      val off = sectorOff(difat)
      if (off < 0) return null
      var k = 0
      while (fi < nFat && k < sectorSize / 4 - 1) {
        val s = u32(b, off + k * 4)
        if (s != Free) {
          if (sectorOff(s) < 0) return null
          fatSectors(fi) = s
          fi += 1
        }
        k += 1
      }
      difat = u32(b, off + sectorSize - 4)
      difatSteps += 1
    }
    // the FAT itself, materialized: fat(i) = next sector of i
    val perFat = sectorSize / 4
    val fat = new Array[Long](nSectors.toInt)
    java.util.Arrays.fill(fat, Free)
    i = 0
    while (i < nFat) {
      val off = sectorOff(fatSectors(i.toInt))
      var k = 0
      while (k < perFat) {
        val idx = i * perFat + k
        if (idx < nSectors) fat(idx.toInt) = u32(b, off + k * 4)
        k += 1
      }
      i += 1
    }
    def chain(start: Long): Array[Long] = {
      val out = Vector.newBuilder[Long]
      var s = start
      var steps = 0
      while (s != End) {
        if (sectorOff(s) < 0 || steps > nSectors) return null
        out += s
        s = fat(s.toInt)
        steps += 1
      }
      out.result().toArray
    }
    // directory: 128-byte entries across the directory chain
    val dirChain = chain(firstDir)
    if (dirChain == null || dirChain.isEmpty) return null
    val perDir = sectorSize / 128
    val entries = Vector.newBuilder[CfbEntry]
    var count = 0
    var done = false
    var d = 0
    while (d < dirChain.length && !done) {
      val off = sectorOff(dirChain(d))
      var k = 0
      while (k < perDir && !done) {
        val eo = off + k * 128
        val objType = b(eo + 66) & 0xFF
        if (objType == 0) {
          // a free entry ends the meaningful directory region only if
          // everything after is free too — just skip it (real writers
          // leave holes); the entry cap bounds the walk regardless
        } else {
          if (objType != 1 && objType != 2 && objType != 5) return null
          val nameLen = u16(b, eo + 64)
          if (nameLen < 2 || nameLen > 64 || nameLen % 2 != 0) return null
          val name = new String(b, eo, nameLen - 2, "UTF-16LE")
          if (name.isEmpty) return null
          val start = u32(b, eo + 116)
          val size =
            if (shift == 9) u32(b, eo + 120) // v3: only the low 32 bits
            else u32(b, eo + 120) | (u32(b, eo + 124) << 32)
          if (size < 0 || size > MaxLen) return null
          count += 1
          if (count > MaxEntries) return null
          entries += CfbEntry(name, objType, start, size)
        }
        k += 1
      }
      d += 1
    }
    val es = entries.result()
    if (es.isEmpty || es.head.objType != 5) return null // root must lead
    val root = es.head
    // the mini stream is the root entry's own chain, materialized once
    val miniStream: Array[Byte] =
      if (root.size == 0) new Array[Byte](0)
      else {
        val c = chain(root.startSector)
        if (c == null) return null
        if (c.length.toLong * sectorSize < root.size) return null
        val out = new Array[Byte](root.size.toInt)
        var w = 0
        var ci = 0
        while (ci < c.length && w < out.length) {
          val off = sectorOff(c(ci))
          val take = math.min(sectorSize, out.length - w)
          System.arraycopy(b, off, out, w, take)
          w += take
          ci += 1
        }
        out
      }
    // the miniFAT, materialized
    val miniFat: Array[Long] =
      if (nMiniFat == 0) new Array[Long](0)
      else {
        val c = chain(firstMiniFat)
        if (c == null || c.length != nMiniFat) return null
        val out = new Array[Long](c.length * perFat)
        var ci = 0
        while (ci < c.length) {
          val off = sectorOff(c(ci))
          var k = 0
          while (k < perFat) {
            out(ci * perFat + k) = u32(b, off + k * 4)
            k += 1
          }
          ci += 1
        }
        out
      }
    new CfbFile(b, sectorSize, miniCutoff, fat, miniFat, es, miniStream)
  }

  /** A big stream: FAT chain of full sectors. */
  def readBig(f: CfbFile, e: CfbEntry): Array[Byte] = {
    val out = new Array[Byte](e.size.toInt)
    var w = 0
    var s = e.startSector
    var steps = 0
    val nSectors = f.fat.length
    while (w < out.length) {
      if (s == End || s < 0 || s >= nSectors || steps > nSectors) return null
      val off = (512 + s * f.sectorSize).toInt
      val take = math.min(f.sectorSize, out.length - w)
      System.arraycopy(f.bytes, off, out, w, take)
      w += take
      s = f.fat(s.toInt)
      steps += 1
    }
    out
  }

  /** A mini stream: miniFAT chain of 64-byte mini sectors inside the
    * root's materialized mini stream. */
  def readMini(f: CfbFile, e: CfbEntry): Array[Byte] = {
    val out = new Array[Byte](e.size.toInt)
    var w = 0
    var s = e.startSector
    var steps = 0
    while (w < out.length) {
      if (s == End || s < 0 || s >= f.miniFat.length ||
        steps > f.miniFat.length) return null
      val off = (s * 64).toInt
      if (off + 64 > f.miniStream.length && off >= f.miniStream.length)
        return null
      val take = math.min(math.min(64, f.miniStream.length - off),
        out.length - w)
      if (take <= 0) return null
      System.arraycopy(f.miniStream, off, out, w, take)
      w += take
      s = f.miniFat(s.toInt)
      steps += 1
    }
    out
  }
}

/** `graft_cfb_kind(binary)` → string: the document-triage classifier
  * for the D0 CF 11 E0 magic — 'doc' when a WordDocument stream is
  * present (Word 97-2003), 'xls' for a Workbook/Book stream, 'ppt'
  * for a PowerPoint Document stream, 'cfb' for any other valid
  * container, NULL when the container itself declines. The binary
  * twin of graft_zip_kind's directory-name classification: one
  * FAT+directory walk, no stream is read. */
case class CfbKind(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cfb_kind expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cfb_kind"

  override def nullSafeEval(input: Any): Any =
    CfbKind.classify(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.CfbKind.classify($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): CfbKind =
    copy(child = newChild)
}

object CfbKind {
  def classify(b: Array[Byte]): UTF8String = {
    val cfb = CfbParse.open(b)
    if (cfb == null) return null
    val names = cfb.entries.iterator.filter(_.objType == 2)
      .map(_.name.toUpperCase(java.util.Locale.ROOT)).toSet
    val kind =
      if (names.contains("WORDDOCUMENT")) "doc"
      else if (names.contains("WORKBOOK") || names.contains("BOOK")) "xls"
      else if (names.contains("POWERPOINT DOCUMENT")) "ppt"
      else "cfb"
    UTF8String.fromString(kind)
  }
}
