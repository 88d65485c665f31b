package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** tar container census — the remaining common archive wrapper in
  * data dumps (POSIX.1-1988 ustar + the GNU long-name extension; the
  * format is a public IEEE spec and the GNU tar manual documents the
  * 'L' convention).
  *
  * `graft_tar_entries(binary)` → `array<struct<name string, typeflag
  * string, n_bytes long, mtime long>>`, one element per archive
  * member in archive order:
  *
  *  - a member is a 512-byte header + its data rounded up to 512;
  *    header fields are NUL-padded ASCII, numbers in octal (NUL- or
  *    space-terminated, leading spaces legal);
  *  - every header's CHECKSUM is verified (the sum of all 512 bytes
  *    with the chksum field read as spaces; stored octal — the
  *    historically-signed variant is accepted alongside the POSIX
  *    unsigned sum, both appear in the wild);
  *  - the magic must be POSIX ustar ("ustar\0" + version "00") or
  *    GNU ("ustar " + " \0") — pre-POSIX v7 headers decline;
  *  - the reported name composes the POSIX `prefix` field when
  *    present (`prefix + "/" + name`);
  *  - a GNU 'L' long-name member carries the NEXT member's real name
  *    as its NUL-terminated data: it emits no row of its own and
  *    overrides the following header's name field; 'K' (long
  *    linkname) is likewise consumed silently (the census does not
  *    report link targets);
  *  - typeflags '0'/NUL (file, NUL normalized to "0"), '1' (hard
  *    link), '2' (symlink), '5' (directory) are served verbatim;
  *  - pax extended headers (POSIX.1-2001, the DEFAULT output of
  *    modern GNU/BSD tar): an 'x' member's data is a sequence of
  *    "len key=value\n" records (len decimal, counting the whole
  *    record) applying to the NEXT member, a 'g' member sets global
  *    defaults for all following members. The census APPLIES the
  *    keys that override what it reports — `path` (UTF-8, replacing
  *    the header name+prefix), `size` (authoritative for BOTH the
  *    reported length and the data-block skip — the >8 GiB case
  *    where the octal field cannot hold the truth), `mtime` (whole
  *    seconds served; a fractional part is floored) — consumes
  *    `linkpath`, and IGNORES keys that cannot falsify a census row
  *    (uid/gid/uname/gname/atime/ctime/comment/charset/SCHILY.* …).
  *    Keys that change the data layout or the value encoding decline:
  *    any `GNU.sparse.*`, and `hdrcharset` other than the UTF-8
  *    declaration. Records must tile the 'x'/'g' data exactly;
  *    malformed lengths, a key with no '=', a non-UTF-8 path, a
  *    negative or non-decimal size/mtime, a second 'x' before the
  *    member it modifies, an 'x' mixed with a GNU 'L' for the same
  *    member, or a dangling 'x' at end-of-archive all decline;
  *  - the archive ends with two zero blocks; trailing padding past
  *    them must be all zeros (tar blocking), anything else declines.
  *
  * Parse-or-NULL: bad magic/checksum/octal, a truncated member, a
  * GNU base-256 size (the >8 GiB binary form — outside this census's
  * bounded model), an 'L' payload without a following member, or
  * over-cap (4096 members / 4 MiB input / 64 KiB pax data) NULLs the
  * document — faithful-or-NULL like every parser in the family. */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tar_entries expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(TarEntries.entrySchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_entries"

  override def nullSafeEval(input: Any): Any =
    TarEntries.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.TarEntries.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("typeflag", StringType),
    StructField("n_bytes", LongType),
    StructField("mtime", LongType)))

  private val MaxLen = 1 << 22
  private val MaxEntries = 4096
  private val MaxName = 4096

  /** Octal numeric field: optional leading spaces, octal digits,
    * terminated by NUL or space (the rest of the field must be
    * NUL/space). -1 on malformed; base-256 (high bit) is out of
    * model → -1. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) return -1L // GNU base-256: decline
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0')
      if (v < 0) return -1L
      digits += 1
      i += 1
    }
    if (digits == 0) return -1L
    while (i < end) {
      if (b(i) != 0 && b(i) != ' ') return -1L
      i += 1
    }
    v
  }

  /** NUL-terminated (or field-filling) ASCII string field. Null on a
    * non-ASCII byte — tar names in this census's model are ASCII;
    * pax (declined) is where UTF-8 names live. */
  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val lim = off + len
    while (end < lim && b(end) != 0) {
      if ((b(end) & 0xFF) >= 0x80) return null
      end += 1
    }
    new String(b, off, end - off, "US-ASCII")
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + 512) { if (b(i) != 0) return false; i += 1 }
    true
  }

  private val MaxPax = 1 << 16

  /** The overrides a pax header carries that this census serves.
    * `size`/`mtime` use -1 / Long.MinValue as "not set" (pax sizes
    * are non-negative by grammar; mtimes at MinValue are out of any
    * model). `bad` poisons the whole archive. */
  private final class Pax {
    var path: String = null
    var size: Long = -1L
    var mtime: Long = Long.MinValue
    var bad: Boolean = false
  }

  /** Parse the "len key=value\n" records of an 'x'/'g' data area
    * into a [[Pax]]. Records must tile [off, off+len) exactly. */
  private def parsePax(b: Array[Byte], off: Int, len: Int): Pax = {
    val out = new Pax
    if (len < 0 || len > MaxPax) { out.bad = true; return out }
    var q = off
    val end = off + len
    while (q < end) {
      // decimal record length, then exactly one space
      var l = 0L
      var digits = 0
      var i = q
      while (i < end && b(i) >= '0' && b(i) <= '9' && digits <= 7) {
        l = l * 10 + (b(i) - '0'); digits += 1; i += 1
      }
      if (digits == 0 || digits > 7 || i >= end || b(i) != ' ' ||
        l < digits + 3 || q + l > end || b(q + l.toInt - 1) != '\n') {
        out.bad = true; return out
      }
      val recEnd = q + l.toInt - 1 // the '\n'
      i += 1
      val keyStart = i
      while (i < recEnd && b(i) != '=') i += 1
      if (i == keyStart || i >= recEnd) { out.bad = true; return out }
      val key = new String(b, keyStart, i - keyStart, "US-ASCII")
      val vStart = i + 1
      val vLen = recEnd - vStart
      key match {
        case "path" =>
          val s = utf8(b, vStart, vLen)
          if (s == null || s.isEmpty || s.length > MaxName) {
            out.bad = true; return out
          }
          out.path = s
        case "size" =>
          var v = 0L
          var j = vStart
          if (vLen < 1) { out.bad = true; return out }
          while (j < recEnd) {
            if (b(j) < '0' || b(j) > '9') { out.bad = true; return out }
            v = v * 10 + (b(j) - '0')
            if (v > MaxLen) { out.bad = true; return out }
            j += 1
          }
          out.size = v
        case "mtime" =>
          // decimal seconds, optional fractional part (floored — the
          // census reports whole seconds); negatives are out of model
          var v = 0L
          var j = vStart
          var d = 0
          while (j < recEnd && b(j) >= '0' && b(j) <= '9') {
            // pre-multiply bound: a wrap can land POSITIVE, so a
            // post-hoc v<0 check would serve a garbage mtime
            if (v > (Long.MaxValue - 9) / 10) { out.bad = true; return out }
            v = v * 10 + (b(j) - '0')
            d += 1; j += 1
          }
          if (d == 0) { out.bad = true; return out }
          if (j < recEnd) {
            if (b(j) != '.') { out.bad = true; return out }
            j += 1
            if (j >= recEnd) { out.bad = true; return out }
            while (j < recEnd) {
              if (b(j) < '0' || b(j) > '9') { out.bad = true; return out }
              j += 1
            }
          }
          out.mtime = v
        case "linkpath" => () // consumed: the census does not report link targets
        case "hdrcharset" =>
          // only the UTF-8 declaration keeps pax values decodable here
          if (new String(b, vStart, vLen, "US-ASCII") != "ISO-IR 10646 2000 UTF-8") {
            out.bad = true; return out
          }
        case k if k.startsWith("GNU.sparse.") =>
          // sparse members change the data layout itself: the sizes
          // and offsets this census would report are not the truth
          out.bad = true; return out
        case _ => () // uid/gid/uname/gname/atime/ctime/comment/…: inert
      }
      q += l.toInt
    }
    out
  }

  /** Strict UTF-8 decode (pax values are UTF-8 by default). Null on
    * malformed input — a mangled path must decline, never mojibake. */
  private def utf8(b: Array[Byte], off: Int, len: Int): String =
    PlainText.strictOrNull(b, off, len,
      java.nio.charset.StandardCharsets.UTF_8)

  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 1024 || b.length > MaxLen ||
      b.length % 512 != 0) return null
    val out = Vector.newBuilder[Any]
    var n = 0
    var at = 0
    var pendingName: String = null // a GNU 'L' payload for the NEXT member
    var pendingPax: Pax = null // an 'x' member's overrides for the NEXT member
    var globalPax: Pax = null // a 'g' member's defaults for ALL following
    while (at + 512 <= b.length) {
      if (zeroBlock(b, at)) {
        // end-of-archive: an 'L'/'x' with no following member is
        // dangling, and the spec's second zero block + blocking padding
        // must all be zeros — content past the terminator would vanish
        // silently
        if (pendingName != null || pendingPax != null) return null
        if (at + 512 > b.length - 512) return null // no second block
        var j = at + 512
        while (j < b.length) { if (b(j) != 0) return null; j += 1 }
        return new GenericArrayData(out.result().toArray[Any])
      }
      // magic+version: POSIX "ustar\0" "00" or GNU "ustar " " \0"
      val m = at + 257
      val posix = b(m) == 'u' && b(m + 1) == 's' && b(m + 2) == 't' &&
        b(m + 3) == 'a' && b(m + 4) == 'r' && b(m + 5) == 0 &&
        b(m + 6) == '0' && b(m + 7) == '0'
      val gnu = b(m) == 'u' && b(m + 1) == 's' && b(m + 2) == 't' &&
        b(m + 3) == 'a' && b(m + 4) == 'r' && b(m + 5) == ' ' &&
        b(m + 6) == ' ' && b(m + 7) == 0
      if (!posix && !gnu) return null
      // checksum: all 512 header bytes, the chksum field as spaces
      var sumU = 0L
      var sumS = 0L
      var i = at
      while (i < at + 512) {
        val inChk = i >= at + 148 && i < at + 156
        sumU += (if (inChk) 32 else b(i) & 0xFF)
        sumS += (if (inChk) 32 else b(i).toLong)
        i += 1
      }
      val stored = octal(b, at + 148, 8)
      if (stored < 0 || (stored != sumU && stored != sumS)) return null
      val size = octal(b, at + 124, 12)
      if (size < 0 || size > MaxLen) return null
      val mtime = octal(b, at + 136, 12)
      if (mtime < 0) return null
      val flag = b(at + 156)
      // a pax `size` key is AUTHORITATIVE for a REGULAR file's data
      // extent (the octal field cannot hold >8 GiB); POSIX says size
      // has no meaning for link/directory members ('1'/'2'/'5' carry
      // no data blocks), so a pax size there is ignored — exactly what
      // real tar does — rather than desynchronizing the walk by
      // skipping nonexistent data; metadata members ('L'/'K'/'x'/'g')
      // always use their own octal size
      val isMember = flag == '0' || flag == 0 || flag == '1' ||
        flag == '2' || flag == '5'
      val isReg = flag == '0' || flag == 0
      // per-key precedence (POSIX): 'x' beats 'g' beats the header —
      // an 'x' without `size` still inherits a global `size`
      val effSize =
        if (!isReg) size
        else if (pendingPax != null && pendingPax.size >= 0) pendingPax.size
        else if (globalPax != null && globalPax.size >= 0) globalPax.size
        else size
      val dataBlocks = ((effSize + 511) / 512).toInt
      if (at + 512 + dataBlocks.toLong * 512 > b.length) return null
      if (flag == 'L' || flag == 'K') {
        // GNU long name / long linkname: the data is the NUL-terminated
        // real string for the NEXT member
        if (size < 1 || size > MaxName) return null
        val s = str(b, at + 512, size.toInt)
        if (s == null || s.isEmpty) return null
        if (flag == 'L') {
          if (pendingName != null) return null // two 'L's in a row
          pendingName = s
        }
        // 'K' targets the linkname, which the census does not report
      } else if (flag == 'x') {
        if (pendingPax != null) return null // two 'x's in a row
        val p = parsePax(b, at + 512, size.toInt)
        if (p.bad) return null
        pendingPax = p
      } else if (flag == 'g') {
        val p = parsePax(b, at + 512, size.toInt)
        if (p.bad) return null
        // later 'g' keys replace earlier ones per-key
        if (globalPax == null) globalPax = p
        else {
          if (p.path != null) globalPax.path = p.path
          if (p.size >= 0) globalPax.size = p.size
          if (p.mtime != Long.MinValue) globalPax.mtime = p.mtime
        }
      } else if (isMember) {
        // pax path outranks the header fields; mixing it with a GNU
        // 'L' for the SAME member is ambiguous — decline
        if (pendingPax != null && pendingPax.path != null &&
          pendingName != null) return null
        val name =
          if (pendingPax != null && pendingPax.path != null) pendingPax.path
          else if (pendingName != null) pendingName
          else if (globalPax != null && globalPax.path != null) globalPax.path
          else {
            val base = str(b, at, 100)
            if (base == null || base.isEmpty) return null
            // the POSIX prefix field only exists in the ustar form
            val pre = if (posix) str(b, at + 345, 155) else ""
            if (pre == null) return null
            if (pre.isEmpty) base else pre + "/" + base
          }
        val effMtime =
          if (pendingPax != null && pendingPax.mtime != Long.MinValue)
            pendingPax.mtime
          else if (globalPax != null && globalPax.mtime != Long.MinValue)
            globalPax.mtime
          else mtime
        pendingName = null
        pendingPax = null
        n += 1
        if (n > MaxEntries) return null
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromString(name),
          UTF8String.fromString(if (flag == 0) "0" else flag.toChar.toString),
          effSize, effMtime))
      } else return null // anything else: decline
      at += 512 + dataBlocks * 512
    }
    null // EOF before the two-zero-block terminator
  }
}

/** `graft_tar_encode(seed, n_entries)` → binary: a REAL ustar archive
  * written per the spec — entry 0 a directory, files with arithmetic
  * payloads, a GNU 'L' long-name member (name > 100 chars, GNU magic
  * on the 'L' header) on (seed+i)%4==0 files, a POSIX prefix-split
  * path on (seed+i)%7==0, a pax 'x' member on (seed+i)%9==0 (UTF-8
  * `path` with a non-ASCII char, fractional `mtime` the census must
  * floor, authoritative `size` over a ZERO octal size field, plus an
  * ignored `atime`), an inert global 'g' comment header on seed%3==0
  * archives, proper checksums, two zero terminator blocks — every
  * reported field (seed, i) arithmetic so the DuckDB oracle restates
  * the census verbatim ([[TarEncode]] scaladoc is the contract the
  * `mm_tar_entries` oracle SQL mirrors). */
case class TarEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_tar_encode expects (long seed, int n_entries)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else TarEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TarEncode =
    copy(children = newChildren)
}

object TarEncode {

  /** What [[TarEntries]] must serve for member i of an archive with
    * seed s — the oracle's contract:
    *  - i == 0: directory `d<s%10>/`, flag "5", 0 bytes, mtime s*100;
    *  - (s+i)%4 == 0: GNU long name
    *    `d<s%10>/f<i>_<110 x's>.dat` (via an 'L' member);
    *  - else (s+i)%7 == 0: prefix-split `p<s%10>/f<i>.dat`;
    *  - else (s+i)%9 == 0: pax path `d<s%10>/f<i>_é.dat` (via an 'x'
    *    member whose `size` is also authoritative — the member
    *    header's octal size field is ZERO);
    *  - else: `d<s%10>/f<i>.dat`;
    *  - files: flag "0", (s + 11*i) % 200 + 5 bytes, mtime s*100+i. */
  def entryName(seed: Long, i: Int): String = {
    if (i == 0) return s"d${seed % 10}/"
    if ((seed + i) % 4 == 0) s"d${seed % 10}/f${i}_${"x" * 110}.dat"
    else if ((seed + i) % 7 == 0) s"p${seed % 10}/f$i.dat"
    else if ((seed + i) % 9 == 0) s"d${seed % 10}/f${i}_é.dat"
    else s"d${seed % 10}/f$i.dat"
  }
  def entrySize(seed: Long, i: Int): Long =
    if (i == 0) 0L else (seed + 11 * i) % 200 + 5

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    // len-1 octal digits, NUL terminator (the POSIX form)
    var i = off + len - 2
    var x = v
    while (i >= off) { h(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
  }
  private def putStr(h: Array[Byte], off: Int, s: String): Unit = {
    val a = s.getBytes("US-ASCII")
    System.arraycopy(a, 0, h, off, a.length)
  }

  private def header(name: String, size: Long, mtime: Long, flag: Byte,
      gnuMagic: Boolean, prefix: String): Array[Byte] = {
    val h = new Array[Byte](512)
    putStr(h, 0, name)
    putOctal(h, 100, 8, 420) // mode 0644
    putOctal(h, 108, 8, 0)
    putOctal(h, 116, 8, 0)
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, mtime)
    h(156) = flag
    if (gnuMagic) putStr(h, 257, "ustar  ") // "ustar ", version " \0"
    else { putStr(h, 257, "ustar"); h(263) = '0'; h(264) = '0' } // "ustar\0" "00"
    putStr(h, 265, "graft")
    putStr(h, 297, "graft")
    if (prefix.nonEmpty) putStr(h, 345, prefix)
    // checksum: field as spaces, unsigned sum, "%06o\0 "
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    var j = 153
    var x = sum
    while (j >= 148) { h(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  private def paxRecord(key: String, value: String): Array[Byte] = {
    // "%d %s=%s\n" where the length counts ITSELF — fixed point over
    // the digit count
    val body = s" $key=$value\n".getBytes("UTF-8")
    var digits = 1
    while (s"${body.length + digits}".length > digits) digits += 1
    (s"${body.length + digits}".getBytes("US-ASCII")) ++ body
  }

  def encode(seed: Long, nEntries: Int): Array[Byte] = {
    if (seed < 0 || nEntries < 1 || nEntries > 64) return null
    val bos = new java.io.ByteArrayOutputStream()
    if (seed % 3 == 0) {
      // an inert global pax header: comment-only, so every census
      // field still comes from the member headers (pinning that a 'g'
      // the parser must WALK THROUGH does not perturb the output)
      val g = paxRecord("comment", s"graft archive $seed")
      bos.write(header("pax_global_header", g.length, 0, 'g',
        gnuMagic = false, prefix = ""))
      val pad = new Array[Byte](((g.length + 511) / 512) * 512)
      System.arraycopy(g, 0, pad, 0, g.length)
      bos.write(pad)
    }
    var i = 0
    while (i < nEntries) {
      val full = entryName(seed, i)
      val size = entrySize(seed, i)
      val mtime = if (i == 0) seed * 100 else seed * 100 + i
      if (i == 0) {
        bos.write(header(full, 0, mtime, '5', gnuMagic = false, prefix = ""))
      } else if ((seed + i) % 4 == 0) {
        // the GNU way: an 'L' member (GNU magic, conventional name)
        // whose data is the NUL-terminated real name, then the real
        // header carrying the TRUNCATED name
        val nameBytes = full.getBytes("US-ASCII")
        bos.write(header("././@LongLink", nameBytes.length + 1, 0, 'L',
          gnuMagic = true, prefix = ""))
        val data = new Array[Byte](((nameBytes.length + 1 + 511) / 512) * 512)
        System.arraycopy(nameBytes, 0, data, 0, nameBytes.length)
        bos.write(data)
        bos.write(header(full.substring(0, 100), size, mtime, '0',
          gnuMagic = false, prefix = ""))
        writePayload(bos, seed, i, size)
      } else if ((seed + i) % 7 == 0) {
        // the POSIX way: prefix + "/" + name
        bos.write(header(s"f$i.dat", size, mtime, '0', gnuMagic = false,
          prefix = s"p${seed % 10}"))
        writePayload(bos, seed, i, size)
      } else if ((seed + i) % 9 == 0) {
        // the pax way: an 'x' member carrying path (UTF-8), a
        // fractional mtime (the census floors to the contract value),
        // the AUTHORITATIVE size (the member's octal field is zero),
        // and an atime the census must ignore
        val recs = paxRecord("path", full) ++
          paxRecord("mtime", s"$mtime.25") ++
          paxRecord("size", size.toString) ++
          paxRecord("atime", "99")
        bos.write(header(s"PaxHeaders.0/f$i.dat", recs.length, 0, 'x',
          gnuMagic = false, prefix = ""))
        val pad = new Array[Byte](((recs.length + 511) / 512) * 512)
        System.arraycopy(recs, 0, pad, 0, recs.length)
        bos.write(pad)
        // the member header: fallback name, octal size ZERO and mtime
        // zero — the pax keys are the only truth
        bos.write(header(s"f$i.dat", 0, 0, '0', gnuMagic = false, prefix = ""))
        writePayload(bos, seed, i, size)
      } else {
        bos.write(header(full, size, mtime, '0', gnuMagic = false, prefix = ""))
        writePayload(bos, seed, i, size)
      }
      i += 1
    }
    bos.write(new Array[Byte](1024)) // the two-zero-block terminator
    bos.toByteArray
  }

  private def writePayload(bos: java.io.ByteArrayOutputStream, seed: Long,
      i: Int, size: Long): Unit = {
    val data = new Array[Byte]((((size + 511) / 512) * 512).toInt)
    var j = 0
    while (j < size) {
      data(j) = ((seed + 3 * i + j) % 251).toByte
      j += 1
    }
    bos.write(data)
  }
}
