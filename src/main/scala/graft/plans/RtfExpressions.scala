package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RTF text extraction — the legacy word-processing format that
  * predates the ZIP-of-XML office family (Word RTF spec 1.9, a
  * public grammar): `{`/`}` groups, `\word` control words with an
  * optional signed decimal parameter, `\X` control symbols, and
  * plain text, all in one byte stream starting `{\rtf1`.
  *
  * `graft_rtf_text(binary)` → string, the document's visible text:
  *
  *  - `\par` and `\line` (and the bare `\<CR>`/`\<LF>` equivalents)
  *    append '\n'; `\tab` appends '\t';
  *  - `\'hh` is a byte in the document code page — cp1252 by default
  *    (the `\ansi` default, decoded by the same WHATWG table as the
  *    HTTP tier), with `\ansicpg1250`-`1258` rebinding the table
  *    through the JDK's own single-byte Windows decoders (the
  *    Central-European / Cyrillic / Greek / Turkish / Hebrew /
  *    Arabic / Baltic / Vietnamese legacy tails); a multi-byte code
  *    page (932, 936, 949, 950...) DECLINES the document — `\'hh` is
  *    one byte, serving MBCS pairs through it would be mojibake —
  *    and a byte UNDEFINED in the declared page declines too; raw
  *    unescaped bytes >= 0x80 in plain text decode through the SAME
  *    table (never a Latin-1 identity);
  *  - `\uN` is a signed 16-bit Unicode scalar (negative N + 65536);
  *    the following `\ucN`-many fallback characters (plain chars or
  *    `\'hh` escapes) are SKIPPED per the spec's uc protocol;
  *    surrogate code points decline (never a lone surrogate);
  *  - the named punctuation words decode: `\emdash \endash \lquote
  *    \rquote \ldblquote \rdblquote \bullet \enspace \emspace`;
  *  - `\~` is a no-break space, `\_` a non-breaking hyphen, `\-` an
  *    optional hyphen (nothing); `\\ \{ \}` are literal;
  *  - destination groups contribute NOTHING: every `{\*` starred
  *    destination, and the known non-starred set (fonttbl, colortbl,
  *    stylesheet, info, header/footer variants, pict, object,
  *    fldinst, ftnsep...); `\binN` consumes its N raw bytes wherever
  *    it appears (raw binary would desynchronize the brace walk);
  *  - all other control words are formatting, inert by the spec's
  *    ignore-unknown rule.
  *
  * Parse-or-NULL: not starting `{\rtf`, unbalanced braces, group
  * depth > 64, a malformed `\'h?` escape, `\uc` outside 0..8, an
  * undeclared-code-page byte, or any bound violation NULLs the
  * document — faithful-or-NULL like every extractor in the family.
  * 1 MiB input ceiling. */
case class RtfText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rtf_text expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rtf_text"

  override def nullSafeEval(input: Any): Any =
    RtfText.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.RtfText.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): RtfText =
    copy(child = newChild)
}

object RtfText {

  private val MaxLen = 1 << 20
  private val MaxDepth = 64
  private val MaxOut = 1 << 20

  /** Non-starred destination groups whose content is never document
    * text (RTF 1.9 destination control words). */
  private val Destinations: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "fldinst", "ftnsep", "ftnsepc",
    "aftnsep", "aftnsepc", "annotation", "atnid", "xe", "tc",
    "bkmkstart", "bkmkend", "buptim", "comment", "creatim", "doccomm",
    "printim", "revtim", "rxe", "subject", "title", "author",
    "operator", "keywords", "generator", "filetbl", "listtable",
    "listoverridetable", "revtbl", "themedata", "colorschememapping",
    "datastore", "latentstyles", "pntext", "pntxta", "pntxtb",
    "footnote", "ftncn", "aftncn", "atnref", "atrfstart", "atrfend")

  /** Per-code-page byte tables for \'hh: cp1252 is the WHATWG table
    * the HTTP tier uses; the other single-byte Windows pages
    * (1250-1258 — the Central-European / Cyrillic / Greek / Turkish
    * / Hebrew / Arabic / Baltic / Vietnamese legacy tails) build from
    * the JDK's own decoders, with undecodable bytes left 0 =
    * undefined (a document that USES one declines). Multi-byte code
    * pages (932, 936, ...) are outside this model — \'hh is one byte
    * — so they decline at declaration. */
  private val cpCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Char]]()

  private def cpTable(cp: Int): Array[Char] = {
    val hit = cpCache.get(cp)
    if (hit != null) return hit
    val t: Array[Char] =
      if (cp == 1252) {
        val a = new Array[Char](256)
        var i = 0
        while (i < 256) {
          a(i) = if (i < 0x80 || i >= 0xA0) i.toChar
          else HttpText.Cp1252High(i - 0x80)
          i += 1
        }
        a
      } else if (cp >= 1250 && cp <= 1258) {
        try {
          val dec = java.nio.charset.Charset.forName("windows-" + cp)
          val a = new Array[Char](256)
          var i = 0
          while (i < 256) {
            val s = new String(Array(i.toByte), dec)
            if (s.length == 1 && s.charAt(0) != '�') a(i) = s.charAt(0)
            i += 1
          }
          a
        } catch { case _: Exception => null }
      } else null
    if (t != null) cpCache.put(cp, t)
    t
  }

  def parse(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 6 || b.length > MaxLen) return null
    if (!(b(0) == '{' && b(1) == '\\' && b(2) == 'r' && b(3) == 't' &&
      b(4) == 'f')) return null
    val out = new java.lang.StringBuilder(256)
    var table: Array[Char] = cpTable(1252) // the \ansi default
    // group state: bit-packed (skipping, uc) per depth
    val skipStack = new Array[Boolean](MaxDepth + 1)
    val ucStack = new Array[Int](MaxDepth + 1)
    var depth = -1
    var skipping = false
    var uc = 1
    var pendingSkip = 0 // \uN fallback characters still to swallow
    var i = 0

    def push(): Boolean = {
      if (depth + 1 >= MaxDepth) return false
      depth += 1
      skipStack(depth) = skipping
      ucStack(depth) = uc
      true
    }
    def pop(): Boolean = {
      if (depth < 0) return false
      skipping = skipStack(depth)
      uc = ucStack(depth)
      depth -= 1
      true
    }
    def emit(c: Char): Unit =
      if (!skipping) {
        if (pendingSkip > 0) pendingSkip -= 1
        else out.append(c)
      }
    def emitStr(s: String): Unit =
      if (!skipping) {
        if (pendingSkip > 0) pendingSkip -= 1
        else out.append(s)
      }

    while (i < b.length) {
      if (out.length > MaxOut) return null
      val c = b(i) & 0xFF
      if (c == '{') { if (!push()) return null; i += 1 }
      else if (c == '}') {
        if (!pop()) return null
        i += 1
        if (depth < 0) {
          // the root group closed: trailing bytes past it (beyond
          // whitespace) are not RTF
          var j = i
          while (j < b.length && (b(j) == '\r' || b(j) == '\n' ||
            b(j) == ' ' || b(j) == '\t')) j += 1
          if (j != b.length) return null
          return UTF8String.fromString(out.toString)
        }
      } else if (c == '\\') {
        i += 1
        if (i >= b.length) return null
        val d = b(i) & 0xFF
        if (d >= 'a' && d <= 'z') {
          // control word: letters, then optional signed parameter,
          // then one optional space delimiter
          val start = i
          while (i < b.length && (b(i) & 0xFF) >= 'a' && (b(i) & 0xFF) <= 'z' &&
            i - start < 33) i += 1
          if (i - start > 32) return null // the spec allows exactly 32
          val word = new String(b, start, i - start, "ISO-8859-1")
          var param = Long.MinValue
          if (i < b.length && (b(i) == '-' || ((b(i) & 0xFF) >= '0' && (b(i) & 0xFF) <= '9'))) {
            val neg = b(i) == '-'
            if (neg) i += 1
            val ds = i
            while (i < b.length && (b(i) & 0xFF) >= '0' && (b(i) & 0xFF) <= '9' &&
              i - ds < 10) i += 1
            if (i == ds) return null
            param = new String(b, ds, i - ds, "ISO-8859-1").toLong
            if (neg) param = -param
          }
          if (i < b.length && b(i) == ' ') i += 1 // the delimiter space
          word match {
            case "par" | "line" | "row" => emit('\n')
            case "tab" | "cell" => emit('\t')
            case "emdash" => emit('—')
            case "endash" => emit('–')
            case "lquote" => emit('‘')
            case "rquote" => emit('’')
            case "ldblquote" => emit('“')
            case "rdblquote" => emit('”')
            case "bullet" => emit('•')
            case "enspace" | "emspace" => emit(' ')
            case "u" =>
              if (param == Long.MinValue) return null
              var cp = param
              if (cp < 0) cp += 65536
              if (cp < 0x20 || cp > 0xFFFF ||
                (cp >= 0xD800 && cp <= 0xDFFF)) return null
              emit(cp.toChar)
              if (!skipping) pendingSkip = uc
            case "uc" =>
              if (param < 0 || param > 8) return null
              uc = param.toInt
            case "ansicpg" =>
              // single-byte Windows pages rebind the \'hh table; a
              // code page outside them (the MBCS family) declines —
              // decoding its byte pairs one at a time is mojibake
              if (param < 0 || param > 65535) return null
              table = cpTable(param.toInt)
              if (table == null) return null
            case "bin" =>
              // raw binary payload: consume it wherever it appears —
              // its bytes would desynchronize the brace walk
              if (param < 0 || param > MaxLen || i + param > b.length) return null
              i += param.toInt
            case w if Destinations.contains(w) => skipping = true
            case _ => () // formatting: the spec's ignore-unknown rule
          }
        } else {
          i += 1
          d match {
            case '\'' =>
              if (i + 1 >= b.length) return null
              val h = Character.digit(b(i), 16)
              val l = Character.digit(b(i + 1), 16)
              if (h < 0 || l < 0) return null
              i += 2
              val ch = table((h << 4) | l)
              if (ch == 0) return null // undefined in this code page
              emit(ch)
            case '\\' => emit('\\')
            case '{' => emit('{')
            case '}' => emit('}')
            case '~' => emit('\u00A0')
            case '_' => emit('-')
            case '-' => () // optional hyphen: nothing
            case '*' => skipping = true // starred destination
            case '\r' | '\n' => emit('\n') // \<EOL> is a \par alias
            case _ => () // unknown control symbol: ignore (spec rule)
          }
        }
      } else {
        // raw plain-text bytes: ASCII identity; a high byte is a byte
        // in the declared code page exactly like \'hh (real RTF —
        // especially \ansicpg1251 — carries them unescaped; a Latin-1
        // identity here would be silent mojibake), declining when the
        // page leaves it undefined
        if (c >= 0x80) {
          val ch = table(c)
          if (ch == 0) return null
          emit(ch)
        } else if (c != '\r' && c != '\n') emit(c.toChar)
        i += 1
      }
    }
    null // EOF before the root group closed
  }
}

/** `graft_rtf_encode(seed, n_paras)` → binary: a REAL RTF document —
  * fonttbl/colortbl/info destinations and a `{\*\generator}` starred
  * group that must all be invisible, formatting noise, cp1252 `\'hh`
  * escapes, `\uN` escapes WITH fallback text that must be skipped
  * (the uc protocol), the named punctuation words, and `\tab` runs —
  * every decoded character (seed, para) arithmetic so the DuckDB
  * oracle restates the extraction verbatim ([[RtfEncode.decodedPara]]). */
case class RtfEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_rtf_encode expects (long seed, int n_paras)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rtf_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else RtfEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RtfEncode =
    copy(children = newChildren)
}

object RtfEncode {

  /** What [[RtfText]] must decode paragraph i (0-based) to — the
    * oracle's contract. */
  def decodedPara(seed: Long, i: Int): String = {
    val tail = (seed + i) % 3 match {
      case 0 => "— “q” • fin" // emdash, curly quotes, bullet
      case 1 => "café résumé" // cp1252 \'hh escapes
      case _ => "€ §" + "\t" + "end" // \u8364 with fallback, \'a7, \tab
    }
    s"Para $i of doc $seed: $tail"
  }

  def encode(seed: Long, nParas: Int): Array[Byte] = {
    if (seed < 0 || nParas < 1 || nParas > 64) return null
    val sb = new StringBuilder()
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\n")
    // destinations that must contribute nothing
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\froman Times;}}\n")
    sb.append("{\\colortbl;\\red255\\green0\\blue0;}\n")
    sb.append(s"{\\info{\\title Doc $seed}{\\author graft}}\n")
    sb.append(s"{\\*\\generator graft ${seed % 100};}\n")
    var i = 0
    while (i < nParas) {
      // formatting noise is inert; \fs cycles so the delimiter-space
      // rule is exercised against digits
      sb.append(s"\\pard\\f${(seed + i) % 2}\\fs${20 + (i % 3) * 2}\\b${i % 2} ")
      sb.append(s"Para $i of doc $seed: ")
      (seed + i) % 3 match {
        case 0 =>
          sb.append("\\emdash  \\ldblquote q\\rdblquote  \\bullet  fin")
        case 1 =>
          sb.append("caf\\'e9 r\\'e9sum\\'e9")
        case _ =>
          // \u8364 (€) with a '?' fallback the uc protocol must skip;
          // \'a7 is § in cp1252; \tab between
          sb.append("\\uc1\\u8364 ? \\'a7\\tab end")
      }
      sb.append("\\par\n")
      i += 1
    }
    sb.append("}")
    sb.toString.getBytes("ISO-8859-1")
  }
}
