package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Plain-text payload decode — the triage tier for the corpus share
  * that is no container at all: .txt / .md / .csv / logs. A real
  * crawl's attachment mix is full of bare text files; before this
  * tier they landed in the `kind='other'` bucket with no text served.
  *
  * `graft_plain_text(binary)` → string under a strict, deterministic
  * definition of "text" (no heuristics, no confidence scores — the
  * faithful-or-NULL house law):
  *
  *  - BOM sniffing first (the WHATWG order the HTTP tier already
  *    follows): EF BB BF → UTF-8 on the remainder; FF FE → UTF-16LE;
  *    FE FF → UTF-16BE; otherwise the whole payload must be UTF-8;
  *  - decoding is STRICT (JDK decoders with REPORT): any malformed
  *    sequence, an odd-length UTF-16 body, or a lone surrogate
  *    declines — mojibake is never served;
  *  - the decoded text must contain no NUL and no C0 control other
  *    than TAB/LF/CR, and no DEL (0x7F): a payload with other control
  *    bytes is binary wearing a text charset, and serving it would
  *    make every downstream text metric lie;
  *  - an empty payload declines (nothing to classify); a BOM with an
  *    empty body serves the empty string (the BOM is the
  *    classification);
  *  - payloads past 4 MiB decline (the family's bounded-input law).
  *
  * NULL is the routing verdict: [[graft.operators.Multimodal.docTextSelect]]
  * calls this as the LAST classifier, so a decline here lands the row
  * in the counted `kind='other'` bucket, never a silent drop. */
case class PlainText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_plain_text expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_plain_text"

  override def nullSafeEval(input: Any): Any =
    PlainText.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PlainText.decode($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PlainText =
    copy(child = newChild)
}

object PlainText {

  private val MaxLen = 1 << 22

  /** Strict REPORT-mode decode of b[off, off+len): null on any
    * malformed or unmappable sequence — the plans package's one
    * shared mojibake-never decode ([[TarEntries]] delegates here for
    * pax values). */
  private[plans] def strictOrNull(b: Array[Byte], off: Int, len: Int,
      cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  private def strict(b: Array[Byte], off: Int, cs: java.nio.charset.Charset): String =
    strictOrNull(b, off, b.length - off, cs)

  def decode(b: Array[Byte]): UTF8String = {
    if (b == null || b.length == 0 || b.length > MaxLen) return null
    val s =
      if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
        (b(2) & 0xFF) == 0xBF)
        strict(b, 3, java.nio.charset.StandardCharsets.UTF_8)
      else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
        strict(b, 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
        strict(b, 2, java.nio.charset.StandardCharsets.UTF_16BE)
      else strict(b, 0, java.nio.charset.StandardCharsets.UTF_8)
    if (s == null) return null
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7F)
        return null
      i += 1
    }
    UTF8String.fromString(s)
  }
}
