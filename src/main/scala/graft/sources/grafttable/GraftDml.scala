package graft.sources.grafttable

import org.apache.spark.sql.Column
import org.apache.spark.sql.connector.expressions.{Expression, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue, And, Not, Or, Predicate}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.types._

/** Catalyst v2 `Predicate` → [[Column]], for the SQL DML surface
  * (`DELETE FROM graft.` … `WHERE`): Spark's analyzer translates the
  * WHERE clause into connector predicates, and this translator rebuilds
  * them STRUCTURALLY as Columns — no SQL-string round trip, so literal
  * quoting/escaping can never diverge from what the user wrote.
  *
  * Deliberately partial: only shapes whose semantics are identical on
  * both sides translate (comparison/IN/NULL-test/boolean algebra over a
  * plain column and a plain literal). `translate` returning None makes
  * [[GraftTable.canDeleteWhere]] refuse, and Spark reports the
  * untranslatable condition to the user instead of us guessing. */
private[grafttable] object GraftDml {

  def translate(p: Predicate): Option[Column] = p match {
    case _: AlwaysTrue => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case a: And =>
      for (l <- translate(a.left()); r <- translate(a.right())) yield l && r
    case o: Or =>
      for (l <- translate(o.left()); r <- translate(o.right())) yield l || r
    case n: Not => translate(n.child()).map(not)
    case _ => scalar(p)
  }

  private def scalar(p: Predicate): Option[Column] = {
    val kids = p.children()
    p.name() match {
      case "IS_NULL" if kids.length == 1 =>
        ref(kids(0)).map(_.isNull)
      case "IS_NOT_NULL" if kids.length == 1 =>
        ref(kids(0)).map(_.isNotNull)
      case "IN" if kids.length >= 2 =>
        for {
          c <- ref(kids(0))
          vs <- sequence(kids.drop(1).toSeq.map(value))
        } yield c.isin(vs: _*)
      case cmp @ ("=" | "<>" | "!=" | "<=>" | "<" | "<=" | ">" | ">=")
          if kids.length == 2 =>
        (ref(kids(0)), value(kids(1)), ref(kids(1)), value(kids(0))) match {
          case (Some(c), Some(v), _, _) => Some(compare(cmp, c, v))
          case (_, _, Some(c), Some(v)) => Some(compare(mirror(cmp), c, v))
          case _ => None
        }
      case "STARTS_WITH" if kids.length == 2 =>
        strPair(kids).map { case (c, s) => c.startsWith(s) }
      case "ENDS_WITH" if kids.length == 2 =>
        strPair(kids).map { case (c, s) => c.endsWith(s) }
      case "CONTAINS" if kids.length == 2 =>
        strPair(kids).map { case (c, s) => c.contains(s) }
      case _ => None
    }
  }

  private def compare(op: String, c: Column, v: Any): Column = op match {
    case "=" => c === lit(v)
    case "<>" | "!=" => c =!= lit(v)
    case "<=>" => c <=> lit(v)
    case "<" => c < lit(v)
    case "<=" => c <= lit(v)
    case ">" => c > lit(v)
    case ">=" => c >= lit(v)
  }

  /** `lit OP col` rewritten as `col mirror(OP) lit`. */
  private def mirror(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other // =, <>, <=> are symmetric
  }

  private def ref(e: Expression): Option[Column] = e match {
    case r: NamedReference if r.fieldNames().length == 1 =>
      Some(col(s"`${r.fieldNames()(0)}`"))
    case _ => None
  }

  /** Literal → the external Scala value `functions.lit` round-trips to
    * the SAME Catalyst literal. Types without that guarantee (binary,
    * intervals, nested) don't translate. */
  private def value(e: Expression): Option[Any] = e match {
    // a NULL literal (e.g. `c IN ('a', NULL)`) has no lit-round-trip
    // form — refuse so canDeleteWhere falls back, never NPE mid-cast
    case l: Literal[_] if l.value == null => None
    case l: Literal[_] => l.dataType match {
      case StringType => Some(l.value.toString)
      case BooleanType | ByteType | ShortType | IntegerType | LongType =>
        Some(l.value)
      case DoubleType | FloatType => Some(l.value)
      case DateType =>
        Some(java.time.LocalDate.ofEpochDay(
          l.value.asInstanceOf[Int].toLong))
      case TimestampType =>
        Some(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .microsToInstant(l.value.asInstanceOf[Long]))
      case _: DecimalType =>
        Some(l.value.asInstanceOf[Decimal].toJavaBigDecimal)
      case _ => None
    }
    case _ => None
  }

  private def strPair(kids: Array[Expression]): Option[(Column, String)] =
    for {
      c <- ref(kids(0))
      v <- value(kids(1)).collect { case s: String => s }
    } yield (c, v)

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
