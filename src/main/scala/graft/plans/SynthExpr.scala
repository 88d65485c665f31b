package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Generic fixture-synthesis expression: `eval` applies `fn` to the
  * evaluated children (null-safe), typed by `expects`. Fixture builds
  * run once per doc at media-table write time, so CodegenFallback is
  * the right cost/complexity point — the DECODERS stay codegen'd. */
case class SynthExpr(children: Seq[Expression], name: String,
    expects: Seq[DataType], fn: Seq[Any] => Any)
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.map(_.dataType) == expects) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ${expects.mkString("(", ", ", ")")}, " +
      s"got ${children.map(_.dataType).mkString("(", ", ", ")")}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = name

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null else fn(vs)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SynthExpr =
    copy(children = newChildren)
}
