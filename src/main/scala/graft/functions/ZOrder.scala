package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Native form of the Morton/Z-order interleave behind
  * [[graft.sources.Layout.zValue]]: one codegen'd loop instead of the
  * composed form's ~4·bits-node expression tree (16 shifts + 16 masks +
  * 16 multiplies + adds per dimension). Same value bit for bit —
  * ZOrderSpec asserts equality with the composed form, and the
  * `zorder_key` oracle recomputes it in ANSI SQL. SQL-callable as
  * `z_order(x, y, bits)` via [[GraftFunctions]].
  */
object GraftZ {
  /** Interleave the low `bits` bits: x on odd positions, y on even. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bits) {
      v |= (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      i += 1
    }
    v
  }
}

case class ZOrder64(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"z_order bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_order"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(x: Any, y: Any): Any =
    GraftZ.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GraftZ.interleave($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder64 = copy(left = l, right = r)
}

object ZOrder64 {
  def z_order(x: Column, y: Column, bits: Int = 16): Column =
    Shim.column(ZOrder64(Shim.expression(x), Shim.expression(y), bits))
}
