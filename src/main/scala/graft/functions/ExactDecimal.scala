package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The EXACT decimal expansion of a double, as a plain string — the
  * canonical double→decimal input hop for every cross-engine Lloyd
  * mean ([[DecimalConv.decMean]]/[[DecimalConv.f32Mean]]).
  *
  * Why this exists (the vecdegen-s2 `sim_topk_ivfpq_res` finding):
  * Spark's native double→decimal cast goes through Java's PRE-RYU
  * `Double.toString` (its VALUE, not the exact binary value), while
  * the oracle's `CAST(x AS VARCHAR)` hop is DuckDB's Ryu shortest
  * repr — and the two algorithms disagree in VALUE on ~18% of doubles
  * needing 16–17 significant digits (measured over 500k samples; e.g.
  * Java `8.5749614564503808E17` vs Ryu `8.574961456450381e+17` — the
  * same double, two different decimals). Below ~1e15 both collapse to
  * the same shortest value, which is why eleven gate modes never saw
  * it; at vecdegen's 1e16–1e18 magnitudes the decimal SUMS fork, the
  * double means land one ulp apart, and one mean sat exactly on a
  * float32 rounding boundary — a one-float-ulp codebook fork.
  *
  * `new java.math.BigDecimal(x)` is the EXACT value of the double —
  * defined by IEEE-754 arithmetic, not by any repr algorithm — and
  * the oracle replays it with DuckDB's correctly-rounded
  * `format('{:.70e}', x)` (validated bit-exact against exact
  * quantization over 53k adversarial samples; |x| < 5e-19 is guarded
  * to 0 on the oracle side because DuckDB's string→decimal parser
  * mis-rounds long-mantissa huge-negative-exponent strings — those
  * values quantize to 0 at scale 18 on both sides regardless).
  * `toPlainString` (never scientific) parses identically everywhere.
  */
case class ExactDecimalString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "exact_decimal_str"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_decimal_str expects a double, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      new java.math.BigDecimal(v.asInstanceOf[Double]).toPlainString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  new java.math.BigDecimal($d).toPlainString());""".stripMargin)

  override protected def withNewChildInternal(c: Expression): ExactDecimalString =
    copy(child = c)
}

object ExactDecimal {
  def exactDecimalStr(c: Column): Column =
    Shim.column(ExactDecimalString(Shim.expression(c)))
}
