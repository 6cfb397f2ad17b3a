package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native overlapping character n-grams — O(len·n), one pass.
  *
  * The composed form (`transform(sequence(1, len−n+1), i →
  * substring(t, i, n))`) is O(len²): `UTF8String.substring` has no
  * codepoint index, so EVERY call scans from byte 0 to find its start
  * offset — invisible on ~300-char fixture docs, but a 240k-char doc
  * (one pathological web page) costs ~6·10¹⁰ byte steps and a single
  * task pins a core for minutes (found by the hugedoc degenerate gate,
  * not review; the exact failure mode the r12 gate was built to catch).
  * Here the codepoint start offsets are collected once (one O(len)
  * scan), then each gram is a bounded byte-slice copy.
  *
  * Semantics are bit-identical to the composed form: grams of `n`
  * CODEPOINTS (never UTF-16 units — astral chars count 1), positions
  * 1..len−n+1, fewer than n codepoints → empty array, null → null.
  * CharNgramsSpec pins equality against the composed form on ASCII,
  * CJK and astral inputs.
  */
object CharNgramsUtil {
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // codepoint start byte-offsets, one pass
    val starts = new Array[Int](s.numChars() + 1)
    var cp = 0
    var off = 0
    while (off < total) {
      starts(cp) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      cp += 1
    }
    starts(cp) = total
    val len = cp
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(i), starts(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams needs n >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    CharNgramsUtil.ngrams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharNgramsUtil.ngrams($s, $n);")

  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)
}

object CharNgrams {
  def charNgrams(c: Column, n: Int): Column =
    Shim.column(CharNgrams(Shim.expression(c), n))
}
