package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's cross-engine base hash
  * ([[graft.operators.Dedup.hash60]]): the first 60 bits of md5, as a
  * long. Bit-identical to `conv(substring(md5(s),1,15),16,10)` — and to
  * DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT` — but computed
  * straight from the digest bytes: the composed form allocates the full
  * 32-char hex string, a substring copy, and a decimal re-parse per
  * value, which dominates shingle-hashing on the minhash/simhash hot
  * paths. Hash60Spec asserts equality with the composed form.
  */
object GraftHash {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as an unsigned 60-bit long:
    * 7 full bytes then the high nibble of byte 7. */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }
}

case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 expects a string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    GraftHash.md5Prefix60(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GraftHash.md5Prefix60($s.getBytes());")

  override protected def withNewChildInternal(c: Expression): Hash60 =
    copy(child = c)
}

object Hash60 {
  def hash60(c: Column): Column = Shim.column(Hash60(Shim.expression(c)))
}
