package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Broadcast Bloom-filter join pruning — the runtime-filter pattern for
  * the reference's key-store⋈entity join (SURVEY.md §2.3 J1) when the
  * dim side is too big to turn into an `isin` list but tiny next to the
  * fact side.
  *
  * The dim side's join keys fold into a few-KB bit array driver-side
  * (one small aggregation job — the same shape Spark's own runtime
  * bloom-join injects); the filter then prunes fact rows BEFORE the
  * join's shuffle, which is the entire point at 100 TB: shuffle bytes
  * scale with the ~selectivity of the dim, not the fact table. No false
  * negatives, so the join result is bit-identical with or without the
  * filter — the oracle checks the plain join.
  */
object GraftBloom {

  /** Immutable bloom bits + hash count. m is rounded up to a power of
    * two so the modulo is a mask. */
  final class Filter(val bits: Array[Long], val numHashes: Int)
      extends Serializable {
    def mightContain(key: Long): Boolean =
      GraftBloom.mightContain(bits, numHashes, key)
  }

  /** splitmix64 finalizer — avalanches the raw long key. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mightContain(bits: Array[Long], numHashes: Int, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    val m = bits.length.toLong * 64L
    var j = 0
    while (j < numHashes) {
      val bit = ((h1 + j * h2) & Long.MaxValue) % m
      if ((bits((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** Build from a key set, sized for ~`fpp` false positives. */
  def create(keys: Iterable[Long], fpp: Double = 0.01): Filter = {
    val n = math.max(keys.size, 1)
    val mExact = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1, Integer.highestOneBit(
      math.max(1, ((mExact + 63) / 64).toInt) * 2 - 1))
    val k = math.max(1, math.round(words * 64.0 / n * math.log(2)).toInt)
    val bits = new Array[Long](words)
    val m = words.toLong * 64L
    keys.foreach { key =>
      val h1 = mix(key)
      val h2 = mix(h1) | 1L
      var j = 0
      while (j < k) {
        val bit = ((h1 + j * h2) & Long.MaxValue) % m
        bits((bit >>> 6).toInt) |= 1L << (bit & 63)
        j += 1
      }
    }
    new Filter(bits, k)
  }

  /** Build from the distinct values of a (small) dim-side key column —
    * one aggregation job; only the compact filter reaches the driver. */
  def fromColumn(df: DataFrame, key: String, fpp: Double = 0.01): Filter =
    create(df.select(org.apache.spark.sql.functions.col(key).cast("long"))
      .na.drop().distinct().collect().map(_.getLong(0)), fpp)

  /** `bloom_might_contain(keyCol)` — codegen'd membership probe. */
  def might_contain(key: Column, f: Filter): Column =
    Shim.column(BloomMightContain(Shim.expression(key), f))
}

/** Codegen'd bloom-filter membership probe over a long key column. The
  * filter ships to executors as a referenced object inside the codegen
  * context (same mechanism broadcast literals use). */
case class BloomMightContain(child: Expression, filter: GraftBloom.Filter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got ${child.dataType.sql}")

  override def nullSafeEval(key: Any): Any =
    filter.mightContain(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[GraftBloom.Filter].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $ref.mightContain($key);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
