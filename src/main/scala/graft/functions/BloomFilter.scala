package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Broadcast Bloom-filter join pruning — the runtime-filter pattern for
  * the reference's key-store⋈entity join (SURVEY.md §2.3 J1) when the
  * dim side is too big to turn into an `isin` list but tiny next to the
  * fact side.
  *
  * The dim side's join keys fold into a bit array ENTIRELY executor-side
  * ([[BloomBuildAgg]], a bloom-OR-merging aggregate — the same shape
  * Spark's own runtime bloom-join injects); only the fixed-size bit
  * array crosses to the driver, never the key set, so a 500M-key dim
  * side costs the driver a few KB instead of an OOM. The filter then
  * prunes fact rows BEFORE the join's shuffle, which is the entire point
  * at 100 TB: shuffle bytes scale with the ~selectivity of the dim, not
  * the fact table. No false negatives, so the join result is
  * bit-identical with or without the filter — the oracle checks the
  * plain join.
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

  /** Size the filter for `n` keys at ~`fpp` false positives:
    * (word count [power of two, so modulo is a mask], hash count).
    * Long arithmetic throughout (an Int cast on the exact bit count
    * would wrap negative past ~7e9 keys and silently collapse the
    * filter to 64 bits ≈ fpp 1.0), and the array is capped at
    * [[MaxWords]] (256 MB of bits) — beyond that the false-positive
    * rate degrades gracefully instead of the broadcast blowing up. */
  val MaxWords: Int = 1 << 25
  def sizing(n: Long, fpp: Double): (Int, Int) = {
    val nn = math.max(n, 1L)
    val mExact = math.ceil(-nn * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val wordsExact = math.max(1L, (mExact + 63L) / 64L)
    val words =
      if (wordsExact >= MaxWords) MaxWords
      else math.max(1L, java.lang.Long.highestOneBit(wordsExact * 2L - 1L)).toInt
    val k = math.max(1, math.round(words * 64.0 / nn * math.log(2)).toInt)
    (words.toInt, k)
  }

  /** Set `key`'s k bits in-place. */
  def set(bits: Array[Long], numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    val m = bits.length.toLong * 64L
    var j = 0
    while (j < numHashes) {
      val bit = ((h1 + j * h2) & Long.MaxValue) % m
      bits((bit >>> 6).toInt) |= 1L << (bit & 63)
      j += 1
    }
  }

  /** Build from a key set, sized for ~`fpp` false positives. */
  def create(keys: Iterable[Long], fpp: Double = 0.01): Filter = {
    val (words, k) = sizing(keys.size.toLong, fpp)
    val bits = new Array[Long](words)
    keys.foreach(set(bits, k, _))
    new Filter(bits, k)
  }

  /** Build from a dim-side key column, executor-side: one cheap
    * HLL-estimated distinct count to size the filter (sizing on the raw
    * row count would scale the bit array with duplicates, not keys —
    * a duplicate-heavy dim side would re-create the very memory blowup
    * this executor-side build avoids; the ±2% sketch error is noise
    * next to the 2× power-of-two rounding), then one [[BloomBuildAgg]]
    * aggregation whose partial buffers OR together; only the final bit
    * array is collected. Nothing proportional to the key count ever
    * reaches the driver. */
  def fromColumn(df: DataFrame, key: String, fpp: Double = 0.01): Filter = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    val keyed = df.select(col(key).cast("long").as("k")).na.drop()
    val n = keyed.agg(approx_count_distinct(col("k")))
      .head.getLong(0)
    val (words, k) = sizing(n, fpp)
    val bytes = keyed.select(Shim.column(
        BloomBuildAgg(Shim.expression(col("k")), words, k)
          .toAggregateExpression()))
      .head.getAs[Array[Byte]](0)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val bits = new Array[Long](words)
    var i = 0
    while (i < words) { bits(i) = buf.getLong(); i += 1 }
    new Filter(bits, k)
  }

  /** `bloom_might_contain(keyCol)` — codegen'd membership probe. */
  def might_contain(key: Column, f: Filter): Column =
    Shim.column(BloomMightContain(Shim.expression(key), f))
}

/** Distributed Bloom-filter build: each partition folds its keys into a
  * local bit array, partial buffers OR together (commutative +
  * idempotent, so merge order and task retries are harmless), and only
  * the final `words·8`-byte array crosses to the driver. The
  * executor-side twin of [[GraftBloom.create]]. */
case class BloomBuildAgg(
    child: Expression,
    words: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(words > 0 && (words & (words - 1)) == 0, "words must be a power of two")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects a bigint key, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
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
