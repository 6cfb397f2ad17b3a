package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning) quantile sketch.
  *
  * Why another quantile path next to `percentile`/`approx_percentile`:
  * the t-digest buffer is O(compression) per GROUP, mergeable
  * associatively at every partial-aggregation level, and keeps relative
  * accuracy highest at the tails (cluster size bound
  * 4·N·q·(1−q)/δ → singletons at q→0,1) — the sketch you actually run
  * per-merchant over 100 TB where exact sort-based percentile is
  * unaffordable and GK digests lose the tails.
  *
  * Accuracy, not bit-equality, is the contract (merge order shifts
  * centroid means a little), so harness queries emit within-tolerance
  * verdicts against the exact percentile — hash-checkable the same way
  * as the HLL/approx_percentile sketches.
  */
class TDigestBuf(val compression: Int) extends Serializable {
  // (mean, weight) centroids; unsorted tail of pending raw points
  val centroids: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
  var pending: ArrayBuffer[Double] = ArrayBuffer.empty

  def add(x: Double): Unit = {
    pending += x
    if (pending.length >= 4 * compression) compress()
  }

  def absorb(other: TDigestBuf): Unit = {
    centroids ++= other.centroids
    pending ++= other.pending
    compress()
  }

  /** k1 scale function: k(q) = δ/(2π)·asin(2q−1). A cluster may span at
    * most one k-unit, so centroid count ≤ ~δ/2 + 2 (k's range is δ/2)
    * and cluster size → 1 at the tails (asin's slope diverges at q=0,1)
    * — the relative-tail-accuracy property t-digest is chosen for. */
  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  def compress(): Unit = {
    if (pending.nonEmpty || centroids.length > compression + 2) {
      val all = (centroids ++ pending.map(x => (x, 1L))).sortBy(_._1)
      centroids.clear(); pending.clear()
      val total = all.iterator.map(_._2).sum.toDouble
      var accMean = all.head._1
      var accW = all.head._2
      var qLeft = 0.0 // quantile at the start of the accumulating cluster
      var kLeft = kScale(0.0)
      all.iterator.drop(1).foreach { case (mean, w) =>
        val proposed = accW + w
        if (kScale(qLeft + proposed / total) - kLeft <= 1.0) {
          accMean += (mean - accMean) * w / proposed
          accW = proposed
        } else {
          centroids += ((accMean, accW))
          qLeft += accW / total
          kLeft = kScale(qLeft)
          accMean = mean; accW = w
        }
      }
      centroids += ((accMean, accW))
    }
  }

  /** Interpolated quantile across centroid midpoints. */
  def quantile(q: Double): Double = {
    compress()
    if (centroids.isEmpty) return Double.NaN
    val total = centroids.iterator.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0.0
    var prevMid = Double.NaN
    var prevMean = centroids.head._1
    var i = 0
    while (i < centroids.length) {
      val (mean, w) = centroids(i)
      val mid = cum + w / 2.0
      if (target <= mid) {
        return if (prevMid.isNaN || mid == prevMid) mean
        else prevMean + (mean - prevMean) * (target - prevMid) / (mid - prevMid)
      }
      cum += w; prevMid = mid; prevMean = mean; i += 1
    }
    centroids.last._1
  }
}

/** `t_digest_quantiles(col, percentiles, compression)` →
  * array<double> of estimates. */
case class TDigestQuantiles(
    child: Expression,
    percentiles: Seq[Double],
    compression: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  require(compression >= 20, "t_digest compression must be >= 20")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1))

  // any numeric input is accepted and widened per-value in update();
  // non-numeric misuse fails at analysis time, not with a runtime
  // ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"t_digest_quantiles expects a numeric column, got ${dt.sql}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buf: TDigestBuf, input: InternalRow): TDigestBuf = {
    child.eval(input) match {
      case null       => ()
      case d: Double  => buf.add(d)
      case f: Float   => buf.add(f.toDouble)
      case l: Long    => buf.add(l.toDouble)
      case i: Int     => buf.add(i.toDouble)
      case s: Short   => buf.add(s.toDouble)
      case b: Byte    => buf.add(b.toDouble)
      case d: Decimal => buf.add(d.toDouble)
      case v => throw new IllegalStateException(
        s"t_digest_quantiles: unexpected input ${v.getClass}")
    }
    buf
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = { a.absorb(b); a }

  override def eval(buf: TDigestBuf): Any =
    new GenericArrayData(percentiles.map(buf.quantile).toArray[Any])

  override def serialize(buf: TDigestBuf): Array[Byte] = {
    buf.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.centroids.length)
    buf.centroids.foreach { case (m, w) => out.writeDouble(m); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.centroids += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren.head)
}

object TDigest {
  /** Column API: t-digest quantile estimates of a double column. */
  def t_digest_quantiles(c: Column, percentiles: Seq[Double],
      compression: Int = 200): Column =
    Shim.column(TDigestQuantiles(Shim.expression(c), percentiles, compression)
      .toAggregateExpression())
}
