package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN — the whole-operator custom-plan path (SURVEY.md §7
  * stretch; build-spec preference order (c): `LogicalPlan` + `Strategy`
  * + `SparkPlan`).
  *
  * Semantics (left as-of join): for every left row, attach the single
  * right row with the same key and — backward direction — the greatest
  * right_time ≤ left_time, or — `forward = true` — the smallest
  * right_time ≥ left_time (optionally within `toleranceMicros`);
  * null-extend when none. Equivalent to DuckDB's `ASOF LEFT JOIN` with
  * `l.t >= r.t` / `l.t <= r.t` (the oracles) and the point-in-time join
  * every event/feature pipeline needs — Spark has no built-in form; the
  * window/union emulation needs two shuffles of the combined tables
  * plus a window pass.
  *
  * Physical design: both sides hash-cluster on the key (one shuffle
  * each — EnsureRequirements inserts the exchanges/sorts from
  * requiredChildDistribution/Ordering exactly like sort-merge join) and
  * sort within partitions by (key, time); a single forward merge pass
  * per partition emits matches — O(n log n) shuffle-bound, no state
  * beyond one candidate row, skew-safe in the same way SMJ is.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces; codegen'd projections must be
    // instantiated inside the partition closure (not serializable)
    val keyTypes = leftKeys.map(_.dataType)
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    val numRightFields = right.output.length
    val tol = toleranceMicros
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val outProj = UnsafeProjection.create(allOut.map(a => a: Expression), allOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(numRightFields)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // candidate: latest right row (key, time, row) with time <= current left time
      var candKey: InternalRow = null
      var candTime: Long = 0L
      var candRow: InternalRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        // SQL semantics: NULL keys/times never match (null-extend) —
        // without the guard the natural ordering treats NULL == NULL
        if (lKey.anyNull || lTimeRow.isNullAt(0)) {
          outProj(joined(lRow, nullRight))
        } else if (forward) {
          // forward: match the FIRST right row at (lKey, time >= lTime).
          // Advance strictly below the probe point and peek — the head
          // is NOT consumed (later left rows may match the same row);
          // left ascends in (key, time), so the advance is monotone.
          val lTime = lTimeRow.getLong(0)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (rKey.anyNull || rTimeProj(rBuf.head).isNullAt(0)) { rBuf.next() }
            else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0 ||
                  (cmp == 0 && rTimeProj(rBuf.head).getLong(0) < lTime))
                rBuf.next()
              else advancing = false
            }
          }
          val ok = rBuf.hasNext && {
            val rKey = rKeyProj(rBuf.head)
            !rKey.anyNull && keyOrd.compare(rKey, lKey) == 0 &&
              !rTimeProj(rBuf.head).isNullAt(0) &&
              tol.forall(t => rTimeProj(rBuf.head).getLong(0) - lTime <= t)
          }
          outProj(joined(lRow, if (ok) rBuf.head else nullRight))
        } else {
          val lTime = lTimeRow.getLong(0)
          // drop candidate from a previous key group
          if (candRow != null && keyOrd.compare(candKey, lKey) != 0) { candRow = null }
          // advance right side up to (lKey, lTime); null right keys/times
          // sort first (ascending nulls-first) and are skipped
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (rKey.anyNull || rTimeProj(rBuf.head).isNullAt(0)) { rBuf.next() }
            else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) { rBuf.next() } // behind our key: skip
              else if (cmp == 0 && rTimeProj(rBuf.head).getLong(0) <= lTime) {
                val r = rBuf.next()
                candKey = lKey.copy(); candTime = rTimeProj(r).getLong(0)
                candRow = r.copy()
              } else { advancing = false }
            }
          }
          val ok = candRow != null && keyOrd.compare(candKey, lKey) == 0 &&
            tol.forall(t => lTime - candTime <= t)
          outProj(joined(lRow, if (ok) candRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd) :: Nil
    case _ => Nil
  }
}

/** Column-level API: `AsOf.join(events, orders, ...)`. */
object AsOf {
  /** Left as-of join (backward by default; `forward = true` matches the
    * next right row instead of the previous). `leftTime`/`rightTime`
    * must be LongType (e.g. `unix_micros(ts)`) — the API enforces the
    * cast contract up front so the merge compares primitive longs. */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, leftTime: Column, rightTime: Column,
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    }
    val lt = Shim.expression(leftTime)
    val rt = Shim.expression(rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      "as-of time columns must be LongType (use unix_micros)")
    val node = AsOfJoin(Shim.analyzed(left), Shim.analyzed(right),
      Seq(Shim.expression(leftKey)), Seq(Shim.expression(rightKey)),
      lt, rt, toleranceMicros, forward)
    Shim.ofRows(spark, node)
  }
}
