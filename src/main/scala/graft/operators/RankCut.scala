package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ONE "top-k per group by (score DESC, id ASC)" cut, window-free
  * at corpus scale — shared by [[TextAnalysis.qualityQuantileFilter]]
  * (keep the top keep-fraction per language) and
  * [[Similarity.densityPrune]] (drop the top frac densest per
  * cluster), so the two can never re-diverge into the per-group
  * `row_number` shape this exists to kill.
  *
  * Why not a window: scores here are 6dp-rounded derived ratios, so a
  * degenerate corpus (boilerplate docs, one mega-cluster of duplicate
  * embeddings — exactly what the saturation alarms flag) collapses a
  * whole group onto ONE score, and a per-group rank window becomes a
  * corpus-sized single task. A bottom-k heap is no better: the rank
  * bound k is data-dependent (a fraction of the group), so the heap
  * state itself is corpus-sized on that corpus.
  *
  * Shape instead (the [[Sampling.docPack]]/[[Sampling.stratifiedSplit]]
  * histogram-offset discipline):
  *   1. aggregate to (group, score) counts — bounded by groups ×
  *      distinct rounded scores (the 6dp rounding caps cardinality);
  *   2. one window over THAT table finds each group's threshold score
  *      and its tie quota for k = `kOf(group size)`;
  *   3. rows strictly above/below the threshold get their flag from a
  *      broadcast-joined comparison — no window;
  *   4. only threshold-TIED rows are ranked, inside (group,
  *      `id >> bucketShift`) windows — ids are unique longs, so a
  *      bucket holds ≤2^shift rows by construction, whatever the skew.
  *      A (group, bucket) histogram cumsum converts bucket-local ranks
  *      to group ranks: a tied row is kept iff its bucket offset plus
  *      its bucket-local rank fits the quota (r17: ONE ranked branch —
  *      the former wholeIn/wholeOut/boundary 3-way split computed the
  *      same predicate casewise and cost two extra scans+filters of
  *      the tied set per call; each ranked partition stays ≤2^shift
  *      rows, so ranking every tied bucket is the same O(tied) work
  *      the placement join already pays).
  * Like docPack: ids need not be dense, only monotone — raise
  * `bucketShift` if ids are sparse enough that the tie histogram
  * (≤ groups × max_id/2^shift rows over the TIE GROUP only) gets big.
  *
  * Returns `df`'s columns plus boolean `flagName` = "this row is in
  * its group's top k by (score DESC, id ASC)". Null-safe on the group
  * key (a null group is its own group, as in the window form and the
  * oracles' PARTITION BY); null scores are NEVER in the top — they
  * sort last (DESC NULLS LAST, both engines), and when `kOf(n)`
  * exceeds a group's non-null count, k clamps to it so every non-null
  * row is top and nulls still aren't. A raw `row_number` replay agrees
  * whenever k ≤ the non-null count — which every production caller
  * guarantees (keep/frac < 1, null-score rates far below 1−keep); the
  * PropertySpec replay encodes the precise contract. `kOf` maps a
  * group's TOTAL row count to its rank bound (null rows count toward
  * n, exactly as they count toward the window form's `count(*)`).
  */
object RankCut {
  def topFlag(df: DataFrame, grpCol: String, scoreCol: String,
      idCol: String, kOf: Column => Column, flagName: String,
      bucketShift: Int = 8): DataFrame = {
    val grp = col(grpCol); val score = col(scoreCol); val id = col(idCol)
    val wCum = Window.partitionBy(grpCol).orderBy(score.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // k is clamped to the group's NON-NULL score count: when kOf(n)
    // exceeds it (a group that is mostly null scores), the contract is
    // "every non-null row is top, nulls still aren't" — without the
    // clamp the threshold row would land on the null-score histogram
    // entry and the whole group would flag false (found by the RankCut
    // property test, unreachable through the real operators' corpora
    // where null rates sit far below 1−keep)
    val thr = df.groupBy(grpCol, scoreCol).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(grpCol)))
      .withColumn("nn", sum(when(score.isNotNull, col("cnt")))
        .over(Window.partitionBy(grpCol)))
      .withColumn("k", least(kOf(col("n")), col("nn")))
      .filter(score.isNotNull &&
        col("cum") >= col("k") && (col("cum") - col("cnt")) < col("k"))
      .select(grp.as("thr_grp"), score.as("thr_score"),
        (col("k") - (col("cum") - col("cnt"))).as("quota"))
    // left join: a group whose k lands on no (grp, score) row (k = 0)
    // has no threshold — all its rows flag false through the catch-all
    val joined = df.join(broadcast(thr), grp <=> col("thr_grp"), "left")
      .drop("thr_grp")
    // every non-tied row in one branch (r17: the former above/below
    // split cost an extra scan+filter of `joined` for the same rows):
    // strictly-above → true; everything else that isn't tied — below,
    // null score, null threshold (k = 0 group) — → false, via the
    // null-proof coalesce (a null score is neither > nor === any
    // threshold, and must not vanish from the output)
    val notTied = joined.filter(
        coalesce(score === col("thr_score"), lit(false)) === false)
      .withColumn(flagName, coalesce(score > col("thr_score"), lit(false)))
    val tied = joined.filter(score === col("thr_score"))
      .withColumn("db", shiftright(id, bucketShift))
    val wHist = Window.partitionBy(grpCol).orderBy("db")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = tied.groupBy(grpCol, "db").agg(count(lit(1)).as("bcnt"))
      .withColumn("before", coalesce(sum("bcnt").over(wHist), lit(0L)))
      .select(grp.as("o_grp"), col("db").as("o_db"), col("before"))
    // bucket-local rank + histogram offset = group rank among ties;
    // kept iff it fits the quota. Whole buckets inside (offset+rank
    // always ≤ quota) or outside (offset ≥ quota ⇒ offset+rank > quota)
    // the quota come out exactly as the former casewise branches did.
    val wBucket = Window.partitionBy(grpCol, "db").orderBy(idCol)
    val ranked = tied.join(broadcast(off),
        grp <=> col("o_grp") && col("db") === col("o_db"))
      .withColumn("trk", row_number().over(wBucket))
      .withColumn(flagName, col("before") + col("trk") <= col("quota"))
    val out = df.columns.map(col) :+ col(flagName)
    Seq(notTied, ranked)
      .map(_.select(out.toIndexedSeq: _*))
      .reduce(_.unionAll(_))
  }
}
