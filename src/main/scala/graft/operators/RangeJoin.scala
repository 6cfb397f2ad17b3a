package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Banded (bucketed) range join — the scale pattern for
  * `a.key = b.key AND |a.t − b.t| <= radius` predicates, which Spark
  * would otherwise execute as a per-key nested loop inside the equi
  * join (fine) or, with no equi key at all, a full cartesian (fatal at
  * 100 TB).
  *
  * Both sides bucket time by `width = radius`; the probe side lands in
  * one bucket, the build side replicates into the 3 adjacent buckets
  * (bucket ± 1 — any pair within `radius` must share one of them).
  * The join becomes a plain equi join on (key, bucket) — one shuffle,
  * partitionable, AQE-skew-splittable — followed by the exact range
  * filter. Replication factor is a constant 3, independent of data
  * volume or radius.
  */
object RangeJoin {

  /** Pairs with equal `key` and |leftT − rightT| <= radius (both time
    * columns in µs). Returns left ⋈ right with all columns of both
    * sides; callers project. */
  def bandJoin(left: DataFrame, right: DataFrame,
      key: String, leftT: Column, rightT: Column, radiusUs: Long): DataFrame = {
    val l = left.withColumn("_bucket", floor(leftT / lit(radiusUs)))
    val r = right
      .withColumn("_rt", rightT)
      .withColumn("_bucket",
        explode(array(Seq(-1, 0, 1).map(d =>
          floor(rightT / lit(radiusUs)) + lit(d.toLong)): _*)))
    l.join(r, Seq(key, "_bucket"))
      .filter(abs(leftT - col("_rt")) <= radiusUs)
      .drop("_bucket", "_rt")
  }

  /** Harness face: same-user event pairs within 30 minutes (the
    * co-session pair set — what a feature pipeline joins to build
    * "events near this event" context). The oracle is the plain
    * inequality join; the band construction only changes the plan,
    * never the result. */
  def eventPairsWithin(spark: SparkSession, dir: String,
      radiusUs: Long = 30L * 60 * 1000000): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val a = ev.select(col("user_id"), col("event_id").as("event_a"),
      unix_micros(col("ts")).as("t_a"))
    val b = ev.select(col("user_id"), col("event_id").as("event_b"),
      unix_micros(col("ts")).as("t_b"))
    bandJoin(a, b, "user_id", col("t_a"), col("t_b"), radiusUs)
      .filter(col("event_a") < col("event_b"))
      .select(col("user_id"), col("event_a"), col("event_b"),
        abs(col("t_a") - col("t_b")).as("gap_us"))
      .orderBy("user_id", "event_a", "event_b")
  }
}
