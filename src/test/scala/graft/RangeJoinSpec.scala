package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("band join ≡ plain inequality join, radius boundary inclusive") {
    import spark.implicits._
    // gaps exactly at, under and over the radius; cross-user no-match
    val rows = Seq(
      (1L, 10L, 1000000L), (1L, 11L, 1000000L + 500), (1L, 12L, 2000000L),
      (1L, 13L, 999999999L), (2L, 20L, 1000100L), (3L, 30L, 0L))
    val df = rows.toDF("user_id", "event_id", "t")
    val radius = 1000000L
    val a = df.select(col("user_id"), col("event_id").as("event_a"),
      col("t").as("t_a"))
    val b = df.select(col("user_id"), col("event_id").as("event_b"),
      col("t").as("t_b"))
    val banded = RangeJoin.bandJoin(a, b, "user_id", col("t_a"), col("t_b"), radius)
      .filter(col("event_a") < col("event_b"))
      .select("user_id", "event_a", "event_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = df.as("x").join(df.as("y"),
        col("x.user_id") === col("y.user_id") &&
        col("x.event_id") < col("y.event_id") &&
        abs(col("x.t") - col("y.t")) <= radius)
      .select(col("x.user_id"), col("x.event_id"), col("y.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == plain)
    // exact-radius pair present (inclusive), over-radius absent
    assert(banded.contains((1L, 10L, 12L)))
    assert(!banded.contains((1L, 12L, 13L)))
  }

  test("banded plan is an equi join, never a nested loop") {
    val p = org.apache.spark.sql.graftshim.Shim.executedPlan(
      RangeJoin.eventPairsWithin(spark, sf)).toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }
}
