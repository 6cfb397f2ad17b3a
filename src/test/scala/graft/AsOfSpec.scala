package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** The custom as-of join operator (LogicalPlan+Strategy+Exec). */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (1L, 100L), (1L, 200L), (1L, 50L),   // key 1 at t=100,200,50
      (2L, 500L),                           // key 2
      (3L, 10L)                             // key 3: no right rows
    ).toDF("k", "t")
    val right = Seq(
      (1L, 90L, "a"), (1L, 150L, "b"), (1L, 300L, "c"),
      (2L, 500L, "d"),                      // boundary: equal time matches
      (4L, 1L, "z")                         // key only on right
    ).toDF("k", "rt", "tag")
    (left, right)
  }

  test("as-of picks latest right row at or before left time") {
    val (l, r) = fixture
    val out = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"))
      .select(l("k"), l("t"), col("tag")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(out == Set(
      (1L, 100L, "a"),   // 90 <= 100 < 150
      (1L, 200L, "b"),   // 150 <= 200 < 300
      (1L, 50L, null),   // nothing at/before 50
      (2L, 500L, "d"),   // boundary inclusive
      (3L, 10L, null)))  // key absent on right
  }

  test("tolerance drops stale matches") {
    val (l, r) = fixture
    val out = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"),
        toleranceMicros = Some(20L))
      .select(l("k"), l("t"), col("tag")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(out == Set(
      (1L, 100L, "a"),   // gap 10 <= 20
      (1L, 200L, null),  // gap 50 > 20
      (1L, 50L, null),
      (2L, 500L, "d"),   // gap 0
      (3L, 10L, null)))
  }

  test("non-long time column is rejected up front") {
    val (l, r) = fixture
    val lBad = l.withColumn("t", col("t").cast("double"))
    intercept[IllegalArgumentException] {
      AsOf.join(spark, lBad, r, lBad("k"), r("k"), lBad("t"), r("rt"))
    }
  }
}
