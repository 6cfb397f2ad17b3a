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

  test("forward direction picks the first right row at or after left time") {
    val (l, r) = fixture
    val out = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"),
        forward = true)
      .select(l("k"), l("t"), col("tag")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(out == Set(
      (1L, 100L, "b"),   // next at/after 100 is 150
      (1L, 200L, "c"),   // next at/after 200 is 300
      (1L, 50L, "a"),    // next at/after 50 is 90
      (2L, 500L, "d"),   // boundary inclusive
      (3L, 10L, null)))  // key absent on right
  }

  test("forward tolerance drops matches too far ahead") {
    val (l, r) = fixture
    val out = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"),
        toleranceMicros = Some(60L), forward = true)
      .select(l("k"), l("t"), col("tag")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(out == Set(
      (1L, 100L, "b"),   // 150 - 100 = 50 <= 60
      (1L, 200L, null),  // 300 - 200 = 100 > 60
      (1L, 50L, "a"),    // 90 - 50 = 40 <= 60
      (2L, 500L, "d"),   // exact match, 0 <= 60
      (3L, 10L, null)))
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

  test("left-only filters push through the as-of join into the scan") {
    val (l, r) = fixture
    val joined = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"))
      .filter(col("t") > 100L)
    val optimized = org.apache.spark.sql.graftshim.Shim.optimized(joined)
    // the Filter must sit BELOW the AsOfJoin after optimization
    val asof = optimized.collectFirst {
      case j: graft.plans.AsOfJoin => j }.get
    val filterBelow = asof.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
    assert(filterBelow.nonEmpty, s"filter not pushed:\n$optimized")
    assert(optimized match {
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => false
      case _ => true
    }, "filter left above the join")
    // and results agree with filter-before-join semantics
    val expect = AsOf.join(spark, l.filter(col("t") > 100L), r,
      l("k"), r("k"), l("t"), r("rt")).collect().toSet
    assert(joined.collect().toSet == expect)
  }

  test("bottom_k aggregate: deterministic k-smallest across partitions") {
    import spark.implicits._
    import graft.functions.BottomK.bottom_k
    val df = (1L to 1000L).map(i => (i % 3, f"h$i%04d", i)).toDF("g", "h", "id")
      .repartition(7) // force multi-partition partial aggregation + merge
    val out = df.groupBy("g")
      .agg(bottom_k(struct(col("h").as("sort_key"), col("id").as("id")), 4).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.sort_key"), col("e.id")).collect()
      .groupBy(_.getLong(0))
    (0L to 2L).foreach { g =>
      val got = out(g).map(_.getString(1)).toList
      val want = (1L to 1000L).filter(_ % 3 == g).map(i => f"h$i%04d")
        .sorted.take(4).toList
      assert(got == want, s"group $g")
    }
  }

  test("null keys and null times never match (SQL semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(90L), "a"), (None, Some(1L), "n"),
      (Some(1L), None, "tnull")).toDF("k", "rt", "tag")
    val out = AsOf.join(spark, l, r, l("k"), r("k"), l("t"), r("rt"))
      .select(l("k"), l("t"), col("tag")).collect()
      .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        x.getString(2))).toSet
    assert(out == Set(
      (1L, 100L, "a"),  // normal match; null-time right row skipped
      (-1L, 100L, null), // null left key → null-extended
      (1L, -1L, null)))  // null left time → null-extended
  }

  test("non-long time column is rejected up front") {
    val (l, r) = fixture
    val lBad = l.withColumn("t", col("t").cast("double"))
    intercept[IllegalArgumentException] {
      AsOf.join(spark, lBad, r, lBad("k"), r("k"), lBad("t"), r("rt"))
    }
  }
}
