package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventAnalytics, Fuzzy}

/** Funnel/cohort/path analytics + fuzzy matching: structural invariants
  * (exact values are oracle-checked in the driver gate). */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel stages shrink monotonically, rates in (0,1]") {
    val r = EventAnalytics.funnelConversion(spark, TestSpark.sf).collect().head
    val (users, s1, s2, s3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= s1 && s1 >= s2 && s2 >= s3 && s3 > 0)
    Seq(4, 5, 6).foreach { i =>
      assert(r.getDouble(i) > 0.0 && r.getDouble(i) <= 1.0)
    }
  }

  test("cohort retention: Monday cohorts, non-negative offsets, active users") {
    val rows = EventAnalytics.cohortRetention(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getTimestamp(0).toLocalDateTime.getDayOfWeek
      assert(day === java.time.DayOfWeek.MONDAY)
      assert(r.getLong(1) >= 0L && r.getLong(2) > 0L)
    }
  }

  test("event paths: top-k ordered by count, non-empty path strings") {
    val rows = EventAnalytics.eventPaths(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getString(0).nonEmpty))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse)
  }

  test("timed-events contract: null-ts events are excluded from every " +
      "time-axis operator, kept by timeless ones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evnull").toString
    // user 1: two timed events 40 min apart (2 sessions) + one null-ts
    // event that must influence NOTHING time-keyed
    Seq(
      (0L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), 1L,
        "view", 1.0, """{"k": 1}"""),
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:40:00")), 1L,
        "view", 2.0, """{"k": 2}"""),
      (2L, None, 1L, "view", 100.0, """{"k": 3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sess = operators.Aggregates.sessionize(spark, dir).collect()
    assert(sess.length == 2, "null-ts event must not open/shift a session")
    assert(sess.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 1L))
    val agg = operators.Aggregates.eventsWindowAgg(spark, dir).collect()
    assert(agg.map(_.getAs[Double]("sum_value")).sum == 3.0,
      "null-ts value leaked into a time bucket")
    val keep = operators.Dedup.exactByKey(spark, dir).collect()
    assert(keep.length == 1 && keep.head.getAs[Long]("event_id") == 0L,
      "earliest-by-time keeper must come from timed rows only")
    // timeless ops still see the row: quarantine routes all three
    // (event 0 is % 37 = 0, so its payload gets the corruption prefix
    // and is RIGHTLY quarantined; the null-ts row routes 'ok')
    val q = operators.SemiStructured.quarantineSplit(spark, dir).collect()
    assert(q.length == 3)
    assert(q.map(_.getAs[String]("status")).toSeq ==
      Seq("quarantined", "ok", "ok"))
  }

  test("fuzzy match recovers every probe's source row within distance 1") {
    import org.apache.spark.sql.functions.{col, length}
    val rows = Fuzzy.fuzzyMatch(spark, TestSpark.sf).collect()
    val probes = rows.map(_.getLong(0)).distinct
    // EVERY eligible probe key must appear — recall is total, not just
    // over the probes some block happened to keep
    val expected = Tables.load(spark, TestSpark.sf, "part")
      .filter(length(col("p_name")) >= 4 && col("p_partkey") % 40 === 0)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(probes.toSet === expected && probes.nonEmpty)
    // the typo'd name must match its own original inside some block
    probes.foreach { pk =>
      val self = rows.filter(r => r.getLong(0) == pk && r.getLong(2) == pk)
      assert(self.length === 1 && self.head.getLong(4) <= 1L)
    }
    assert(rows.forall(_.getLong(4) <= 1L))
    // typos now land ANYWHERE: at least one probe's corruption hits the
    // 2-char blocking prefix (the case the old single-pass block missed
    // by construction) — and the suffix pass still recovered it above
    val prefixHit = rows.exists { r =>
      r.getLong(0) == r.getLong(2) &&
        r.getString(1).take(2) != r.getString(3).take(2)
    }
    assert(prefixHit, "no probe exercises the prefix-corruption path")
  }
}
