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
