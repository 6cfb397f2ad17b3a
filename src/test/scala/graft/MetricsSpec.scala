package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Backfill, RunMetrics}

/** X7 observability: task-level metrics fold into pollable counters. */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("instrumented backfill run reports rows read and tasks, no failures") {
    val (n, m) = RunMetrics.instrument(spark) {
      Backfill.run(spark, sf).count()
    }
    assert(n > 0)
    assert(m.jobs >= 1 && m.failedJobs == 0)
    assert(m.tasks >= 1 && m.failedTasks == 0)
    // the feed scanned at least its own row count from parquet
    assert(m.inputRecords >= n, s"inputRecords=${m.inputRecords} feed=$n")
    assert(m.inputBytes > 0)
    assert(m.render.contains("failed"))
  }

  test("listener is removed after the run (no counters tick afterwards)") {
    import org.apache.spark.sql.graftshim.Shim
    val l = new RunMetrics
    spark.sparkContext.addSparkListener(l)
    Tables.load(spark, sf, "orders").count()
    Shim.drainListenerBus(spark)
    spark.sparkContext.removeSparkListener(l)
    val frozen = l.snapshot()
    assert(frozen.tasks >= 1)
    Tables.load(spark, sf, "orders").count() // after removal
    Shim.drainListenerBus(spark)
    assert(l.snapshot() == frozen)
  }
}
