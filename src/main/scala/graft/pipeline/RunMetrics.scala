package graft.pipeline

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.Success
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.Shim

/** X7 — run observability (reference progress bars + background metrics
  * thread: `lib.rs:9-13`, `main.rs:92-94,184-188`; per-entity bars
  * `payment_intent.rs:44-57`).
  *
  * Spark-first shape: the reference ticks a progress bar per ROW on the
  * hot path; here metrics arrive per completed TASK on the async
  * listener bus — zero per-row cost, still live enough for a progress
  * thread to poll `snapshot()` the way the reference's metrics thread
  * polls its counters. Counters are LongAdders (listener events fire on
  * the bus thread concurrently with pollers).
  */
final class RunMetrics extends SparkListener {
  private val jobs = new LongAdder
  private val failedJobs = new LongAdder
  private val tasks = new LongAdder
  private val failedTasks = new LongAdder
  private val inputRecords = new LongAdder
  private val inputBytes = new LongAdder
  private val outputRecords = new LongAdder
  private val outputBytes = new LongAdder
  private val shuffleWriteBytes = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    if (e.reason != Success) failedTasks.increment()
    val m = e.taskMetrics
    if (m != null) {
      inputRecords.add(m.inputMetrics.recordsRead)
      inputBytes.add(m.inputMetrics.bytesRead)
      // output counts only SUCCESSFUL attempts: a failed write task's
      // partial files are rolled back by the file committer, so folding
      // them in would overstate durably-written rows (input/shuffle stay
      // all-attempts — they measure work done, not state committed)
      if (e.reason == Success) {
        outputRecords.add(m.outputMetrics.recordsWritten)
        outputBytes.add(m.outputMetrics.bytesWritten)
      }
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    jobs.increment()
    if (!e.jobResult.toString.contains("JobSucceeded")) failedJobs.increment()
  }

  def snapshot(): RunMetrics.Snapshot = RunMetrics.Snapshot(
    jobs = jobs.sum(), failedJobs = failedJobs.sum(),
    tasks = tasks.sum(), failedTasks = failedTasks.sum(),
    inputRecords = inputRecords.sum(), inputBytes = inputBytes.sum(),
    outputRecords = outputRecords.sum(), outputBytes = outputBytes.sum(),
    shuffleWriteBytes = shuffleWriteBytes.sum())
}

object RunMetrics {

  /** Point-in-time counters; `render` is the log/progress line. */
  final case class Snapshot(
      jobs: Long, failedJobs: Long, tasks: Long, failedTasks: Long,
      inputRecords: Long, inputBytes: Long,
      outputRecords: Long, outputBytes: Long,
      shuffleWriteBytes: Long) {
    def render: String =
      s"jobs=$jobs($failedJobs failed) tasks=$tasks($failedTasks failed) " +
        s"in=$inputRecords rows/$inputBytes B out=$outputRecords rows/" +
        s"$outputBytes B shuffleWrite=$shuffleWriteBytes B"
  }

  /** Run `body` under a freshly-registered listener and return its
    * result with the metrics it generated. The bus is drained before
    * the snapshot so nothing in-flight is missed, and the listener is
    * always removed (metrics collection never outlives the run). */
  def instrument[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val l = new RunMetrics
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Shim.drainListenerBus(spark)
      (r, l.snapshot())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
