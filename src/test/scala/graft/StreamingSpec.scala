package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingBackfill
import graft.operators.Aggregates

/** E7: the streaming path must agree with its batch twin on a finite
  * replay (SURVEY.md §7 M4). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming windowed counts == batch windowed counts") {
    val stream = StreamingBackfill.windowedCounts(
      StreamingBackfill.eventsStream(spark, sf))
    val got = StreamingBackfill.runToMemory(spark, stream, "wc_out")
      .select("ws", "event_type", "n", "sum_value")
    val want = Aggregates.eventsWindowAgg(spark, sf)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming quarantine split == batch quarantine split") {
    val got = StreamingBackfill.runToMemory(spark,
      StreamingBackfill.quarantineStream(
        StreamingBackfill.eventsStream(spark, sf)), "quar_out", "append")
    val want = graft.operators.SemiStructured.quarantineSplit(spark, sf)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // both routes are populated (the in-plan corruption is observable)
    assert(got.filter(col("status") === "quarantined").count() > 0)
    assert(got.filter(col("status") === "ok").count() > 0)
  }

  test("streaming dedup drops within-watermark duplicates") {
    val out = StreamingBackfill.runToMemory(spark,
      StreamingBackfill.dedupStream(StreamingBackfill.eventsStream(spark, sf)),
      "dedup_out", "append")
    assert(out.count() > 0)
    assert(out.count() <= Tables.load(spark, sf, "events").count())
  }

  test("streaming incremental dedup screens new docs against the corpus index") {
    val corpusBands = graft.operators.Dedup.minhashCappedBands(spark, sf)
      .filter(col("doc_id") % 10 =!= 0)
    val newStream = StreamingBackfill.documentsStream(spark, sf)
      .filter(col("doc_id") % 10 === 0)
    val cands = StreamingBackfill.runToMemory(spark,
      StreamingBackfill.incrementalDedupStream(newStream, corpusBands),
      "inc_dedup_out", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates orient new → corpus only (no corpus re-pairing at ingest)
    assert(cands.forall { case (n, c) => n % 10 == 0 && c % 10 != 0 })
    // no recall loss vs batch: every verified incremental pair was
    // surfaced as a stream candidate (also pins the per-row HOF-min
    // signature ≡ the batch explode+groupBy signature)
    val verified = graft.operators.Dedup.incrementalPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture has no cross-set near-dups")
    assert(verified.subsetOf(cands),
      s"missed candidates: ${verified.diff(cands)}")
  }

  test("stream-stream join pairs purchases with prior signups") {
    import org.apache.spark.sql.functions._
    val out = StreamingBackfill.runToMemory(spark,
      StreamingBackfill.purchaseAfterSignup(
        StreamingBackfill.eventsStream(spark, sf)),
      "ss_join_out", "append")
    assert(out.count() > 0)
    assert(out.filter(col("s_ts") > col("p_ts")).count() == 0)
    assert(out.filter(col("s_ts") < col("p_ts") - expr("INTERVAL 24 HOURS"))
      .count() == 0)
  }

  test("stream-static join enriches events with the dimension table") {
    import org.apache.spark.sql.functions._
    val out = StreamingBackfill.runToMemory(spark,
      StreamingBackfill.enrichWithDim(
        StreamingBackfill.eventsStream(spark, sf),
        Tables.load(spark, sf, "customer")), "enrich_out", "append")
    assert(out.count() == Tables.load(spark, sf, "events").count())
    // users that exist as customers must carry a name
    val custKeys = Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(out.filter(col("user_id").isin(custKeys.toSeq.map(_.asInstanceOf[Any]): _*)
      && col("c_name").isNull).count() == 0)
  }

  test("foreachBatch parquet sink writes idempotent per-batch dirs") {
    val out = java.nio.file.Files.createTempDirectory("fb").toString
    StreamingBackfill.runForeachBatchParquet(spark,
      StreamingBackfill.envelopeStream(
        StreamingBackfill.eventsStream(spark, sf)), out)
    val back = spark.read.parquet(out)
    assert(back.count() == Tables.load(spark, sf, "events").count())
    assert(back.columns.contains("batch_id"))
  }

  test("approx quantiles within 2% of exact") {
    val r = graft.operators.SqlInterface.approxQuantiles(spark, sf)
      .collect().head
    assert(r.getAs[Double]("exact_p50") > 0, s"$r p50")
    assert(r.getAs[Double]("exact_p99") >= r.getAs[Double]("exact_p50"), s"$r")
    assert(r.getAs[Boolean]("approx_p50_ok") && r.getAs[Boolean]("approx_p99_ok"), s"$r")
  }

  test("streaming envelope emits one keyed JSON event per row") {
    val env = StreamingBackfill.envelopeStream(
      StreamingBackfill.eventsStream(spark, sf))
    val got = StreamingBackfill.runToMemory(spark, env, "env_out", "append")
    assert(got.count() == Tables.load(spark, sf, "events").count())
    val r = got.limit(1).collect().head
    assert(r.getAs[String]("value").startsWith("{\"event_id\":"))
    assert(r.getAs[String]("tenant") == "public")
  }

  test("streaming session windows == batch session_window aggregation") {
    val stream = StreamingBackfill.sessionWindows(
      StreamingBackfill.eventsStream(spark, sf))
    val got = StreamingBackfill.runToMemory(spark, stream, "sess_out")
      .select("session_start", "session_end", "user_id", "n_events",
        "session_value")
    val want = Tables.load(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
