package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Aggregation surface. The reference only ever runs `COUNT(*)`
  * (SURVEY.md §2.4) — everything else here is the engine's own analytics
  * surface (the queries downstream ClickHouse consumers run over the
  * backfilled topics), built on Spark's hash aggregate.
  *
  * Oracle-parity discipline for doubles: floating-point SUM is
  * order-dependent, and Spark's partial-aggregation order differs run to
  * run — so every summed double is cast to an exact DECIMAL first, summed
  * exactly, and only the final scalar is cast back to double. The DuckDB
  * oracle does the same, so results hash-match bit-for-bit.
  */
object Aggregates {

  /** Exact-decimal sum of a 2-dp double column, returned as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1-shaped pricing summary over lineitem: grouped sums/avg/count
    * with map-side partial aggregation (one shuffle, 4 groups out). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc  = col("l_discount").cast("decimal(18,2)")
    val tax   = col("l_tax").cast("decimal(18,2)")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double")
          .as("sum_disc_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc) *
          (lit(1).cast("decimal(18,2)") + tax)).cast("double")
          .as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Exact distinct counts (the HLL variant lives in
    * [[approxDistinct]] with a self-check instead of an oracle). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("n_merchants"),
      countDistinct(col("o_orderstatus")).as("n_statuses"),
      count(lit(1)).as("n_rows"))

  /** E4: HLL++ `approx_count_distinct` — sketch-based cardinality at scale
    * (no shuffle of distinct values, constant memory per group). The
    * sketch value itself is engine-specific, so the oracle-visible output
    * is the exact count plus a within-±5% verdict on the sketch — the
    * oracle asserts the verdict is true, making the sketch's accuracy a
    * hash-checked contract instead of a rows-only smoke. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
      countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.05).as("approx_ok"))

  /** Running (cumulative) per-merchant amount over event time — window
    * frame `rowsBetween(unboundedPreceding, 0)`; decimal-exact running sum
    * so the prefix sums hash-match the oracle. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // timed source: the prefix is defined by event time
    Tables.loadTimedEvents(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select("user_id", "event_id", "ts", "value", "running_value")
      .orderBy("user_id", "event_id")
  }

  /** RANGE-framed event-time window: per-user sum of values within the
    * preceding hour INCLUSIVE of ties — the frame the ROWS variant
    * can't express (two events in the same microsecond both see each
    * other). Ordered on integer epoch-µs so the frame arithmetic is
    * exact and engine-independent; the decimal-sum discipline makes the
    * result order-independent. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("hour_sum",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select("user_id", "event_id", "ts_us", "value", "hour_sum")
      .orderBy("user_id", "event_id")
  }

  /** ROLLUP over (lang, source) on documents — grouping-set aggregation
    * (absent from the reference, SURVEY.md §2.7; free via Spark). */
  def rollupDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"), dsum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** Gap-based sessionization: a new session starts after >30 min of
    * user inactivity — `lag` + cumulative flag sum + grouped rollup, the
    * standard event-pipeline shape (two window passes over one
    * user-partitioned shuffle, then one hash aggregate). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // timed source: a null-ts event has no gap to its neighbors
    Tables.loadTimedEvents(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Grouped t-digest quantiles ([[graft.functions.TDigest]]) checked
    * within ±5% of the exact percentile per group — the mergeable
    * O(compression)-per-group sketch that replaces exact sort-based
    * percentiles at 100 TB (see the TDigest scaladoc for why its
    * accuracy concentrates at the tails). Verdict-boolean output keeps
    * it oracle-checkable despite merge-order wobble. */
  def tdigestQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        graft.functions.TDigest
          .t_digest_quantiles(col("o_totalprice"), Seq(0.5, 0.99)).as("td"),
        expr("percentile(o_totalprice, 0.5)").as("e50"),
        expr("percentile(o_totalprice, 0.99)").as("e99"))
      .select(col("o_orderstatus"),
        round(col("e50"), 4).as("exact_p50"),
        round(col("e99"), 4).as("exact_p99"),
        (abs(element_at(col("td"), 1) - col("e50")) / col("e50") <= 0.05)
          .as("td_p50_ok"),
        (abs(element_at(col("td"), 2) - col("e99")) / col("e99") <= 0.05)
          .as("td_p99_ok"))
      .orderBy("o_orderstatus")

  /** Tumbling event-time window aggregation in batch mode (`window()`),
    * the batch twin of the Structured Streaming path (§2.9 E7). */
  def eventsWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadTimedEvents(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    * event lands in exactly two overlapping windows. Spark's `window`
    * generator replicates the row per window BEFORE the aggregate (an
    * in-plan explode, no self-union), so the cost is 2× the tumbling
    * case, one shuffle. */
  def eventsHoppingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadTimedEvents(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** Hourly volume anomalies per event type: hours whose summed value
    * sits more than 2σ from that type's mean hour. Cross-engine float
    * discipline: the per-hour sums and the sum-of-squares are EXACT
    * decimal aggregates (order-independent); mean/σ/z convert to
    * double only at the end, through the same literal expression on
    * both engines, and z is rounded. Stats are per-type scalars
    * (5 rows) broadcast back onto the hourly table — no window, no
    * second scan of the raw events. */
  def anomalyHours(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.loadTimedEvents(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("hv"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(col("hv")).as("s1"),
        // square at decimal(18,2), not the sum's widened (28,2): the
        // (28,2)×(28,2) product's precision (57) silently truncates at
        // Spark's 38 cap while DuckDB widens differently — a latent
        // 4th-decimal z divergence at larger SFs. (18,2)² is (37,4),
        // exact under the cap on BOTH engines; ANSI mode turns a
        // genuinely overflowing hourly sum into a loud error, not a
        // silent drift (the oracle mirrors the cast)
        sum(col("hv").cast("decimal(18,2)") * col("hv").cast("decimal(18,2)"))
          .as("s2"))
      .select(col("event_type"), col("n_hours"),
        (col("s1").cast("double") / col("n_hours")).as("mean"),
        // greatest(0): constant hourly volumes make the one-pass
        // numerator a tiny NEGATIVE double (s2 - s1²/n ≈ -1e-19), and
        // sqrt of that is NaN here but a hard error in the oracle
        sqrt(greatest((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n_hours"))
          / (col("n_hours") - 1), lit(0.0d))).as("std"))
    hourly.join(broadcast(stats), "event_type")
      .select(col("ws"), col("event_type"), col("hv").cast("double").as("hv"),
        round((col("hv").cast("double") - col("mean")) / col("std"), 4).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 2.0)
      .orderBy("ws", "event_type")
  }

  /** Grouped statistical MOMENTS + correlation — the descriptive-stats
    * aggregate family (mean/stddev/corr) done the only way that is
    * hash-stable across engines AND across shuffle orders: every
    * aggregate is a DECIMAL(38,18)-exact moment sum (the per-row
    * double products are IEEE-deterministic, the decimal fold is
    * order-free), and the mean/stddev/corr scalars derive from those
    * sums in ONE double expression written with identical association
    * on both engines. The naive `stddev`/`corr` built-ins fold doubles
    * in partition order — same-engine re-runs can hash-differ, let
    * alone DuckDB vs Spark (the [[anomalyHours]] pattern, extended to
    * second cross-moments). One hash aggregate, map-side combined. */
  def numericMoments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    def dsum(c: org.apache.spark.sql.Column) =
      graft.functions.DecimalConv.decSum(c)
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sq"),
        dsum(col("l_extendedprice")).as("sp"),
        dsum(col("l_quantity") * col("l_quantity")).as("sqq"),
        dsum(col("l_extendedprice") * col("l_extendedprice")).as("spp"),
        dsum(col("l_quantity") * col("l_extendedprice")).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        round(col("sq") / col("n"), 6).as("mean_qty"),
        // n(n−1) casts each factor to double BEFORE the multiply: the
        // Long product silently wraps past 2^63 at n ≈ 3e9 (a 100 TB
        // lineitem group is ~1e11 rows); each factor is an exact count
        // < 2^53, so both engines do the same one IEEE multiply. The
        // n·sqq cross terms already promote to double per factor.
        round(sqrt((col("n") * col("sqq") - col("sq") * col("sq")) /
          (col("n").cast("double") * (col("n") - lit(1)).cast("double"))),
          6).as("stddev_qty"),
        round(col("sp") / col("n"), 6).as("mean_price"),
        round(sqrt((col("n") * col("spp") - col("sp") * col("sp")) /
          (col("n").cast("double") * (col("n") - lit(1)).cast("double"))),
          6).as("stddev_price"),
        round((col("n") * col("sqp") - col("sq") * col("sp")) /
          sqrt((col("n") * col("sqq") - col("sq") * col("sq")) *
            (col("n") * col("spp") - col("sp") * col("sp"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }
}
