package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-funnel / cohort / path analytics over the events stream — the
  * product-analytics query family an events warehouse serves (the
  * reference's events land in ClickHouse for exactly these shapes,
  * SURVEY §2.1 S6). All three are hash-aggregate pipelines keyed on
  * user_id — after the first shuffle the chain stays co-partitioned, so
  * at 100 TB each op costs one key shuffle plus small-table joins.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: signup → later view → later purchase.
    * Each stage is a conditional min-timestamp aggregate joined back to
    * the stream, so stage N only counts events AFTER the user cleared
    * stage N-1 (the classic "ordered funnel" semantic, not mere
    * presence). Emits one row: stage populations + conversion rates. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_signup"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("ts") > col("t_signup"))
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    ev.agg(countDistinct("user_id").as("n_users"))
      .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_signup"))))
      .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_view_after"))))
      .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_purchase_after"))))
      .select(col("n_users"), col("n_signup"), col("n_view_after"),
        col("n_purchase_after"),
        round(col("n_signup").cast("double") / col("n_users"), 6)
          .as("signup_rate"),
        round(col("n_view_after").cast("double") / col("n_signup"), 6)
          .as("view_rate"),
        round(col("n_purchase_after").cast("double") / col("n_view_after"), 6)
          .as("purchase_rate"))
  }

  /** Weekly cohort retention: users cohorted by the ISO week of their
    * first signup; each (cohort, week-offset) cell counts distinct
    * users active that many weeks later. The activity set is
    * `distinct (user, week)` — one dedup shuffle — joined to the
    * (small) cohort map. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("first_signup"))
      .select(col("user_id"),
        date_trunc("week", col("first_signup")).as("cohort_week"))
    val activity = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    cohort.join(activity, "user_id")
      .withColumn("week_offset",
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("long"))
      .filter(col("week_offset") >= 0)
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Top daily event-type paths: each (user, day)'s events in (ts,
    * event_id) order collapse to a `a>b>c` path string (collect + one
    * in-row sort — state is one day of one user's events, bounded by
    * construction), then one count aggregate over paths. The LLM-corpus
    * cousin is "user interaction sequences as training documents". */
  def eventPaths(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(col("evs"), e => e.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_user_days"))
      .orderBy(col("n_user_days").desc, col("path"))
      .limit(topK)
}
