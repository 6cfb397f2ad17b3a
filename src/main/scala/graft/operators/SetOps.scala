package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY.md §2.7 — categories the reference lacks entirely, exposed as
  * first-class engine surface via Spark built-ins: set operations,
  * grouping-set/cube aggregation, the window-function family, and T6 id
  * validation. Each query is oracle-checked.
  */
object SetOps {

  /** INTERSECT / EXCEPT over merchant key sets: merchants active in
    * 1996 vs 1997 (set semantics — dedup built in). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    def active(y: Int) = orders
      .filter(year(col("o_orderdate")) === y).select("o_custkey")
    val both = active(1996).intersect(active(1997))
      .withColumn("set_op", lit("both"))
    val only96 = active(1996).except(active(1997))
      .withColumn("set_op", lit("only_1996"))
    both.unionAll(only96).orderBy("set_op", "o_custkey")
  }

  /** CUBE over (status, priority): all 2^2 grouping combinations in one
    * pass (partial-aggregated, single shuffle). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** The window-function family over event streams: lag/lead (peer
    * rows), rank/dense_rank (ties), ntile (quartiles) — one
    * user-partitioned sort, five functions sharing the frame. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wv = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    // timed source: lag/lead walk the event-TIME order
    Tables.loadTimedEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        rank().over(wv).cast("long").as("value_rank"),
        dense_rank().over(wv).cast("long").as("value_dense_rank"),
        ntile(4).over(wv).cast("long").as("value_quartile"))
      .orderBy("user_id", "event_id")
  }

  /** Distribution window functions — percent_rank and cume_dist per
    * user over value (the remaining members of the rank family;
    * deterministic under the (value desc, event_id) total order, and
    * their divisions use identical integer operands on both engines so
    * the doubles are bit-equal). */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val wv = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        percent_rank().over(wv).as("value_pct_rank"),
        cume_dist().over(wv).as("value_cume_dist"))
      .orderBy("user_id", "event_id")
  }

  /** T6 — id validation (`MerchantId::wrap`, reference `main.rs:198-203`):
    * regex-shape check + range check as a validity column, invalid rows
    * quarantined with a reason (the engine's answer to wrap-or-error). */
  def idValidation(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") < 0, lit("negative_id"))
          .when(not(col("c_name").rlike("^[A-Za-z0-9#_ -]+$")), lit("bad_name_charset"))
          .otherwise(lit("ok")).as("validity"))
      .orderBy("c_custkey")
}
