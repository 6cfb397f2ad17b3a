package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins —
  * the 100 TB answer to repeatedly joining entity tables on the same key
  * (merchant_id in the reference): pay the clustering once at write
  * time, then every subsequent join on the bucket key needs NO exchange
  * on either side (BucketingSpec asserts the plan is exchange-free).
  */
object Bucketing {

  /** Write both sides bucketed+sorted on the join key into the session
    * catalog (native data-source tables — no Hive needed). */
  def writeBucketed(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    Tables.load(spark, dir, "orders").write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.load(spark, dir, "customer").write.mode("overwrite")
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
  }

  /** Join the bucketed tables: sort-merge (hinted past the broadcast
    * chooser to show the bucketing effect) with zero exchanges. */
  def colocatedJoin(spark: SparkSession): DataFrame = {
    val o = spark.table("orders_bkt")
    val c = spark.table("customer_bkt")
    o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), o("o_custkey"), c("c_name"), o("o_totalprice"))
  }
}
