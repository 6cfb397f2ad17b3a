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

  /** The corpus LSH band index as a BUCKETED table — the production
    * shape of [[graft.operators.Dedup.incrementalPairs]]'s static side
    * at 100 TB: clustering the index on `band_key` once at write time
    * means each increment's probe join needs no exchange on the
    * (enormous) corpus side — only the new batch's bands shuffle into
    * the corpus's bucketing. Pays the clustering once per index
    * refresh, amortized over every nightly increment. Bucketed on BOTH
    * join keys — a subset bucketing gets discarded by the planner's
    * bucketed-scan chooser for a (band_id, band_key) join. */
  def writeBandIndexBucketed(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit =
    graft.operators.Dedup.minhashCappedBands(spark, dir)
      .write.mode("overwrite")
      .bucketBy(buckets, "band_id", "band_key").sortBy("band_id", "band_key")
      .saveAsTable("corpus_bands_bkt")

  /** New-batch bands probing the bucketed corpus index: the increment's
    * candidate join with the corpus side exchange-free
    * (BucketingSpec asserts ≤ 1 exchange, on the new side only). */
  def incrementalProbeColocated(spark: SparkSession,
      newBands: DataFrame): DataFrame = {
    val corpus = spark.table("corpus_bands_bkt")
    newBands.hint("merge")
      .join(corpus.withColumnRenamed("doc_id", "corpus_id"),
        Seq("band_id", "band_key"))
      .select("doc_id", "corpus_id")
  }
}
