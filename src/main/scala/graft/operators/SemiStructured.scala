package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Semi-structured & reshaping surface: JSON extraction (the inverse of
  * the T3 envelope — `serde_json` round-trip in the reference,
  * `Cargo.toml:23`), pivot, and quantile statistics.
  */
object SemiStructured {

  /** Parse the events `props` JSON column with an explicit schema
    * (from_json — codegen'd Jackson parse, no UDF) and extract a field
    * both typed and via path. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_typed"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"))
      .orderBy("event_id")

  /** Pivot: docs count per lang × source — groupBy+pivot compiles to
    * one hash aggregate with conditional counts (values enumerated, so
    * no second pass). */
  def pivotLangSource(spark: SparkSession, dir: String): DataFrame = {
    val sources = (0 until 10).map(i => s"src$i")
    Tables.load(spark, dir, "documents")
      .withColumn("src", // fold the long tail so the pivot is bounded
        when(col("source").isin(sources.map(_.asInstanceOf[Any]): _*), col("source"))
          .otherwise(lit("other")))
      .groupBy("lang").pivot("src", sources :+ "other").count()
      .na.fill(0L)
      .orderBy("lang")
  }

  /** Exact percentiles (median/p90) of order amounts per status —
    * `percentile` with interpolation, matching DuckDB's quantile_cont. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(min(col("o_totalprice")), 4).as("p_min"),
        round(max(col("o_totalprice")), 4).as("p_max"))
      .orderBy("o_orderstatus")
}
