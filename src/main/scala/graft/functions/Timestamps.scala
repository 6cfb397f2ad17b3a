package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T4 — multi-format datetime parsing, re-expressing the reference's
  * fallback chain (`src/utility.rs:6-30`): try `%Y-%m-%d %H:%M:%S%.f`,
  * then `%Y-%m-%d %H:%M:%S`, then date-only → midnight.
  *
  * Spark-first: a `coalesce` of `try_to_timestamp` calls — one codegen'd
  * expression, no UDF, null on total failure (the reference errors; callers
  * that want fail-fast can assert no nulls). ANSI mode (Spark 4 default)
  * makes plain `to_timestamp` throw on mismatch, hence `try_to_timestamp`.
  */
object Timestamps {

  /** The reference's three-format fallback as a single Column. */
  def parseMulti(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** Harness query: renders event timestamps into the three reference
    * formats (by `event_id % 3`) and parses them back with [[parseMulti]].
    * Exercises every branch of the fallback chain. */
  def multiFormatParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val asText = ev.withColumn("raw",
      when(col("event_id") % 3 === 0,
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .when(col("event_id") % 3 === 1,
        date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd")))
    asText.select(col("event_id"), col("raw"),
        parseMulti(col("raw")).as("parsed_ts"))
      .orderBy("event_id")
  }
}
