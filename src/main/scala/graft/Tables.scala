package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading for the harness parquet layout (TESTDATA.md).
  *
  * In production the same operators run over JDBC sources (see
  * [[graft.sources.Jdbc]]); the harness swaps in parquet directories so the
  * oracle (DuckDB) reads the identical bytes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * and truncate to microseconds — the same ns→µs truncation DuckDB's
    * µs-native timestamp applies, so oracle results agree. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // integer `div`, not `/`: long/long promotes to double, which loses
    // precision above 2^53 (epoch-nanos ≈ 1.7e18) → off-by-1-µs errors
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
