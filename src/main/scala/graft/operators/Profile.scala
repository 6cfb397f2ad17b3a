package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ANALYZE-style data profiling: per-column null counts, distinct
  * cardinality and min/max over one table scan — the stats pass every
  * warehouse runs before trusting a new feed (and what a backfill
  * operator eyeballs to reconcile source vs sink).
  *
  * Shape: ONE aggregate over the scan computing 4 measures per column,
  * then an in-row explode to long form — no joins, no per-column jobs.
  * Exact `count_distinct` is used so the DuckDB oracle matches
  * bit-for-bit; Catalyst plans multi-distinct via an Expand (input ×
  * n_cols before the aggregate). At 100 TB swap in
  * `approx_count_distinct` — same single-scan plan minus the Expand,
  * with the HLL error bound the sketch family already oracle-checks
  * (`approx_distinct`).
  *
  * Min/max render per-type (doubles as fixed 2-dp, timestamps as
  * formatted UTC) so the strings are engine-independent.
  */
object Profile {

  private def rendered(agg: Column, dt: String): Column = dt match {
    case "double" => format_string("%.2f", agg)
    case t if t.startsWith("timestamp") =>
      date_format(agg, "yyyy-MM-dd HH:mm:ss")
    case _ => agg.cast("string")
  }

  def tableProfile(spark: SparkSession, dir: String,
      table: String = "orders"): DataFrame = {
    val df = Tables.load(spark, dir, table)
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val dt = f.dataType.typeName
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__distinct"),
        rendered(min(c), dt).as(s"${f.name}__min"),
        rendered(max(c), dt).as(s"${f.name}__max"))
    }
    val entries = fields.map { f =>
      struct(lit(f.name).as("col_name"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
