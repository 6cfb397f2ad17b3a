package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T3/T5 — the Kafka event envelope: per-row JSON value keyed by entity
  * identity, tenant-stamped, one topic per entity with a consolidated
  * union feed (reference `payment_intent.rs:102-105`,
  * `config/development.toml:660-673`).
  *
  * Spark-first: `to_json(struct(...))` is a codegen'd expression evaluated
  * on executors — the whole envelope build is a narrow map, no shuffle.
  * The Kafka write itself is `df.select($"key", $"value").write
  * .format("kafka")`; the harness (zero-egress) verifies the envelope
  * columns and writes parquet instead (see [[graft.sinks.EventSink]]).
  */
object Envelope {

  /** Orders rendered as a per-entity event feed: (entity, key, tenant,
    * value-json). Doubles are pre-formatted to fixed 2-dp strings so the
    * JSON text is engine-independent; timestamps pre-formatted UTC.
    *
    * Same explicit-null contract as [[graft.pipeline.Backfill]]'s
    * envelope: a null column serializes as `"field":null` (a consumer
    * must distinguish cleared-to-null from absent), and the 2-dp format
    * is null-GUARDED — java.util.Formatter renders a null arg as the
    * string "null", which %.2f precision-truncates to the GARBAGE token
    * `"amount":"nu"` (found by the reldegen gate: the one null-amount
    * hazard Backfill guarded and this module didn't). */
  def ordersFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      lit("orders").as("entity"),
      col("o_orderkey").cast("string").as("key"),
      lit("public").as("tenant"),
      to_json(struct(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("merchant_id"),
        col("o_orderstatus").as("status"),
        when(col("o_totalprice").isNotNull,
          format_string("%.2f", col("o_totalprice"))).as("amount"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("created_at")
      ), Map("ignoreNullFields" -> "false")).as("value"))

  /** Lineitems as a second per-entity feed (composite identity key,
    * mirroring attempt_id = payment_id+attempt no). */
  def lineitemFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").select(
      lit("lineitem").as("entity"),
      concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("key"),
      lit("public").as("tenant"),
      to_json(struct(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_returnflag").as("return_flag"),
        col("l_linestatus").as("line_status"),
        when(col("l_quantity").isNotNull,
          format_string("%.2f", col("l_quantity"))).as("quantity")
      ), Map("ignoreNullFields" -> "false")).as("value"))

  /** Envelope query for the oracle: orders feed, deterministic order. */
  def eventEnvelope(spark: SparkSession, dir: String): DataFrame =
    ordersFeed(spark, dir).orderBy(col("key").cast("long"))

  /** The consolidated feed: UNION ALL of the per-entity feeds
    * (`consolidated_events_topic`, `config/development.toml:672`). Spark
    * unions are metadata-only — no shuffle, partitions concatenate. */
  def unionFeed(spark: SparkSession, dir: String): DataFrame =
    ordersFeed(spark, dir).unionAll(lineitemFeed(spark, dir))
      .orderBy("entity", "key")
}
