package graft.sinks

import org.apache.spark.sql.DataFrame

/** Envelope feed sinks: Kafka in production, partitioned parquet in the
  * (zero-egress) harness and for lakehouse handoff. One `write` call —
  * the sink choice is config, not code (SURVEY.md §5 item 4: the Kafka
  * sink swaps for a file sink under test).
  */
object EventSink {
  sealed trait Sink
  /** Per-entity topic, keyed by entity identity (reference
    * `config/development.toml:660-673`). */
  final case class Kafka(brokers: String, topic: String) extends Sink
  /** Partitioned columnar output: one directory per entity, files
    * capped so downstream loaders parallelize (100 TB hygiene —
    * unbounded single files defeat retry granularity). */
  final case class Parquet(path: String, maxRecordsPerFile: Long = 5000000L)
    extends Sink

  def write(feed: DataFrame, sink: Sink): Unit = sink match {
    case Kafka(brokers, topic) =>
      feed.selectExpr("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    case Parquet(path, maxRecords) =>
      feed.write.mode("overwrite")
        .partitionBy("entity")
        .option("maxRecordsPerFile", maxRecords)
        .parquet(path)
  }
}
