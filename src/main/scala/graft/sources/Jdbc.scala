package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** S1/S2 — partitioned JDBC source for the production path (the
  * reference reads a Postgres replica through a 5-connection pool with
  * 10k-row LIMIT/OFFSET pages — `src/main.rs:167-170`,
  * `payment_intent.rs:61-71`).
  *
  * Spark-first replacement: ONE partitioned scan per entity, split on
  * `created_at` bounds across `numPartitions` concurrent connections;
  * Catalyst pushes filters/projection into the generated SQL (JDBC
  * `compileFilter`), so the per-merchant predicates reach Postgres
  * exactly like the reference's hand-rendered WHERE clauses — without
  * the O(pages²) OFFSET re-scans (SURVEY.md §4).
  *
  * Offline harness note: no database exists in the container, so this
  * module is exercised at the option/plan level (JdbcSpec) and the
  * operators run over parquet via [[graft.Tables]]; swapping `reader`
  * in is a config change, not a code change.
  */
object Jdbc {
  import graft.pipeline.ConfigBootstrap.Secret

  /** Connection + partitioning config (defaults mirror the reference's
    * tuning: fetchsize 10000 = its page size `main.rs:43-44`; 5
    * partitions = its merchant parallelism `main.rs:46-47`). The
    * password is a [[graft.pipeline.ConfigBootstrap.Secret]] — the S4
    * bootstrap's decrypted credential flows to the reader without ever
    * appearing in a toString/log (the case class renders
    * `Secret(****)`). */
  case class JdbcConfig(
      url: String,
      table: String,
      user: String = "",
      password: Secret = new Secret(""),
      partitionColumn: Option[String] = Some("created_at"),
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      numPartitions: Int = 5,
      fetchSize: Int = 10000)

  /** Render the Spark JDBC reader options (pure — unit-testable without
    * a live database). */
  def options(cfg: JdbcConfig): Map[String, String] = {
    val base = Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "user" -> cfg.user,
      "password" -> cfg.password.reveal(),
      "fetchsize" -> cfg.fetchSize.toString,
      "pushDownPredicate" -> "true",
      "pushDownLimit" -> "true")
    val parts = (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound) match {
      case (Some(c), Some(lo), Some(hi)) => Map(
        "partitionColumn" -> c, "lowerBound" -> lo, "upperBound" -> hi,
        "numPartitions" -> cfg.numPartitions.toString)
      case _ => Map.empty[String, String]
    }
    base ++ parts
  }

  def reader(spark: SparkSession, cfg: JdbcConfig): DataFrameReader =
    spark.read.format("jdbc").options(options(cfg))

  def load(spark: SparkSession, cfg: JdbcConfig): DataFrame =
    reader(spark, cfg).load()
}
