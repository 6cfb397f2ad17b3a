package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference-parity deliverable (SURVEY.md §7 M2): the whole
  * backfill run — reference `main()` EP1 (`src/main.rs:59-321`) — as one
  * declarative pipeline, parameterized like its CLI (`main.rs:33-57`):
  * merchant list (or all), date range, batch size, parallelism.
  *
  * Reference shape vs this pipeline:
  *  - its 3-level driver loop (key-store pages → merchants × `parallel`
  *    → LIMIT/OFFSET row pages) becomes ONE partitioned scan per entity
  *    with pushed-down predicates — no driver orchestration, Spark's
  *    scheduler is the concurrency;
  *  - the per-merchant key-store lookup becomes a broadcast hash join;
  *  - per-row `log_*` Kafka produces become a single columnar envelope
  *    projection + a batched sink write;
  *  - fail-fast-no-resume (X6) becomes task retry + atomic job.
  *
  * The harness binds `source` to parquet tables (offline container);
  * production binds the same entity names to [[graft.sources.Jdbc]]
  * configs and `sink` to `format("kafka")`.
  */
object Backfill {

  /** CLI-equivalent parameters (reference `main.rs:33-57`). */
  case class Config(
      tenant: String = "public",
      merchantIds: Option[Seq[Long]] = None, // None = all merchants
      start: Option[String] = None,          // inclusive, like BETWEEN
      end: Option[String] = None,
      entities: Seq[Entity] = defaultEntities)

  /** One backfill entity: table + identity/merchant/time columns and
    * the envelope payload (mirrors the four dump_* modules). */
  case class Entity(
      name: String,
      table: String,
      keyCol: String,
      merchantCol: String,
      timeCol: String,
      payload: Seq[String])

  /** orders/lineitem stand in for payment_intent/payment_attempt
    * (SURVEY.md §1: capability = full-row dump of wide typed tables). */
  val defaultEntities: Seq[Entity] = Seq(
    Entity("orders", "orders", "o_orderkey", "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")),
    Entity("lineitem", "lineitem", "l_orderkey", "l_orderkey", "l_shipdate",
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus", "l_shipdate")))

  /** P2/P3/P4 predicate block: merchant selection + inclusive range. */
  private def predicates(e: Entity, cfg: Config): Column = {
    val m = cfg.merchantIds
      .map(ids => col(e.merchantCol).isin(ids: _*))
      .getOrElse(lit(true))
    val lo = cfg.start
      .map(s => col(e.timeCol) >= lit(s).cast("timestamp")).getOrElse(lit(true))
    val hi = cfg.end
      .map(s => col(e.timeCol) <= lit(s).cast("timestamp")).getOrElse(lit(true))
    m && lo && hi
  }

  /** One entity's event feed: filtered scan → envelope. Timestamps and
    * doubles are pre-formatted so the JSON is engine-independent. */
  def entityFeed(spark: SparkSession, dir: String, e: Entity,
      cfg: Config): DataFrame = {
    val src = Tables.load(spark, dir, e.table).filter(predicates(e, cfg))
    val payloadCols = e.payload.map { c =>
      val v = src.schema(c).dataType.typeName match {
        case "double" => format_string("%.2f", col(c))
        case t if t.startsWith("timestamp") =>
          date_format(col(c), "yyyy-MM-dd HH:mm:ss")
        case _ => col(c)
      }
      v.as(c)
    }
    src.select(
      lit(e.name).as("entity"),
      col(e.keyCol).cast("string").as("key"),
      lit(cfg.tenant).as("tenant"),
      to_json(struct(payloadCols: _*)).as("value"))
  }

  /** The consolidated feed: UNION ALL of every entity feed — the
    * `consolidated_events_topic` twin. One job, entities scan in
    * parallel (the reference serializes them per merchant, X3). */
  def run(spark: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    cfg.entities.map(entityFeed(spark, dir, _, cfg)).reduce(_ unionAll _)

  /** Reconciliation checksums: per-entity row count + order-independent
    * bit_xor of row hashes over the emitted feed. The reference relied
    * on downstream ClickHouse/OpenSearch recounts for integrity
    * (SURVEY.md §5); here the feed self-certifies — run the same
    * aggregate over source and sink and compare (xor is commutative,
    * so partition order is irrelevant; a single flipped byte flips the
    * checksum). Row hash = md5-prefix over a length-prefixed concat
    * (separator-proof), cross-engine so the oracle recomputes it. */
  def feedChecksum(feed: DataFrame): DataFrame = {
    val canon = concat(Seq(col("key"), col("tenant"), col("value")).map(c =>
      concat(length(c).cast("string"), lit(":"), c, lit("|"))): _*)
    feed.groupBy("entity").agg(
      count(lit(1)).as("n_rows"),
      bit_xor(graft.functions.Hash60.hash60(canon)).as("checksum"))
      .orderBy("entity")
  }

  /** Incremental batch backfill: process only rows newer than the
    * persisted high-water mark, then advance it — the idempotent
    * re-run story the reference lacks (X6: fail-fast, no resume,
    * full-range re-read on retry). State is one tiny parquet of
    * (entity, hwm); a re-run with no new data emits zero rows. The
    * watermark column is the entity's `timeCol`, exclusive lower
    * bound (rows AT the mark were emitted by the run that set it). */
  def runIncremental(spark: SparkSession, dir: String, stateDir: String,
      cfg: Config = Config()): DataFrame = {
    import org.apache.spark.sql.types._
    val statePath = s"$stateDir/hwm.parquet"
    val stateSchema = StructType(Seq(
      StructField("entity", StringType), StructField("hwm", TimestampNTZType)))
    val prior: Map[String, java.time.LocalDateTime] =
      try spark.read.schema(stateSchema).parquet(statePath).collect()
        .map(r => r.getString(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
      catch { case _: Exception => Map.empty }

    val feeds = cfg.entities.map { e =>
      val base = Tables.load(spark, dir, e.table)
      val incr = prior.get(e.name)
        .map(h => base.filter(col(e.timeCol) > lit(h)))
        .getOrElse(base)
      (e, incr)
    }
    // advance the mark from the SOURCE (not the filtered slice) so an
    // empty increment keeps the previous mark instead of erasing it
    val newHwm = cfg.entities.map { e =>
      val m = Tables.load(spark, dir, e.table)
        .agg(max(col(e.timeCol))).collect().head
      (e.name, if (m.isNullAt(0)) prior.get(e.name).orNull
               else m.getAs[java.time.LocalDateTime](0))
    }
    import spark.implicits._
    newHwm.filter(_._2 != null).toDF("entity", "hwm")
      .coalesce(1).write.mode("overwrite").parquet(statePath)

    feeds.map { case (e, src) =>
      val cols = e.payload.map { c =>
        val v = src.schema(c).dataType.typeName match {
          case "double" => format_string("%.2f", col(c))
          case t if t.startsWith("timestamp") =>
            date_format(col(c), "yyyy-MM-dd HH:mm:ss")
          case _ => col(c)
        }
        v.as(c)
      }
      src.select(lit(e.name).as("entity"),
        col(e.keyCol).cast("string").as("key"),
        lit(cfg.tenant).as("tenant"),
        to_json(struct(cols: _*)).as("value"))
    }.reduce(_ unionAll _)
  }

  /** Batch Kafka sink for the feed (production path; offline harness
    * writes parquet instead — zero egress). */
  def writeKafka(feed: DataFrame, brokers: String, topic: String): Unit =
    feed.selectExpr("key", "value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()
}
