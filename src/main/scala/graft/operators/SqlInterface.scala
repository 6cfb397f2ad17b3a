package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The SQL front door: every harness table registered as a temp view,
  * queries expressed as ANSI SQL strings through `spark.sql` — the same
  * Catalyst plans as the DataFrame API (the reference has no SQL
  * surface at all; here it's free, and the oracle is nearly the
  * identical statement).
  */
object SqlInterface {

  // keyed on the session OBJECT (WeakHashMap), not identityHashCode: a
  // GC'd session's hash can be reused by a new session, which would
  // silently skip registration ("table not found"); weak keys also let
  // dead sessions' entries collect instead of growing forever
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  /** Register harness tables as temp views — only the ones asked for,
    * once per (session, dir): `spark.read.parquet` pays file listing +
    * footer reads per call, which dominated these sub-second queries.
    * Re-registers when the same view name is later asked for a
    * DIFFERENT dir (last dir wins, matching createOrReplaceTempView). */
  def registerViews(spark: SparkSession, dir: String,
      tables: Seq[String] = Tables.names): Unit =
    registered.synchronized {
      var set = registered.get(spark)
      if (set == null) { set = new java.util.HashSet[String](); registered.put(spark, set) }
      tables.foreach { t =>
        if (set.add(s"$dir|$t") || !spark.catalog.tableExists(t)) {
          set.removeIf((k: String) => k.endsWith(s"|$t") && k != s"$dir|$t")
          Tables.load(spark, dir, t).createOrReplaceTempView(t)
        }
      }
    }

  /** The reference's core query shape, as SQL text (EP2 —
    * `payment_intent.rs:62-71`). */
  def sqlBackfillScan(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("orders"))
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      FROM orders
      WHERE o_custkey IN (7, 42, 99)
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
      ORDER BY o_custkey, o_orderkey""")
  }

  /** A SQL analytics rollup over the joined star (join + agg + having,
    * all through the SQL parser). */
  def sqlMerchantRevenue(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("orders", "customer"))
    spark.sql("""
      SELECT c.c_mktsegment AS segment,
             count(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
      HAVING count(*) > 10
      ORDER BY segment""")
  }

  /** Arbitrary GROUPING SETS (the general form cube/rollup specialize):
    * per-lang totals, per-source totals and the grand total in ONE hash
    * aggregate over an Expand — not three scans unioned. grouping_id
    * disambiguates real NULLs from grouping-set NULLs. */
  def sqlGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("documents"))
    spark.sql("""
      SELECT lang, source, count(*) AS n_docs,
             CAST(grouping_id(lang, source) AS BIGINT) AS gid
      FROM documents
      GROUP BY GROUPING SETS ((lang), (source), ())
      ORDER BY gid, lang, source""")
  }

  /** The custom-function SQL surface: the engine's Catalyst expressions
    * called from plain SQL text (registered via
    * [[graft.functions.GraftFunctions]] — same builders the
    * `GraftExtensions` session-extension path injects). hash60 is the
    * cross-engine base hash, so even this query is hash-checked; the
    * t-digest aggregate comes back as a within-bound verdict like the
    * rest of the sketch family. */
  def sqlCustomFuncs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerTemp(spark)
    registerViews(spark, dir, Seq("documents"))
    spark.sql("""
      SELECT count(*) AS n_docs,
             CAST(bit_xor(hash60(text)) AS BIGINT) AS corpus_hash,
             round(dot_product(array(1.0D, 2.0D, 3.0D),
                               array(4.0D, 5.0D, 6.0D)), 4) AS dp,
             z_order(CAST(6L AS BIGINT), CAST(5L AS BIGINT), 3) AS z65,
             abs(t_digest_quantiles(CAST(n_chars AS DOUBLE),
                   array(0.5D), 200)[0]
                 - percentile(n_chars, 0.5)) / percentile(n_chars, 0.5)
               <= 0.02 AS td_p50_ok
      FROM documents""")
  }

  /** Sketch-family quantiles: `approx_percentile` checked against the
    * exact value. The sketch output is engine-specific, so the oracle
    * sees rounded exact quantiles plus within-±2% verdicts on the sketch
    * (same contract shape as [[Aggregates.approxDistinct]] — at 100 TB
    * the sketch is the only affordable path, and this keeps its accuracy
    * hash-checked). */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
      expr("percentile(l_extendedprice, 0.5)").as("e50"),
      expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("a99"),
      expr("percentile(l_extendedprice, 0.99)").as("e99"))
      .select(
        round(col("e50"), 4).as("exact_p50"),
        round(col("e99"), 4).as("exact_p99"),
        (abs(col("a50") - col("e50")) / col("e50") <= 0.02).as("approx_p50_ok"),
        (abs(col("a99") - col("e99")) / col("e99") <= 0.02).as("approx_p99_ok"))
}
