package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 A/B probe harness: ad-hoc variants timed under the bench
  * session config (3 runs each, warm-min is the comparable number).
  * Usage: runMain graft.ProbeR18 <name> [<name>...] */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // skew_plain: the same declared output as skew_salted_join but via
    // the plain join, AQE left to handle the key skew (VERDICT item 7)
    def skewPlain(s: SparkSession, d: String): DataFrame = {
      val li = Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ord = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderpriority")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("o_orderpriority"))
        .orderBy("l_orderkey", "l_linenumber")
    }
    val adhoc: Map[String, (SparkSession, String) => DataFrame] = Map(
      "skew_plain" -> (skewPlain _)
    )
    try {
      Tables.load(spark, sfDir, "events").count()
      Tables.load(spark, sfDir, "lineitem").count()
    } catch { case scala.util.control.NonFatal(_) => }
    args.foreach { q =>
      val fn = adhoc.getOrElse(q, SparkEntry.queries(q))
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
