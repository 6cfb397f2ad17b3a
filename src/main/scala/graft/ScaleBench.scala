package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-18 scaling-signal probe (VERDICT r17 item 10): the sf0.1
  * per-query times are dominated by fixed AQE stage-materialization
  * latency, so the driver's 8-vs-32-core block measures overhead
  * floor, not operator parallelism. This main times declared queries
  * over a `factor`× clone of the dataset, where real per-row work
  * dominates, at whatever core count `SPARK_GRAFT_CPUS` names — run it
  * once with 8 and once with 32 and compare.
  *
  * The clone shifts every long `*_id`/`*key` column by the SAME
  * per-copy offset in every table, so cross-table joins (events.user_id
  * ↔ orders.o_custkey, lineitem.l_orderkey ↔ orders.o_orderkey,
  * doc_id ≅ vec_id) stay referentially intact and each copy is an
  * independent shard — queries scale in input size with no cross-copy
  * interaction. Values, texts and timestamps are untouched.
  *
  * Each query runs `runs` times (default 2) and prints every run: the
  * FIRST run carries the scaled dataset's memo/index builds, the last
  * is the warm serve — report the last for the scaling ratio, the
  * first for build scaling. Usage:
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.ScaleBench 10 q1,q2,..."
  */
object ScaleBench {
  val IdOffset = 1000000000000L // 1e12: far above any real key

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val qs: Seq[String] =
      if (args.length > 1) args(1).split(',').map(_.trim).toSeq
      else Seq("feed_compact", "hybrid_search", "cluster_labels",
        "curation_pipeline", "tfidf_top_terms", "quality_quantile_filter",
        "density_prune", "dsir_select_frac", "sim_topk_opq_rerank",
        "dedup_incremental")
    val runs = if (args.length > 2) args(2).toInt else 2
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val dup = s"/tmp/graft_scalebench_${factor}x"
    val marker = new java.io.File(s"$dup/_DONE")
    if (!marker.exists()) {
      val dir = new java.io.File(dup)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
      new java.io.File(src).listFiles().map(_.getName)
        .filter(_.endsWith(".parquet")).sorted.foreach { t =>
          val df = spark.read.parquet(s"$src/$t")
          val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
          val shifted = df.crossJoin(copies)
          val out = df.schema.fields.map { f =>
            if (f.dataType == LongType &&
                (f.name.endsWith("_id") || f.name.toLowerCase.endsWith("key")))
              (col(f.name) + col("_copy") * IdOffset).as(f.name)
            else col(f.name)
          }
          // 64 splits per table: the crossJoin inherits the source's
          // single split, and a one-file clone would make every scan a
          // single task — poisoning the very scaling signal this tool
          // exists to measure (a production 10x dataset has 10x the
          // files). 64 > 32 cores so both core counts see full layout
          // parallelism.
          shifted.select(out.toIndexedSeq: _*).repartition(64)
            .write.mode("overwrite").parquet(s"$dup/$t")
          println(s"[scalebench] cloned $t at ${factor}x")
        }
      marker.createNewFile()
      ()
    }
    qs.foreach { q =>
      (0 until runs).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dup).count()
        println(f"[scalebench] cpus=$cpus factor=$factor $q run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
