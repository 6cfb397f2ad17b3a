package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned so timestamp results (and therefore oracle hashes) never
      // depend on the host timezone — Verify pins it too
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the two scan paths once so the first measured query doesn't
    // absorb file-index/codegen bootstrap cost. In try: a broken table
    // must cost its own queries, not the whole round's perf signal
    // (r7's bench died HERE and produced zero numbers — BENCH_r07 rc:1)
    try {
      Tables.load(spark, sfDir, "events").count()
      Tables.load(spark, sfDir, "lineitem").count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed (continuing): $e") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of three runs: machine-load noise on the shared box swings a
      // single run ±100%; the min is the reproducible warm cost
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // cache cleanup OUTSIDE the timed window (LSH queries persist
        // signature tables; later queries shouldn't inherit the pressure)
        spark.catalog.clearCache()
        if (ok) elapsed else -1.0 // visible failure marker, not a fast "win"
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    def r4(v: Double): String = if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    // failed queries carry the -1 marker per-query but must not be
    // summed into the headline (a -1 would silently UNDERSTATE it);
    // they are named so a truncated capture still shows the failure
    val (bad, good) = results.partition(_._2 < 0)
    val failed = bad.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = good.map(_._2).sum
    // queries first, metric/total LAST: a tail-truncating capture keeps
    // the headline number either way
    val line = s"""{"queries":$qs,"sf":"$sfDir","failed":$failed,"metric":"total","unit":"sec","value":${r4(total)}}"""
    println(line)
    // the stdout capture has truncated per-query numbers in past rounds;
    // the same JSON goes to a file so every query's time survives review
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
        "BENCH_DETAIL.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"BENCH_DETAIL write failed: $e") }
    spark.stop()
  }
}
