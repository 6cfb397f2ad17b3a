package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Round-17 measurement harness: times a declared query (or an ad-hoc
  * decomposition registered below) under the bench session config, with
  * a per-stage listener so the time can be attributed to scan / shuffle
  * / aggregate stages instead of guessed at (optimization guide §1).
  * Usage: runMain graft.ProbeR17 <name> [<name>...]  (3 runs each). */
object ProbeR17 {
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
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long)]()
    val taskTimes = new java.util.concurrent.ConcurrentHashMap[
      Int, scala.collection.mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, s"gc=${m.jvmGCTime}",
          m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, si.numTasks.toLong))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskTimes.computeIfAbsent(te.stageId,
          _ => scala.collection.mutable.ArrayBuffer[Long]())
          .synchronized {
            taskTimes.get(te.stageId) += te.taskInfo.duration
          }
      }
    })
    // warm scan paths like Bench
    try {
      Tables.load(spark, sfDir, "events").count()
      Tables.load(spark, sfDir, "lineitem").count()
    } catch { case scala.util.control.NonFatal(_) => }
    // prof arg: sample executor task threads' stacks while queries run,
    // print the hottest frames after each query (poor man's async-profiler)
    val profiling = args.contains("prof")
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var profRun = true
    val profThread = new Thread(() => {
      while (profRun) {
        Thread.getAllStackTraces.forEach { (th, st) =>
          if (th.getName.startsWith("Executor task launch") && st.nonEmpty) {
            // topmost non-jdk frame plus immediate caller for context
            val top = st.iterator.find(f =>
              !f.getClassName.startsWith("java.") &&
              !f.getClassName.startsWith("jdk.") &&
              !f.getClassName.startsWith("sun."))
            top.foreach { f =>
              val k = s"${f.getClassName}.${f.getMethodName}"
              frameCounts.merge(k, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(3)
      }
    })
    if (profiling) { profThread.setDaemon(true); profThread.start() }
    args.filterNot(_ == "prof").foreach { name0 =>
      val explain = name0.startsWith("explain:")
      val name = if (explain) name0.stripPrefix("explain:") else name0
      val fn: (SparkSession, String) => DataFrame =
        SparkEntry.queries.getOrElse(name, cases(name))
      if (explain) fn(spark, sfDir).explain("formatted")
      frameCounts.clear()
      (0 until 3).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"== $name run$i: $s%.3f s")
        if (i == 2) {
          println("   stageId  runTime(ms)  shufRead  shufWrite  tasks  taskDurs")
          stages.sortBy(_._1).foreach { case (id, nm, rt, sr, sw, nt) =>
            val durs = Option(taskTimes.get(id))
              .map(_.sorted.reverse.take(8).mkString(",")).getOrElse("")
            println(f"   $id%7d  $rt%11d  $sr%8d  $sw%9d  $nt%5d  [$durs] $nm")
          }
        }
        spark.catalog.clearCache()
      }
      if (profiling) {
        import scala.jdk.CollectionConverters._
        println(s"-- hot frames for $name:")
        frameCounts.asScala.toSeq.sortBy(-_._2).take(20).foreach {
          case (k, n) => println(f"   $n%6d  $k")
        }
      }
    }
    profRun = false
    spark.stop()
  }

  /** Ad-hoc decomposition probes (edited freely during the round). */
  def cases(name: String): (SparkSession, String) => DataFrame = {
    import org.apache.spark.sql.functions._
    name match {
      case "fc_run" => (s, d) => graft.pipeline.Backfill.run(s, d)
      case "fc_delivered" => (s, d) => {
        val B = graft.pipeline.Backfill
        B.run(s, d).withColumn("delivery", explode(
          when(pmod(graft.functions.Hash60.hash60(
            concat(col("entity"), lit(":"), col("key"))), lit(10L)) === 0,
            array(lit(0), lit(1))).otherwise(array(lit(0))))).drop("delivery")
      }
      case "fc_compact" => (s, d) =>
        graft.pipeline.Backfill.compactFeed(cases("fc_delivered")(s, d))
      // forces the full envelope (to_json etc.) with no agg/shuffle
      case "fc_value_len" => (s, d) =>
        graft.pipeline.Backfill.run(s, d).agg(sum(length(col("value"))))
      // agg with the full JSON identity but no explode
      case "fc_compact_noexplode" => (s, d) =>
        graft.pipeline.Backfill.compactFeed(graft.pipeline.Backfill.run(s, d))
      // agg on a narrow hashed identity: isolates string-key agg cost
      case "fc_groupint" => (s, d) =>
        cases("fc_delivered")(s, d)
          .groupBy(xxhash64(col("entity"), col("key"), col("tenant"),
            col("value")).as("k"))
          .agg(count(lit(1)).as("n_deliveries"))
      // key-component isolation
      case "fc_g_nokey" => (s, d) =>
        graft.pipeline.Backfill.run(s, d)
          .groupBy("entity", "key", "tenant")
          .agg(count(lit(1)).as("n"))
      case "fc_g_valonly" => (s, d) =>
        graft.pipeline.Backfill.run(s, d)
          .groupBy("value").agg(count(lit(1)).as("n"))
      case "fc_g_constval" => (s, d) =>
        graft.pipeline.Backfill.run(s, d)
          .withColumn("value", concat(col("key"), lit("xx")))
          .groupBy("entity", "key", "tenant", "value")
          .agg(count(lit(1)).as("n"))
      case "fc_g_repart" => (s, d) =>
        graft.pipeline.Backfill.run(s, d)
          .repartition(32)
          .groupBy("entity", "key", "tenant", "value")
          .agg(count(lit(1)).as("n"))
      // repartition the RAW scans (narrow cols) before the envelope,
      // then the usual explode + identity agg + order
      case "fc_spread" => (s, d) => {
        val B = graft.pipeline.Backfill
        val cfg = B.Config(source = (sp, dir, e) =>
          Tables.load(sp, dir, e.table)
            .repartition(sp.sparkContext.defaultParallelism))
        val delivered = B.run(s, d, cfg).withColumn("delivery", explode(
          when(pmod(graft.functions.Hash60.hash60(
            concat(col("entity"), lit(":"), col("key"))), lit(10L)) === 0,
            array(lit(0), lit(1))).otherwise(array(lit(0))))).drop("delivery")
        B.compactFeed(delivered).orderBy("entity", "key", "value")
      }
      // half the partitions per entity (union = parallelism total)
      case "fc_spread16" => (s, d) => {
        val B = graft.pipeline.Backfill
        val cfg = B.Config(source = (sp, dir, e) =>
          Tables.load(sp, dir, e.table)
            .repartition(math.max(1, sp.sparkContext.defaultParallelism / 2)))
        val delivered = B.run(s, d, cfg).withColumn("delivery", explode(
          when(pmod(graft.functions.Hash60.hash60(
            concat(col("entity"), lit(":"), col("key"))), lit(10L)) === 0,
            array(lit(0), lit(1))).otherwise(array(lit(0))))).drop("delivery")
        B.compactFeed(delivered).orderBy("entity", "key", "value")
      }
      // explode-free: count base identities, multiply by the delivery
      // factor post-agg (constant within each group since the group key
      // contains entity+key)
      // per-entity: repartition by the key STRING pre-envelope so the
      // per-entity groupBy reuses the exchange (alias-aware partitioning);
      // union after the aggs (groups never cross entities)
      case "fc_bykey" => (s, d) => {
        val B = graft.pipeline.Backfill
        val n = math.max(1, s.sparkContext.defaultParallelism / 2)
        val per = B.Config().entities.map { e =>
          val cfg = B.Config(entities = Seq(e), source = (sp, dir, ent) =>
            Tables.load(sp, dir, ent.table)
              .repartition(n, col(ent.keyCol).cast("string")))
          B.run(s, d, cfg)
            .groupBy("entity", "key", "tenant", "value")
            .agg(count(lit(1)).as("base"))
            .select(col("entity"), col("key"), col("tenant"), col("value"),
              (col("base") * when(pmod(graft.functions.Hash60.hash60(
                concat(col("entity"), lit(":"), col("key"))), lit(10L)) === 0,
                lit(2L)).otherwise(lit(1L))).as("n_deliveries"))
        }
        per.reduce(_ unionAll _).orderBy("entity", "key", "value")
      }
      case "fc_mult" => (s, d) => {
        val B = graft.pipeline.Backfill
        val cfg = B.Config(source = (sp, dir, e) =>
          Tables.load(sp, dir, e.table)
            .repartition(math.max(1, sp.sparkContext.defaultParallelism / 2)))
        B.run(s, d, cfg)
          .groupBy("entity", "key", "tenant", "value")
          .agg(count(lit(1)).as("base"))
          .select(col("entity"), col("key"), col("tenant"), col("value"),
            (col("base") * when(pmod(graft.functions.Hash60.hash60(
              concat(col("entity"), lit(":"), col("key"))), lit(10L)) === 0,
              lit(2L)).otherwise(lit(1L))).as("n_deliveries"))
          .orderBy("entity", "key", "value")
      }
      case other => throw new IllegalArgumentException(s"unknown probe $other")
    }
  }
}
