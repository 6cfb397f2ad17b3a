package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crash harness for the streaming ingest protocol — the process-kill
  * twin of StreamingSpec's simulated replays. The spec proves the
  * marker/seq contracts hold when a batch is REDELIVERED; this main
  * lets `tools/verify_killmid.py` prove they hold when the JVM is
  * SIGKILLed at an arbitrary instant — mid-parquet-commit,
  * between a band append and its marker, between an index append and
  * the checkpoint offset commit — and then restarted from the stream
  * checkpoint.
  *
  * Three phases over one work directory (isolated warehouse +
  * metastore, so a kill can never corrupt the repo's):
  *   setup  — seed corpus store + band/postings/assignment serving
  *            indexes over 75% of the sf documents; stage the other
  *            25% as `nBatches` single-file stream batches.
  *   ingest — run [[streaming.StreamingBackfill.fullIngestLoop]] over
  *            the staged files with a real checkpoint. The driver
  *            SIGKILLs this process at a random time; rerunning the
  *            phase resumes from the checkpoint (redelivering the
  *            in-flight batch).
  *   check  — assert the corpus store holds every document exactly
  *            once, and BM25 + ANN served from the maintained indexes
  *            equal batch rebuilds over the full corpus (the same
  *            hash-equalities StreamingSpec pins for the clean run).
  *
  * Run via java with the compiled classes + /opt/spark/jars — no sbt
  * in the kill loop (killing sbt's JVM would test sbt, not the
  * protocol).
  */
object KillProbe {
  private val Batches = 12

  private def session(work: String): SparkSession = {
    System.setProperty("derby.system.home", s"$work/derby")
    SparkSession.builder()
      .appName("graft-kill-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
  }

  private val bandTable = "kill_band_t"
  private val postTable = "kill_post_t"
  private val assignTable = "kill_assign_t"

  private def embedderFor(emb: DataFrame): DataFrame => DataFrame =
    b => emb.join(b.select(col("doc_id").as("vec_id")), "vec_id")

  def main(args: Array[String]): Unit = {
    val phase = args(0)
    val work = args(1)
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = session(work)
    import graft.operators.{Dedup, Retrieval, Similarity}
    import graft.sources.{Bucketing, IndexChurn}
    val docs = Tables.load(spark, sf, "documents")
    val corpusPred = col("doc_id") % 4 =!= 0
    val emb = Similarity.embeddingsWithNorm(spark, sf)
    val centroids = Similarity.trainCentroids(spark, sf, iters = 2)

    phase match {
      case "setup" =>
        docs.filter(corpusPred).write.mode("overwrite")
          .parquet(s"$work/corpus/documents.parquet")
        Bucketing.ensureBandIndexFrom(spark, bandTable,
          Dedup.minhashCappedBands(spark, sf).filter(corpusPred))
        IndexChurn.stamp(
            Retrieval.postingsTable(spark, sf).filter(corpusPred), "U", -1L)
          .write.mode("overwrite").bucketBy(8, "token").sortBy("token")
          .saveAsTable(postTable)
        val streamedIds = docs.filter(!corpusPred)
          .select(col("doc_id").as("vec_id"))
        IndexChurn.stamp(
            Similarity.assignVectors(
              emb.join(streamedIds, Seq("vec_id"), "left_anti"), centroids),
            "U", -1L)
          .write.mode("overwrite").bucketBy(8, "c_id").sortBy("c_id")
          .saveAsTable(assignTable)
        // one single-file batch per modulus slice, mtime-ordered so the
        // file source delivers them deterministically
        (0 until Batches).foreach { i =>
          val sub = s"$work/stream/b$i"
          docs.filter(!corpusPred && (col("doc_id") / 4) % Batches === i)
            .coalesce(1).write.mode("overwrite").parquet(sub)
          new java.io.File(sub).listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .foreach(f => require(f.setLastModified(1000000000000L + i * 60000L)))
        }
        println("SETUP_DONE")

      case "ingest" =>
        val stream = spark.readStream.schema(Tables.documentsSchema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$work/stream")
        println("INGEST_BEGIN")
        streaming.StreamingBackfill.fullIngestLoop(spark, stream,
          s"$work/corpus", bandTable, postTable, assignTable, centroids,
          embedderFor(emb), s"$work/reports",
          checkpointDir = s"$work/ckpt")
        println("INGEST_DONE")

      case "check" =>
        val n = streaming.StreamingBackfill
          .corpusDocs(spark, s"$work/corpus").count()
        val want = docs.count()
        require(n == want, s"corpus store holds $n docs, want $want")
        // distinct ids too: a partial batch overwrite must not leave a
        // doc duplicated across a crashed and a replayed file set
        val nd = streaming.StreamingBackfill
          .corpusDocs(spark, s"$work/corpus").select("doc_id")
          .distinct().count()
        require(nd == want, s"corpus store holds $nd distinct ids, want $want")
        val servedTf = IndexChurn
          .served(spark, postTable, Seq("token", "doc_id"))
          .filter(col("token").isin("hash", "join", "scan"))
        val gotBm25 = Retrieval.bm25Rank(spark, sf, servedTf, 20)
          .collect().map(_.toString).toSeq
        val wantBm25 = Retrieval.bm25Search(spark, sf)
          .collect().map(_.toString).toSeq
        require(gotBm25 == wantBm25,
          s"served BM25 diverged from batch rebuild:\n got=$gotBm25\nwant=$wantBm25")
        val gotAnn = Similarity.servedTopK(spark, sf,
            IndexChurn.served(spark, assignTable, Seq("vec_id")), iters = 2)
          .collect().map(_.toString).toSeq
        val wantAnn = Similarity.ivfTopKTrained(spark, sf, iters = 2)
          .collect().map(_.toString).toSeq
        require(gotAnn == wantAnn, "served ANN diverged from batch rebuild")
        println("KILLPROBE_OK")

      case other => sys.error(s"unknown phase: $other")
    }
    spark.stop()
  }
}
