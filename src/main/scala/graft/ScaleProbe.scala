package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-scale probe (run manually; numbers recorded in
  * NOTES.md): duplicates the documents corpus 10× (every doc gets 9
  * clones — the LSH worst case: every band bucket is a 10-way
  * collision) and times the near-dup pipeline end to end, including
  * connected-components clustering. Usage:
  * `sbt "runMain graft.ScaleProbe /root/testdata/sf0.1"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val dup = "/tmp/graft_scale_docs"
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    docs.crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dup/documents.parquet")
    println(s"corpus: ${n * 10} docs (10x of $sf)")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    time("minhashPairs (cold: builds + materializes sig and pair memos)") {
      val p = operators.Dedup.minhashPairs(spark, dup)
      val c = p.count(); println(s"  pairs: $c")
    }
    time("dedupClusters (union-find over the memoized pair table)") {
      val cl = operators.Components.dedupClusters(spark, dup)
      val k = cl.filter(col("is_keeper")).count()
      println(s"  clusters: $k of ${cl.count()} clustered docs")
    }
    time("dedupKeepBest (memoized cluster map ⋈ docs)") {
      println(s"  keepers: ${operators.Components.dedupKeepBest(spark, dup)
        .filter(col("is_keeper")).count()}")
    }
    time("contamination (memoized pairs ⋈ split)") {
      println(s"  cross-split pairs: ${operators.Sampling.contamination(spark, dup).count()}")
    }
    time("incrementalPairs (new batch probes the memoized corpus index)") {
      // the increment rides the already-materialized signature memo:
      // this cost is the honest per-increment price once the corpus
      // index exists — compare against the cold minhashPairs above
      println(s"  new-vs-corpus pairs: ${operators.Dedup.incrementalPairs(spark, dup).count()}")
    }

    // sparse-increment verify A/B: the 10× probe above is the LSH worst
    // case (every doc in a 10-way clone bucket — the candidate set IS
    // the corpus), so it can't show the candidate-prune win. A
    // realistic nightly increment has few candidates relative to the
    // corpus; the pruned verify must cost O(candidates), the unpruned
    // (pre-r5) form pays a full corpus scan+tokenize regardless.
    {
      import spark.implicits._
      val candDf = operators.Dedup.incrementalPairs(spark, dup)
        .limit(100).select("new_id", "corpus_id")
        .as[(Long, Long)].collect().toSeq.toDF("new_id", "corpus_id")
      val docsAll = Tables.load(spark, dup, "documents")
      time("sparse-increment verify, candidate-pruned (100 cand vs 50k corpus)") {
        operators.Dedup.verifyCandidatesFrom(candDf, docsAll, docsAll, 0.5).count()
      }
      time("sparse-increment verify, UNPRUNED (pre-r5 shape, comparison)") {
        val sh = docsAll.select(col("doc_id"),
          functions.TextFunctions.wordShingles(col("text"), 3).as("shingles"))
        candDf
          .join(sh.select(col("doc_id").as("new_id"), col("shingles").as("sh_n")), "new_id")
          .join(sh.select(col("doc_id").as("corpus_id"), col("shingles").as("sh_c")), "corpus_id")
          .withColumn("jaccard",
            size(array_intersect(col("sh_n"), col("sh_c"))).cast("double") /
              size(array_union(col("sh_n"), col("sh_c"))))
          .filter(col("jaccard") >= 0.5).count()
      }
    }

    // ANN at 10×: duplicate the embedding table (shifted vec_ids so the
    // copies are distinct points from the index's perspective) and
    // compare brute force vs IVF probing on the same query set
    val nv = Tables.load(spark, sf, "embeddings").count()
    Tables.load(spark, sf, "embeddings")
      .crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * nv * 10).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dup/embeddings.parquet")
    println(s"vectors: ${nv * 10} (10x of $sf)")
    time("sim_topk_brute (exact, scans all vectors per query)") {
      operators.Similarity.bruteForceTopK(spark, dup).count()
    }
    time("sim_topk_ivf (cold: trains nothing, sample centroids; scans ~nprobe/C)") {
      operators.Similarity.ivfTopK(spark, dup).count()
    }
    time("sim_topk_ivf_kmeans (cold: Lloyd training + memoized centroids)") {
      operators.Similarity.ivfTopKTrained(spark, dup, iters = 2).count()
    }
    time("sim_topk_ivf_kmeans (warm: memoized centroid table)") {
      operators.Similarity.ivfTopKTrained(spark, dup, iters = 2).count()
    }

    // span-granular dedup at 10×: every 8-token span now occurs in 10
    // docs — maximal duplication. The no-pair-join claim is exactly
    // that THIS case stays linear: cost is O(total spans) whatever the
    // duplication level (a pair-based formulation would square).
    time("spanDedup (10x corpus, every span 10-way duplicated)") {
      // one aggregate action — two separate counts would run (and
      // time) the whole pipeline twice
      val r = operators.Dedup.spanDedup(spark, dup)
        .agg(sum(when(col("dup_span_frac") > 0, 1L).otherwise(0L)),
          count(lit(1))).collect().head
      println(s"  dup-span docs: ${r.getLong(0)} of ${r.getLong(1)}")
    }

    // retrieval at 10×: the index-served paths must beat the per-query
    // corpus scans as the corpus grows — the scan path pays a tokenize
    // of all 50k docs per query, the index path probes materialized
    // postings with a token-IN pushdown
    time("bm25_search (cold: builds doclen memo + full tf scan)") {
      operators.Retrieval.bm25Search(spark, dup).count()
    }
    time("bm25_search (warm: memoized doclen, still a full tf scan/query)") {
      operators.Retrieval.bm25Search(spark, dup).count()
    }
    time("bm25_from_index (cold: builds the postings memo once)") {
      operators.Retrieval.bm25FromIndex(spark, dup).count()
    }
    time("bm25_from_index (warm: pruned postings probe, 0 corpus scans)") {
      operators.Retrieval.bm25FromIndex(spark, dup).count()
    }
    time("bm25_batch (3 queries in ONE plan off the warm postings memo)") {
      operators.Retrieval.bm25Batch(spark, dup).count()
    }
    time("bm25_index_maintained (cold: builds + appends the bucketed catalog)") {
      operators.Retrieval.bm25IndexMaintained(spark, dup).count()
    }
    time("bm25_index_maintained (warm: bucket-pruned catalog probe)") {
      operators.Retrieval.bm25IndexMaintained(spark, dup).count()
    }
    time("phrase_search (full-scan twin)") {
      operators.Retrieval.phraseSearch(spark, dup).count()
    }
    time("phrase_from_index (cold: builds the positional memo)") {
      operators.Retrieval.phraseFromIndex(spark, dup).count()
    }
    time("phrase_from_index (warm: positional probe only)") {
      operators.Retrieval.phraseFromIndex(spark, dup).count()
    }

    // incremental ANN at 10×: the new-batch probe must not re-assign
    // the corpus — warm cost is the batch's nprobe lists only
    time("sim_topk_incremental (cold: materializes the assignment memo)") {
      operators.Similarity.incrementalTopK(spark, dup).count()
    }
    time("sim_topk_incremental (warm: persisted-assignment probe)") {
      operators.Similarity.incrementalTopK(spark, dup).count()
    }

    // CDC store: fold the full event changelog into a 16-bucket store,
    // then merge a small keyed batch — the increment must cost
    // O(affected buckets), not O(snapshot)
    {
      val log = Tables.load(spark, sf, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          operators.Cdc.opOf(col("event_type")).as("op"),
          col("event_type").as("last_type"), col("value").as("last_value"))
      val store = s"$dup/cdc_store"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val nEv = log.count()
      time(s"cdc initial fold ($nEv events -> 16-bucket snapshot store)") {
        operators.Cdc.mergeIntoStore(log, store, 16, 0L)
      }
      val batch = log.filter(col("user_id") < 3)
      time(s"cdc incremental merge (${batch.count()} events, 3 keys -> <=3 buckets)") {
        operators.Cdc.mergeIntoStore(batch, store, 16, 1L)
      }
      println(s"  snapshot keys: ${operators.Cdc.currentSnapshot(spark, store).count()}")
    }
    spark.stop()
  }
}
