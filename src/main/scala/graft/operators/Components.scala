package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair/edge table — the step that turns
  * near-dup PAIRS into dedup CLUSTERS ("keep one doc per component",
  * the actual training-data dedup output).
  *
  * Two phases, both executor-side (nothing but the converged flag and
  * an edge count ever reach the driver):
  *
  *  1. '''Partition-local union-find contraction''' (`mapPartitions`):
  *     each partition runs path-compressing union-find over its slice
  *     of the edge list and emits its spanning forest as (node →
  *     partition-local min). The union of per-partition forests has
  *     exactly the original components (standard spanning-forest
  *     argument), but at most one edge per distinct node per partition
  *     — a near-dup edge list (Σ bucket-pair blowup) contracts to the
  *     node set in one narrow pass. Memory is bounded by
  *     nodes-per-partition, controlled by the edges-per-partition
  *     target below, NOT by total graph size — this is what holds at
  *     100 TB.
  *  2. '''Min-label propagation''' on the contracted forest: label =
  *     min over self and neighbors, iterated to fixpoint. The forest
  *     is star-shaped (every node points at a local min), so rounds ≈
  *     number of partition boundaries a component spans (1 for the
  *     harness sizes; bounded by maxIter for adversarial chains).
  *     Pointer-doubling was measured slower here — near-dup clusters
  *     are shallow, and the extra self-join per round costs more than
  *     the rounds it saves.
  *
  * Parallelism is right-sized from the measured edge count (one
  * partition per ~500k edges): label propagation on a 3k-edge harness
  * graph runs as single-task stages instead of 32-task stages — the
  * per-round fixed cost, not the data, dominates below millions of
  * edges. The same code picks hundreds of partitions at cluster scale.
  */
object Components {

  private val EdgesPerPartition = 500000L

  /** `edges`: (src, dst) long pairs, undirected (either orientation).
    * Returns (id, component) where component = min id reachable.
    *
    * The returned DataFrame is backed by the loop's final
    * localCheckpoint: ONE round's blocks, freed by the ContextCleaner
    * once the Dataset is GC'd (`unpersist()`/`clearCache()` cannot
    * touch checkpoint blocks — superseded rounds inside the loop are
    * freed explicitly via [[org.apache.spark.sql.graftshim.Shim
    * .freeLocalCheckpoint]]). Harness callers materialize it into a
    * memo parquet immediately, so the residency is transient. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponentsStats(edges, maxIter)._1

  /** [[connectedComponents]] plus the number of label-propagation
    * rounds phase 2 ran (0 when a single-partition contraction solved
    * the graph outright). `edgesPerPartition` is overridable so a spec
    * can force a small graph across many partitions and PIN the
    * convergence behavior on adversarial chain-structured components —
    * the shape where rounds ≈ partition boundaries spanned, which is
    * what must stay bounded at 100× scale. */
  private[graft] def connectedComponentsStats(edges: DataFrame,
      maxIter: Int = 20,
      edgesPerPartition: Long = EdgesPerPartition): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].persist(StorageLevel.MEMORY_AND_DISK)
    val m = e0.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      m / edgesPerPartition + 1)).toInt

    // Phase 1: per-partition union-find → spanning forest (node, root).
    val forest = e0.coalesce(parts).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (s, d) =>
        parent.getOrElseUpdate(s, s)
        parent.getOrElseUpdate(d, d)
        val rs = find(s); val rd = find(d)
        if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
      }
      val keys = parent.keys.toArray // snapshot: find() path-compresses
      keys.iterator.map(k => (k, find(k)))
    }.toDF("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    e0.unpersist()

    // A single-partition contraction saw every edge, so its forest is
    // already the exact component map — no propagation to run.
    if (parts == 1)
      return (forest.select(col("src").as("id"), col("dst").as("component")), 0)

    // Phase 2: min-label propagation over the symmetric forest.
    val sym = forest
      .unionAll(forest.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.groupBy(col("src").as("id"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("component").as("c_src")), "src")
        .groupBy(col("dst").as("id")).agg(min("c_src").as("nbr_min"))
      // localCheckpoint, not persist: `labels` feeds BOTH join inputs,
      // so the logical plan doubles per round — persist() truncates
      // re-execution but not the plan, and an adversarial chain
      // component (rounds ≈ partition boundaries) OOMs the DRIVER on
      // plan strings alone after ~15 rounds (found by the DedupSpec
      // convergence pin). Eager lineage truncation caps the plan at one
      // round's depth; losing an executor mid-loop restarts the loop,
      // the standard trade every iterative graph engine makes.
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("new_component"), col("component").as("old_component"))
        .localCheckpoint(true)
      val changed = next.filter(col("new_component") =!= col("old_component")).count()
      // round 1's `labels` is a plain persist (real unpersist); later
      // rounds are localCheckpoints, whose blocks Dataset.unpersist
      // CANNOT free (CacheManager no-op) — release the superseded
      // round's RDD blocks explicitly, AFTER `next` eagerly
      // materialized from them. freeLocalCheckpoint matches only a
      // ROOT-level LogicalRDD (through Projects), so the round-1 call —
      // whose plan root is the aggregate over sym/forest, with the
      // caller's `edges` (possibly itself checkpoint-backed) deeper
      // inside — is a guaranteed no-op rather than a traversal that
      // could free an input's blocks.
      labels.unpersist()
      org.apache.spark.sql.graftshim.Shim.freeLocalCheckpoint(labels)
      labels = next.select(col("id"), col("new_component").as("component"))
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    forest.unpersist()
    (labels, iter)
  }

  /** Unordered cluster map, materialized once per (session, dir): the
    * component computation consumes the memoized pair table and is
    * itself memoized, so keeper selection and any other cluster-derived
    * query join against a tiny parquet table instead of re-running
    * pairs → union-find. */
  private[operators] def clusterTable(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, "dedup_clusters") {
      val pairs = Dedup.minhashPairs(spark, dir)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"),
          (col("id") === col("component")).as("is_keeper"))
    }

  /** Dedup clustering end-to-end: minhash near-dup pairs → components →
    * per-doc cluster assignment with the keeper (min doc_id) marked. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterTable(spark, dir).orderBy("cluster_id", "doc_id")

  /** SEMANTIC clusters — connected components over the kNN graph's
    * above-threshold edges ([[graft.operators.Similarity.knnGraph]]):
    * the SemDeDup grouping step, upgraded from "pairs within one coarse
    * cell" ([[graft.operators.Similarity.semanticNearDupPairs]]) to the
    * graph the probes actually see — kNN edges cross coarse-cell
    * boundaries (each vector probes `nprobe` lists), so chains of
    * near-dups that straddle cells land in ONE cluster here where the
    * in-cell sweep splits them. Same union-find machinery and output
    * contract as [[dedupClusters]] (min-id keeper); only vectors with a
    * qualifying edge appear. The threshold filters the ROUNDED cosine
    * (the graph's output column) so the oracle's filter is literally
    * identical. The memo key carries the FULL parameter vector — the
    * underlying graph's (k, nprobe, iters) as well as the threshold —
    * so two parameterizations can never collide (r8 finding #3). */
  def semanticClusters(spark: SparkSession, dir: String,
      minCos: Double = 0.4, k: Int = 3, nprobe: Int = 4,
      iters: Int = 2): DataFrame =
    Memo.table(spark, dir,
      s"semantic_clusters_${k}_${nprobe}_${iters}_$minCos") {
      val edges = Similarity.knnGraph(spark, dir, k, nprobe, iters)
        .filter(col("cos") >= minCos)
        .select(col("q_id").as("src"), col("vec_id").as("dst"))
      connectedComponents(edges)
        .select(col("id").as("vec_id"), col("component").as("cluster_id"),
          (col("id") === col("component")).as("is_keeper"))
    }.orderBy("cluster_id", "vec_id")

  /** Quality-aware canonical selection: instead of "keep min doc_id",
    * keep the best document per cluster (longest content, doc_id
    * tie-break) — the policy real training pipelines use so dedup
    * doesn't discard the richest copy.
    *
    * The per-cluster argmax is a BOUNDED-STATE aggregate
    * (`max(struct(n_chars, -doc_id))` — lexicographic struct order is
    * exactly "longest, then lowest id"; O(1) state per cluster,
    * map-side combined), never a per-cluster `row_number` window:
    * near-dup cluster sizes are unbounded, and a boilerplate-saturated
    * corpus (the scenario `minhash_band_saturation` exists to flag) can
    * put a large fraction of the corpus in ONE cluster = one giant
    * window partition. The one-row-per-cluster winner table broadcasts
    * back for the keeper flag — the same aggregate-plus-broadcast
    * rewrite the quota family uses ([[graft.operators.Sampling]]). */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val map = clusterTable(spark, dir).select("doc_id", "cluster_id")
    // exact CLUSTER count (not clustered-doc rows) for the broadcast
    // cap — a one-column scan of the memoized parquet, so near-free
    // here, and only the production path pays it: kernel/probe callers
    // pass no count and ride AQE (see keepBestFrom)
    val nClusters = map.select("cluster_id").distinct().count()
    keepBestFrom(map,
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars")),
      knownClusters = Some(nClusters))
  }

  /** Cluster count up to which the winner table is force-broadcast.
    * The winner table has one row per CLUSTER; below the cap the
    * winner join broadcasts (the mega-cluster case: few clusters, one
    * huge — broadcast makes the skew irrelevant); above it the join is
    * left to AQE, which still broadcasts a small-at-runtime winner
    * table and skew-splits a big one — a FORCED broadcast there would
    * collect O(#clusters) rows to the driver, the 10^9-tiny-clusters
    * OOM. Same adaptive discipline as Dedup's `VerifyIsinMaxIds`
    * IN-pushdown cap. */
  private val KeepBestBroadcastMaxClusters = 4000000L

  /** The keeper-selection kernel over an explicit (doc_id, cluster_id)
    * map and a (doc_id, n_chars) doc slice — split out so the scale
    * probe can feed it an adversarial cluster map (one cluster = half
    * the corpus) without fabricating a pair table that banding's skew
    * caps would refuse to produce.
    *
    * `knownClusters` gates the forced winner broadcast: the MEMOIZED
    * production path ([[dedupKeepBest]]) passes its exact cluster
    * count (near-free off the parquet map); ad-hoc callers whose
    * cluster map is an unevaluated lineage pass None — an eager count
    * here would compute that whole lineage twice per call, so they
    * skip the fast path and let AQE pick broadcast-vs-shuffle from the
    * winner table's RUNTIME size (correct either way). */
  private[graft] def keepBestFrom(clusters: DataFrame,
      docs: DataFrame, knownClusters: Option[Long] = None): DataFrame = {
    val joined = clusters.join(docs, "doc_id")
    val best = joined.groupBy("cluster_id")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id")))
        .as("b"))
      .select(col("cluster_id"), (-col("b.neg_id")).as("keep_doc_id"))
    val winners =
      if (knownClusters.exists(_ <= KeepBestBroadcastMaxClusters))
        broadcast(best)
      else best
    joined.join(winners, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("n_chars"),
        col("keep_doc_id"),
        (col("doc_id") === col("keep_doc_id")).as("is_keeper"))
      .orderBy("cluster_id", "doc_id")
  }
}
