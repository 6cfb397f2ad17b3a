package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hash60.hash60
import graft.functions.{TextFunctions => T}

/** The end-to-end CURATION COMPOSITION — the one query a real
  * training-data user runs: raw page → extracted main text → language
  * ID → per-language quality cut → extracted-content dedup keeper →
  * manifest flags. Each stage is an operator this engine already
  * proves in isolation ([[Html.extract]], [[TextAnalysis]] langid /
  * quality score, [[RankCut.topFlag]], the exact-fingerprint keeper,
  * [[Sampling.splitLabel]]); this query proves they COMPOSE through
  * the memo discipline with no hidden re-computation.
  *
  * Composition shape (the no-repeated-tokenize contract):
  *   - stage 1–3 (extract → langid → quality score → fingerprint) are
  *     ONE narrow projection over the documents scan, materialized
  *     once per dataset ([[Memo.table]]) — every downstream consumer
  *     (the RankCut threshold/tie branches, the dedup keeper
  *     aggregate, the final assembly) re-reads the narrow 4-column
  *     parquet instead of re-running the extractor or tokenizer;
  *   - the quality cut is [[RankCut.topFlag]] over (pred_lang, score)
  *     — aggregate-sized windows, never a per-language corpus window;
  *   - the dedup keeper is min(doc_id) per extracted-text fingerprint
  *     AMONG quality-kept docs — one hash aggregate + one equi-join
  *     on the fingerprint (the [[Dedup]] exact-dedup shape; dedup on
  *     EXTRACTED text groups pages whose markup differs only in
  *     boilerplate — nav ids, ad blocks — the crawl-dedup norm).
  *
  * 100 TB: one corpus read for the memo build (narrow, zero
  * shuffles), then every stage runs over the 4-column memo — two
  * bounded-window threshold searches, one fingerprint hash-agg/join,
  * one broadcast threshold join. Nothing re-derives, nothing
  * re-tokenizes; cost ≈ sum of stage costs by construction. */
object Curation {

  /** Keep fraction of the per-language quality cut. */
  val KeepFrac = 0.5

  /** Per-doc curation enrichment of a raw documents frame — ONE
    * narrow projection: extracted main text, predicted language,
    * quality score ([[TextAnalysis.compositeScore]] — the ONE proven
    * definition, shared with `quality_quantile_filter`), and the
    * extracted-content fingerprint. PUBLIC SEAM: the batch memo build
    * below and the streaming ingest enrichment
    * ([[graft.streaming.StreamingBackfill.fullIngestLoop]]) are this
    * same definition, so stream ≡ batch by construction. */
  def enriched(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        Html.extract(Html.htmlOf(col("doc_id"), col("text"))).as("ext"))
      .select(col("doc_id"), col("ext"),
        T.langId(col("ext")).as("pred_lang"),
        TextAnalysis.compositeScore(col("ext")).as("score"),
        hash60(col("ext")).as("fp"))

  /** Stage 1–3 memo: (doc_id, ext, pred_lang, score, fp) — extract
    * ONCE, derive everything narrow in the same projection. Consumers
    * that don't need the extracted text itself (the exact-fp manifest)
    * SELECT around it — parquet column pruning keeps their serve reads
    * as narrow as the old 4-column memo; the near-dup twin reads `ext`
    * to shingle the extracted content without re-running the
    * extractor. */
  private def base(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, "curation_base") {
      enriched(Tables.load(spark, dir, "documents"))
    }

  /** Harness query `curation_pipeline`: per-doc manifest of the full
    * chain — predicted language, extracted-text quality score,
    * per-language quality-cut flag, extracted-content dedup-keeper
    * flag, 90/5/5 split, and the final `selected` verdict: the
    * TRAINING-selection decision (keeper AND split = 'train') — the
    * row set a training run actually reads, distinct from the keeper
    * flag (val/test keepers stay unselected so eval sets never leak
    * into training). */
  /** The quality-cut flags, materialized ONCE PER QUERY (per-call
    * scratch): both manifest queries reference the cut TWICE (the
    * keeper aggregate and the final assembly join), and unmaterialized
    * each reference re-ran the whole RankCut threshold/tie plan over
    * the base memo (r17 measurement: the duplicated cut dominated the
    * serve). Per-call scratch, NOT a dataset-keyed memo (r18 revert):
    * the cut is this query's own declared computation, so every
    * invocation must pay it once — the materialization only removes
    * the intra-query duplication. */
  private def qualityCut(spark: SparkSession, dir: String,
      keep: Double): DataFrame =
    Memo.scratch(spark, s"curation_cut_$keep") {
      RankCut.topFlag(
        base(spark, dir).select("doc_id", "pred_lang", "score", "fp"),
        "pred_lang", "score", "doc_id",
        n => floor(lit(1.0) + lit(keep) * (n - 1)), "quality_kept")
    }

  def curationPipeline(spark: SparkSession, dir: String,
      keep: Double = KeepFrac): DataFrame = {
    val cut = qualityCut(spark, dir, keep)
    val keepers = cut.filter(col("quality_kept"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"))
    // left join: an fp with no quality-kept member has keep_id null;
    // quality_kept=false AND null = false (never null) on both engines
    cut.join(keepers, Seq("fp"), "left")
      .withColumn("dedup_keeper",
        col("quality_kept") && col("doc_id") === col("keep_id"))
      .withColumn("split",
        Sampling.splitLabel(Sampling.splitBucket(col("doc_id"))))
      .select(col("doc_id"), col("pred_lang"), col("score"),
        col("quality_kept"), col("dedup_keeper"), col("split"),
        (col("dedup_keeper") && col("split") === "train").as("selected"))
      .orderBy("doc_id")
  }

  /** MinHash exact-Jaccard verification threshold of the near-dup
    * manifest (the [[Dedup.minhashPairs]] default). */
  val NearDupThreshold = 0.5

  /** Near-dup cluster map over the EXTRACTED text, memoized per
    * dataset: per-row banded LSH → skew-capped buckets → verified
    * pairs ([[Dedup.minhashPairsFrom]]) → union-find components
    * ([[Components.connectedComponents]]). Reads `ext` off the
    * [[base]] memo — the extractor never re-runs. Only docs appearing
    * in ≥ 1 verified pair have a row; singletons resolve to their own
    * id at join time. */
  private def neardupClusters(spark: SparkSession,
      dir: String): DataFrame =
    Memo.table(spark, dir, "curation_neardup_clusters") {
      val ext = base(spark, dir).select(col("doc_id"),
        col("ext").as("text"))
      val pairs = Dedup.minhashPairsFrom(ext, NearDupThreshold)
      Components.connectedComponents(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    }

  /** Harness query `curation_pipeline_neardup`: the crawl-dedup form
    * of the manifest — instead of the exact-fingerprint keeper, the
    * dedup stage is MinHash-banded NEAR-dup clusters over the
    * extracted text (Lee et al. 2022's dedup norm: boilerplate-
    * stripped near-duplicates, not just byte-identical content) with
    * QUALITY-AWARE keeper selection: per cluster, keep the best
    * (quality_kept first, then highest score, then lowest doc_id)
    * member — the [[Components.dedupKeepBest]] policy with the
    * curation score as the quality signal.
    *
    * 100 TB: the cluster map is a memoized parquet built once per
    * dataset (banded LSH + union-find — no all-pairs join anywhere);
    * the serve is the exact-fp manifest's shape plus one equi-join
    * against that map and one BOUNDED-STATE per-cluster argmax
    * (`max(struct(kept, score, -id))`, map-side combined — never a
    * per-cluster row window, which a boilerplate-saturated corpus
    * turns into one giant task). */
  def curationPipelineNearDup(spark: SparkSession, dir: String,
      keep: Double = KeepFrac): DataFrame = {
    // same memoized cut as the exact-fp manifest (fp is just not read)
    val cut = qualityCut(spark, dir, keep)
      .select("doc_id", "pred_lang", "score", "quality_kept")
    val cl = cut
      .join(neardupClusters(spark, dir), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    // bounded argmax: quality-kept members beat unkept ones, then
    // score desc, then min doc_id — lexicographic struct max, O(1)
    // state per cluster; winner table is one row per cluster, AQE
    // broadcasts it when small (keepBestFrom discipline: no forced
    // broadcast off an unevaluated lineage)
    val win = cl.groupBy("cluster_id")
      .agg(max(struct(col("quality_kept").cast("int").as("k"),
        col("score").as("s"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("cluster_id"), (-col("b.nid")).as("keep_doc_id"))
    cl.join(win, "cluster_id")
      .withColumn("dedup_keeper",
        col("quality_kept") && col("doc_id") === col("keep_doc_id"))
      .withColumn("split",
        Sampling.splitLabel(Sampling.splitBucket(col("doc_id"))))
      .select(col("doc_id"), col("pred_lang"), col("score"),
        col("quality_kept"), col("cluster_id"), col("dedup_keeper"),
        col("split"),
        (col("dedup_keeper") && col("split") === "train").as("selected"))
      .orderBy("doc_id")
  }
}
