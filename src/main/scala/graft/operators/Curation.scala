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

  /** Stage 1–3 memo: (doc_id, pred_lang, score, fp) — extract ONCE,
    * derive everything narrow in the same projection. The quality
    * score is [[TextAnalysis.compositeScore]] over the extracted
    * text — the ONE proven definition, shared with
    * `quality_quantile_filter`. */
  private def base(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, "curation_base") {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          Html.extract(Html.htmlOf(col("doc_id"), col("text"))).as("ext"))
        .select(col("doc_id"),
          T.langId(col("ext")).as("pred_lang"),
          TextAnalysis.compositeScore(col("ext")).as("score"),
          hash60(col("ext")).as("fp"))
    }

  /** Harness query `curation_pipeline`: per-doc manifest of the full
    * chain — predicted language, extracted-text quality score,
    * per-language quality-cut flag, extracted-content dedup-keeper
    * flag, 90/5/5 split, and the final `selected` verdict
    * (quality-kept AND keeper). */
  def curationPipeline(spark: SparkSession, dir: String,
      keep: Double = KeepFrac): DataFrame = {
    val b = base(spark, dir)
    val cut = RankCut.topFlag(b, "pred_lang", "score", "doc_id",
      n => floor(lit(1.0) + lit(keep) * (n - 1)), "quality_kept")
    val keepers = cut.filter(col("quality_kept"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"))
    // left join: an fp with no quality-kept member has keep_id null;
    // quality_kept=false AND null = false (never null) on both engines
    cut.join(keepers, Seq("fp"), "left")
      .select(col("doc_id"), col("pred_lang"), col("score"),
        col("quality_kept"),
        (col("quality_kept") && col("doc_id") === col("keep_id"))
          .as("dedup_keeper"),
        Sampling.splitLabel(Sampling.splitBucket(col("doc_id")))
          .as("split"),
        (col("quality_kept") && col("doc_id") === col("keep_id"))
          .as("selected"))
      .orderBy("doc_id")
  }
}
