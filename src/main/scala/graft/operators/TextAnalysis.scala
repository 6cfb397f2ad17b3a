package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => T}

/** Document-corpus text analysis queries (SURVEY.md §2.9 E5): language
  * ID, quality scoring, token statistics, term frequencies and
  * fingerprints — all narrow maps + one hash aggregate where grouped,
  * no joins, fully codegen-friendly.
  */
object TextAnalysis {

  /** Per-doc language-ID heuristic vs the labeled lang column. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        T.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Per-doc quality signals (flattened struct). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), T.qualityStruct(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_chars").as("n_chars"),
        col("q.n_tokens").as("n_tokens"),
        round(col("q.avg_token_len"), 6).as("avg_token_len"),
        round(col("q.punct_ratio"), 6).as("punct_ratio"),
        round(col("q.digit_ratio"), 6).as("digit_ratio"),
        round(col("q.stopword_ratio"), 6).as("stopword_ratio"))
      .orderBy("doc_id")

  /** Token counts: whitespace tokens, distinct tokens, BPE-ish subword
    * estimate. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(T.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(T.tokens(col("text")))).cast("long").as("n_distinct"),
        T.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
      .orderBy("doc_id")

  /** Corpus term frequencies: top 50 tokens by count (explode → one
    * hash-aggregate shuffle; at 100 TB the same plan with a higher
    * shuffle partition count — no driver-side collection). */
  def termFrequencies(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(50)

  /** Document fingerprints: order-invariant md5 fingerprint (detects
    * "same content, shuffled tokens" duplicates; oracle-checkable). The
    * order-sensitive rolling hash is xxhash64-based (no DuckDB twin) and
    * is exercised in TextSpec instead. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
}
