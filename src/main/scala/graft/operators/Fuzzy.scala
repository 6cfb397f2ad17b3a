package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hash60.hash60

/** Approximate string matching (entity resolution / data cleaning):
  * edit-distance join WITHOUT the all-pairs explosion. The classic
  * blocked shape — candidates pair only within a cheap blocking key
  * (prefix + length band here), then the exact `levenshtein` verifies
  * inside the block. Cost is one equi-join on the block key plus
  * per-candidate O(len²) distance — the same candidates-then-verify
  * economics as the LSH near-dup family, applied to short strings.
  *
  * At 100 TB: the block key is groupable/shuffle-friendly; hot blocks
  * (very common prefixes) would salt or cap exactly like the minhash
  * mega-buckets. A production matcher adds more recall passes (e.g. a
  * second blocking on suffix) — each pass is the same plan.
  */
object Fuzzy {

  /** Deterministic "typo" of a name: one character (at an md5-chosen
    * position ≥ 3, so the 2-char blocking prefix survives) replaced by
    * 'q' — the harness's stand-in for dirty upstream strings, chosen so
    * the DuckDB oracle can regenerate the identical probe set. */
  def typo(name: Column): Column = {
    val p = (pmod(hash60(name), (length(name) - 2).cast("long")) + lit(3)).cast("int")
    concat(name.substr(lit(1), p - 1), lit("q"), name.substr(p + 1, lit(100000)))
  }

  /** Harness query `fuzzy_match`: a deterministic probe set (every
    * 40th part's name, typo'd) matched back against the part table —
    * block on (2-char prefix, exact length), verify `levenshtein <= 1`.
    * Emits every in-block match with its distance; the true source row
    * is found (distance 1, or 0 when the typo'd char equaled 'q') plus
    * any genuine same-block near-collisions. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        substring(col("p_name"), 1, 2).as("blk_pre"),
        length(col("p_name")).as("blk_len"))
    val probes = parts.filter(col("p_partkey") % 40 === 0)
      .select(col("p_partkey").as("probe_key"),
        typo(col("p_name")).as("probe_name"),
        col("blk_pre"), col("blk_len"))
    // threshold form = banded DP: O(len·k) per candidate instead of
    // O(len²); returns -1 above the bound, so the filter keeps [0, k]
    probes.join(parts, Seq("blk_pre", "blk_len"))
      .withColumn("dist",
        levenshtein(col("probe_name"), col("p_name"), 1).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .select("probe_key", "probe_name", "p_partkey", "p_name", "dist")
      .orderBy("probe_key", "p_partkey")
  }
}
