package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hash60.hash60

/** Approximate string matching (entity resolution / data cleaning):
  * edit-distance join WITHOUT the all-pairs explosion. The classic
  * blocked shape — candidates pair only within cheap blocking keys,
  * then the exact `levenshtein` verifies inside the block. Cost is one
  * equi-join per blocking pass plus per-candidate O(len·k) distance —
  * the same candidates-then-verify economics as the LSH near-dup
  * family, applied to short strings.
  *
  * TWO blocking passes, because one is structurally blind: a (2-char
  * prefix, length) block misses any edit in the first two characters
  * by construction. The standard fix is a complementary pass — here
  * (2-char suffix, length) — and a substitution typo cannot corrupt
  * both ends of a name of 4+ chars (the blocks no longer overlap), so
  * the union of the two passes recovers every single-substitution
  * probe among the length >= 4 eligible set. Candidates are
  * deduped BEFORE the verify (a middle-of-string typo survives both
  * blocks) so each pair pays the DP at most once.
  *
  * At 100 TB: each block key is groupable/shuffle-friendly; hot blocks
  * (very common prefixes) would salt or cap exactly like the minhash
  * mega-buckets. More recall passes (length±1 bands for indels) are
  * each the same plan.
  */
object Fuzzy {

  /** Deterministic "typo" of a name: one character at an md5-chosen
    * position — ANYWHERE in the string, including the blocking prefix —
    * replaced by 'q'; the harness's stand-in for dirty upstream
    * strings, chosen so the DuckDB oracle can regenerate the identical
    * probe set. Callers must pre-filter degenerate names (the harness
    * uses length >= 4, mirrored in the oracle): hash60 is non-negative
    * so the pmod is safe for any non-empty string, but only at length
    * >= 4 can a single substitution never corrupt BOTH the 2-char
    * prefix and the 2-char suffix block — at length 3 the middle
    * character sits in both, so a typo there would evade both passes
    * and break the total-recall guarantee. */
  def typo(name: Column): Column = {
    val p = (pmod(hash60(name), length(name).cast("long")) + lit(1)).cast("int")
    concat(name.substr(lit(1), p - 1), lit("q"), name.substr(p + 1, lit(100000)))
  }

  /** Harness query `fuzzy_match`: a deterministic probe set (every
    * 40th part's name, typo'd anywhere) matched back against the part
    * table — block on (2-char prefix, exact length) UNION (2-char
    * suffix, exact length), dedup candidates, verify `levenshtein <= 1`.
    * Emits every in-block match with its distance; the true source row
    * is always found (distance 1, or 0 when the typo'd char equaled
    * 'q') plus any genuine same-block near-collisions. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    // spread before the per-row hashing/blocking work: part arrives as
    // one parquet split, which serialized both blocking passes on one
    // core (r17 measurement; guide §2.5 input skew — no-op at scale)
    val base = Tables.spread(spark,
        Tables.load(spark, dir, "part").select("p_partkey", "p_name"),
        col("p_partkey"))
      .filter(length(col("p_name")) >= 4)
      .select(col("p_partkey"), col("p_name"))
    val probes = base.filter(col("p_partkey") % 40 === 0)
      .select(col("p_partkey").as("probe_key"),
        typo(col("p_name")).as("probe_name"))
    // r17: the two blocking passes ride ONE join on an exploded,
    // PASS-TAGGED block key — (0, prefix, len) and (1, suffix, len) —
    // instead of two scans+joins unioned. The tag keeps the passes
    // disjoint (a probe's prefix must not match a base row's SUFFIX
    // block), so the candidate multiset is exactly the old union's;
    // `distinct()` collapses pairs that matched in both passes, as the
    // union form did. Same candidates, half the scans.
    def withBlocks(df: DataFrame, nameCol: String) = {
      val n = col(nameCol)
      df.withColumn("b", explode(array(
          struct(lit(0).as("pass"), substring(n, 1, 2).as("blk"),
            length(n).as("blk_len")),
          struct(lit(1).as("pass"), substring(n, -2, 2).as("blk"),
            length(n).as("blk_len")))))
        .select(df.columns.map(col) :+ col("b.pass").as("pass") :+
          col("b.blk").as("blk") :+ col("b.blk_len").as("blk_len"): _*)
    }
    withBlocks(probes, "probe_name")
      .join(withBlocks(base, "p_name"), Seq("pass", "blk", "blk_len"))
      .select("probe_key", "probe_name", "p_partkey", "p_name")
      .distinct()
      .withColumn("dist",
        levenshtein(col("probe_name"), col("p_name"), 1).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .orderBy("probe_key", "p_partkey")
  }
}
