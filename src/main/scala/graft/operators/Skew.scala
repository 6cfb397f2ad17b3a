package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for large⋈large joins on hot keys (the 100 TB
  * discipline item AQE's skew-join covers only for sort-merge sides it
  * can split): explicit key salting.
  *
  * The skewed (big) side gets a deterministic salt in [0, factor) from
  * a hash of the whole row — hot keys spread across `factor` shuffle
  * partitions. The other side is replicated `factor`× (explode of a
  * literal range — cost factor·|right|, chosen only when |right| is
  * modest but too big to broadcast). Join key becomes (key, salt).
  * Deterministic: no rand(), so retried tasks produce identical salts.
  */
object Skew {

  def saltBig(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_salt_b",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(factor.toLong)))

  def replicateSmall(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_salt_s",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))

  /** Inner equi-join with the hot-key spread: result ≡ plain join
    * (SkewSpec asserts equivalence). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, factor: Int = 8): DataFrame =
    saltBig(big, factor).join(replicateSmall(small, factor),
        col(bigKey) === col(smallKey) && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")

  /** Harness face of the salted join: lineitem (hot keys: one order =
    * up to 7 lines, and the join key has TPC-H's natural skew) ⋈ orders
    * subset. The salt never reaches the output, so the oracle is the
    * plain join. */
  def saltedJoinQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    saltedJoin(li, ord, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("o_orderpriority"))
      .orderBy("l_orderkey", "l_linenumber")
  }
}
