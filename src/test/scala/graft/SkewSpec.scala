package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftshim.Shim
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (1L to 5000L)
      .map(i => (if (i % 10 == 0) i % 7 else 999L, i)).toDF("k", "payload")
    val small = (0L to 1000L).map(i => (i, s"dim$i")).toDF("k2", "name")
    val salted = Skew.saltedJoin(big, small, "k", "k2", factor = 8)
      .select("k", "payload", "name").collect().toSet
    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("date-partitioned write prunes partitions at read") {
    val wh = java.nio.file.Files.createTempDirectory("partwh").toString
    Tables.load(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$wh/orders_part")
    val pruned = spark.read.parquet(s"$wh/orders_part")
      .filter(col("o_year") === 1996)
    val plan = Shim.executedPlan(pruned).toString
    // partition filter present, and only the 1996 directory is scanned
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"), plan)
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("o_year=1996")), files.take(3).mkString(","))
  }
}
