package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Minimal repro of the cluster-(2,9) Lloyd mean on vecdegen seed 3.
object DebugMean {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val xs = Seq(
      -5.11350130427822080e+16, -5.11350130427822080e+16,
      4.16680976685465600e+16, 9.34692190683136000e+14,
      9.34692190683136000e+14, 4.16680976685465600e+16,
      7.07884741516328960e+16, -5.11350130427822080e+16)
    val df = xs.toDF("x").repartition(3)
    val out = df.agg(
      sum(col("x").cast("decimal(38,18)")).as("sdec"),
      sum(col("x").cast("decimal(38,18)")).cast("string").as("sstr"),
      sum(col("x").cast("decimal(38,18)")).cast("string")
        .cast("double").as("sdbl"),
      (sum(col("x").cast("decimal(38,18)")).cast("string")
        .cast("double") / count(lit(1))).as("m"),
      (sum(col("x").cast("decimal(38,18)")).cast("string")
        .cast("double") / count(lit(1)))
        .cast("float").cast("double").as("mf"),
      (sum(col("x").cast("decimal(38,18)")).cast("double") /
        count(lit(1))).cast("float").cast("double").as("mf_old"))
      .collect().head
    println("SDEC=" + out.get(0))
    println("SSTR=" + out.get(1))
    println(f"SDBL=${out.getDouble(2)}%.17e")
    println(f"M=${out.getDouble(3)}%.17e")
    println(f"MF=${out.getDouble(4)}%.17e")
    println(f"MF_OLD=${out.getDouble(5)}%.17e")
    spark.stop()
  }
}
