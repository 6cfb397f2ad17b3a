package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Vectors => V}

/** Embedding storage compression: symmetric int8 quantization — the
  * standard 4× shrink for ANN corpora (scale = 127/max|x| per vector,
  * q = round(x·scale)). A narrow map (per-element HOFs are fine here:
  * every lambda references only its own element and row-level scalars).
  * Emits the per-vector scale, a quantized sample, and the max absolute
  * reconstruction error — oracle-checked against DuckDB list math.
  */
object Quantize {

  def int8Quantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val maxAbs = array_max(transform(col("v"), x => abs(x)))
    val scale = lit(127.0) / maxAbs
    emb
      .withColumn("scale", scale)
      .withColumn("maxerr",
        array_max(transform(col("v"),
          x => abs(x - round(x * col("scale")) / col("scale")))))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        round(element_at(col("v"), 1) * col("scale")).cast("int").as("q0"),
        round(element_at(col("v"), 2) * col("scale")).cast("int").as("q1"),
        round(element_at(col("v"), 3) * col("scale")).cast("int").as("q2"),
        round(col("maxerr"), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }
}
