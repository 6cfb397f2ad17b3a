package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway diagnostic for the vecdegen-s3 sim_topk_ivfpq_res fork:
// dumps the engine-side residual chain intermediates for DuckDB diff.
object DebugResidual {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    operators.Quantize.residualCodebooks(spark, dir)
      .select(col("sub"), col("c_id"),
        concat_ws(",", transform(col("cv"), x => format_string("%.17e", x)))
          .as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/pqr_cb")
    // one Lloyd iteration by hand over the same inputs, to bisect:
    // seed → a1 (first assignment)
    operators.Quantize.debugLloydStages(spark, dir, out)
    operators.Quantize.pqResidualIndexTable(spark, dir)
      .select("c_id", "vec_id", "sub", "code")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/pqr_codes")
    operators.Similarity.assignmentTable(spark, dir, 2)
      .select("vec_id", "c_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/assign")
    // the raw residual frame (private) via its public consumers'
    // building blocks: v − centroid per assignment
    val cents = operators.Similarity.trainCentroids(spark, dir, iters = 2)
      .select(col("c_id"), col("c_v"))
    operators.Similarity.assignmentTable(spark, dir, 2)
      .select("vec_id", "c_id", "v")
      .join(broadcast(cents), "c_id")
      .select(col("vec_id"), concat_ws(",",
        transform(zip_with(col("v"), col("c_v"), (a, b) => a - b),
          x => format_string("%.17e", x))).as("r"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/resvec")
    spark.stop()
  }
}
