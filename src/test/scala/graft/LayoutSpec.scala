package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Layout

/** Z-order layout: the pruning claim, executed — per-file min-max
  * extents (what a reader's stats-based pruning sees) under a z-value
  * clustering vs a single-column clustering of the same data. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("z-order files prune box queries on BOTH dimensions; stripes on one") {
    val df = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val zdir = Files.createTempDirectory("zlay").toString
    val xdir = Files.createTempDirectory("xlay").toString
    Layout.writeClustered(df, zdir, Layout.zValue(col("x"), col("y"), 8), 16)
    Layout.writeClustered(df, xdir, col("x"), 16)
    assert(spark.read.parquet(zdir).count() === 65536L)

    val ze = Layout.fileExtents(spark, zdir, "x", "y").cache()
    val xe = Layout.fileExtents(spark, xdir, "x", "y").cache()

    // y-only box (x unconstrained): the x-striped layout can prune
    // NOTHING; z-order touches only the low-y row of tiles
    val (zy, ztot) = Layout.filesTouched(ze, 0, 255, 0, 31)
    val (xy, xtot) = Layout.filesTouched(xe, 0, 255, 0, 31)
    assert(ztot === 16L && xtot === 16L)
    assert(xy === xtot)
    assert(zy <= ztot / 2)

    // x-only box: z-order still prunes (the symmetric claim — one
    // layout serves both dimensions)
    val (zx, _) = Layout.filesTouched(ze, 0, 31, 0, 255)
    assert(zx <= ztot / 2)

    // tight 2-D box: close to a single tile
    val (zb, _) = Layout.filesTouched(ze, 0, 63, 0, 63)
    assert(zb <= 6)
    ze.unpersist(); xe.unpersist()
  }

  test("zValue interleaves bits (known cells) and orders like the curve") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x on odd bits, y on even: (1,0)→2, (0,1)→1, (1,1)→3, (255,255)→65535
    assert(rows === Seq(0L, 2L, 1L, 3L, 65535L))
  }

  test("native ZOrder64 expression equals the composed form on a full grid") {
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val diff = grid.select(
      Layout.zValue(col("x"), col("y"), 6).as("zn"),
      Layout.zValueComposed(col("x"), col("y"), 6).as("zc"))
      .filter(col("zn") =!= col("zc")).count()
    assert(diff === 0L)
  }
}
