package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Hash60 expression must be bit-identical to the composed
  * conv(substring(md5)) form — that identity is what keeps the DuckDB
  * oracles valid for the whole hash family. */
class Hash60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hash60 == conv(substring(md5,1,15),16,10) on varied inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val strs = Seq("", "a", "hello world", "käse-zh-你好", "\n\t|:") ++
      Seq.fill(2000)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq.fill(100)(rnd.nextString(20)) // arbitrary unicode
    val df = strs.toDF("s")
    val bad = df.select(
        graft.functions.Hash60.hash60(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(bad.count() == 0)
  }

  test("hash60 matches driver-side MessageDigest on the plane formula") {
    // the scala-side planeComponent and SQL-side hash must stay in sync
    import spark.implicits._
    val df = Seq("plane:0:0", "plane:15:63").toDF("s")
    val got = df.select(graft.functions.Hash60.hash60(col("s")))
      .collect().map(_.getLong(0))
    val exp = Seq("plane:0:0", "plane:15:63").map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    assert(got.toSeq == exp)
  }
}
