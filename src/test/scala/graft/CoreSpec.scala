package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.functions.Timestamps

/** Core relational + transform operators (SURVEY.md §2.1-§2.6). */
class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("backfill scan filters merchant and date range") {
    val rows = Relational.backfillScan(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("o_custkey") == 42L))
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.sameElements(keys.sorted))
  }

  test("semi covers all active merchants; anti complements within its window") {
    val n = Tables.load(spark, sf, "customer").count()
    val s = Relational.semiJoin(spark, sf).count()
    val active96 = Tables.load(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")) === 1996)
      .select("o_custkey").distinct()
      .join(Tables.load(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"), "left_semi")
      .count()
    val a = Relational.antiJoin(spark, sf).count()
    assert(s <= n && a + active96 == n)
  }

  test("numericMoments agrees with Spark's built-in stddev/corr within " +
      "float tolerance and stays in range") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Aggregates
      .numericMoments(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("stddev_qty"), r.getAs[Double]("corr_qty_price")))
      .toMap
    assert(got.nonEmpty)
    // independent check: the order-dependent built-ins land within
    // float noise of the decimal-exact moment derivation
    val ref = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("co"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { case (flag, (sd, co)) =>
      assert(co >= -1.0 && co <= 1.0 && sd > 0.0)
      val (rsd, rco) = ref(flag)
      assert(math.abs(sd - rsd) < 1e-6 && math.abs(co - rco) < 1e-6,
        s"$flag: ($sd,$co) vs built-in ($rsd,$rco)")
    }
  }

  test("pagination window returns exactly page rows with dense rn") {
    val rows = Relational.paginationWindow(spark, sf).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getAs[Long]("rn")).sorted.sameElements((201L to 300L)))
  }

  test("topk keeps at most 3 per merchant, descending amount") {
    val byM = Relational.topkPerGroup(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(byM.values.forall(_.length <= 3))
    byM.values.foreach { g =>
      val amts = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("o_totalprice"))
      assert(amts.zip(amts.tail).forall { case (x, y) => x >= y })
    }
  }

  test("multi-format timestamp parse covers all three branches, null on garbage") {
    val parsed = Timestamps.multiFormatParse(spark, sf)
    assert(parsed.filter(col("parsed_ts").isNull).count() == 0)
    import spark.implicits._
    val fx = Seq("2024-01-02 03:04:05.678901", "2024-01-02 03:04:05",
      "2024-01-02", "not a date").toDF("raw")
      .select(Timestamps.parseMulti(col("raw")).as("p")).collect()
    assert(fx(0).getTimestamp(0).toString == "2024-01-02 03:04:05.678901")
    assert(fx(1).getTimestamp(0).toString == "2024-01-02 03:04:05.0")
    assert(fx(2).getTimestamp(0).toString == "2024-01-02 00:00:00.0")
    assert(fx(3).isNullAt(0))
  }

  test("two-level decrypt round-trips the plaintext") {
    val got = Crypto.decryptTwoLevel(spark, sf)
      .select("o_orderkey", "priority")
    val want = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("envelope JSON is parseable and keyed") {
    val row = Envelope.eventEnvelope(spark, sf).limit(1).collect().head
    val parsed = spark.range(1).select(
      from_json(lit(row.getAs[String]("value")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("order_id",
            org.apache.spark.sql.types.LongType)))).as("j")).collect().head
    assert(!parsed.isNullAt(0))
    assert(row.getAs[String]("key").toLong >= 0)
  }

  test("pricing summary decimal sums are exact") {
    val r = Aggregates.pricingSummary(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("sum_disc_price") <= row.getAs[Double]("sum_base_price"))
      assert(row.getAs[Double]("sum_charge") >= row.getAs[Double]("sum_disc_price"))
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val r = Aggregates.approxDistinct(spark, sf).collect().head
    assert(r.getAs[Long]("exact_orders") > 0)
    assert(r.getAs[Boolean]("approx_ok"))
  }

  test("sessionize: session bounds ordered, counts sum to events") {
    val s = Aggregates.sessionize(spark, sf)
    val total = s.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
    assert(s.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("feed checksum certifies integrity and detects mutation") {
    import graft.pipeline.Backfill
    val feed = Backfill.run(spark, sf)
    val a = Backfill.feedChecksum(feed).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical recomputation → identical checksums (order-independent)
    val b = Backfill.feedChecksum(Backfill.run(spark, sf).repartition(13))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    // a single mutated value flips the entity's checksum
    val mutated = Backfill.feedChecksum(feed.withColumn("value",
      when(col("key") === "1", concat(col("value"), lit("x")))
        .otherwise(col("value")))).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mutated("orders") != a("orders")._2)
    assert(mutated("lineitem") != a("lineitem")._2)
  }

  test("backfill pipeline honors merchant list and range") {
    import graft.pipeline.Backfill
    val cfg = Backfill.Config(merchantIds = Some(Seq(1L, 42L)),
      start = Some("1995-01-01"), end = Some("1999-12-31"),
      entities = Backfill.defaultEntities.take(1))
    val feed = Backfill.run(spark, sf, cfg)
    assert(feed.count() > 0)
    val custs = feed.select(get_json_object(col("value"), "$.o_custkey")).distinct()
      .collect().map(_.getString(0).toLong).toSet
    assert(custs.subsetOf(Set(1L, 42L)))
  }

  test("driver contract: every query has an oracle, every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
