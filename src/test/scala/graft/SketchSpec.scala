package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftBloom, TDigest, TDigestQuantiles}
import graft.operators.Relational

/** Bloom-filter join pruning + t-digest quantile sketch. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("countMinFreq: estimates never underestimate, probes are the " +
      "true heavy hitters, and a wider sketch only tightens") {
    val rows = graft.operators.TextAnalysis
      .countMinFreq(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("freq"),
        r.getAs[Long]("est"), r.getAs[Long]("overestimate")))
    assert(rows.length == 30)
    rows.foreach { case (t, f, e, o) =>
      assert(e >= f && o == e - f, s"CM underestimated '$t'")
    }
    // monotonicity in width: more buckets -> fewer collisions -> the
    // per-token estimate can only stay or drop
    val wide = graft.operators.TextAnalysis
      .countMinFreq(spark, TestSpark.sf, width = 4096).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est")).toMap
    rows.foreach { case (t, _, e, _) =>
      assert(wide(t) <= e, s"wider sketch worsened '$t'")
    }
  }

  test("countMinFreq: the quantitative CM guarantee — overestimate " +
      "<= (e/width)·N with frequency >= 1 − e^-depth, measured over " +
      "the whole Zipf token stream at two widths") {
    // the claim a user actually sizes the sketch by (Cormode &
    // Muthukrishnan 2005): P[est − freq > ε·N] <= δ with ε = e/width,
    // δ = e^−depth, N the stream length. Probe EVERY vocabulary token
    // (topN ≫ vocab) so the violation rate has statistical mass; the
    // corpus token distribution is the Zipf-ish stream the sketch is
    // built for, heavy hitters and tail both probed.
    val depth = 4
    var narrowCollides = false
    // width 16 forces real collisions even on the small-SF vocabulary
    // (distinct tokens ≫ 16), width 1024 is the production-ish shape
    Seq(16, 1024).foreach { w =>
      val rows = graft.operators.TextAnalysis
        .countMinFreq(spark, TestSpark.sf, depth = depth, width = w,
          topN = 1000000)
        .collect()
        .map(r => (r.getAs[Long]("freq"), r.getAs[Long]("overestimate")))
      val n = rows.map(_._1).sum // probes cover the vocab, so Σfreq = N
      val bound = math.E / w * n
      val violations = rows.count(_._2.toDouble > bound)
      val rate = violations.toDouble / rows.length
      assert(rate <= math.exp(-depth.toDouble),
        s"width $w: $violations/${rows.length} tokens exceed ε·N = $bound " +
          s"(rate $rate > δ = ${math.exp(-depth.toDouble)})")
      if (w == 16) narrowCollides = rows.exists(_._2 > 0)
    }
    // non-vacuity: the narrow sketch actually collides somewhere, so
    // the bound above was tested against real overestimates
    assert(narrowCollides, "width-16 sketch had zero collisions — " +
      "the bound check never saw an overestimate")
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val keys = (0L until 5000L).map(_ * 7 + 3)
    val f = GraftBloom.create(keys, fpp = 0.01)
    assert(keys.forall(f.mightContain))
    val negatives = (0L until 20000L).map(_ * 7 + 5) // disjoint residue
    val fpRate = negatives.count(f.mightContain).toDouble / negatives.size
    assert(fpRate < 0.05, s"fp rate $fpRate")
  }

  test("bloom join pruning: identical result to the plain join, rows pruned") {
    val dim = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_name"))
    val plain = Tables.load(spark, sf, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
    val pruned = Relational.bloomJoinPrune(spark, sf)
    assert(pruned.collect().toSeq == plain.collect().toSeq)
    // the probe side actually shrinks before the join
    val bloom = GraftBloom.fromColumn(dim, "c_custkey")
    val total = Tables.load(spark, sf, "orders").count()
    val kept = Tables.load(spark, sf, "orders")
      .filter(GraftBloom.might_contain(col("o_custkey"), bloom)).count()
    assert(kept < total / 2, s"bloom kept $kept of $total")
  }

  test("bloom executor-side build matches the driver-side build bit for bit") {
    import spark.implicits._
    val keys = (0L until 5000L).map(_ * 7 + 3)
    val df = keys.toDF("k").repartition(8)
    val distributed = GraftBloom.fromColumn(df, "k")
    val local = {
      // size from the same HLL estimate fromColumn uses, so the arrays
      // are comparable bit for bit
      val n = df.agg(org.apache.spark.sql.functions
        .approx_count_distinct(col("k"))).head.getLong(0)
      val (words, numH) = GraftBloom.sizing(n, 0.01)
      val bits = new Array[Long](words)
      keys.foreach(GraftBloom.set(bits, numH, _))
      new GraftBloom.Filter(bits, numH)
    }
    // identical sizing input → identical arrays; merge order across the
    // 8 partitions must not matter (OR-idempotent)
    assert(distributed.numHashes == local.numHashes)
    assert(distributed.bits.sameElements(local.bits))
    // duplicates must not inflate the filter: 10x-duplicated keys size
    // the same power-of-two array as the distinct set
    val dup = GraftBloom.fromColumn(
      (0 until 10).flatMap(_ => keys).toDF("k").repartition(8), "k")
    assert(dup.bits.length == distributed.bits.length)
  }

  test("t-digest accepts integer/long/decimal columns (analysis-time widening)") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("x")
    val r = df.agg(TDigest.t_digest_quantiles(col("x"), Seq(0.5)).as("td"))
      .collect().head.getSeq[Double](0)
    assert(math.abs(r.head - 500.0) < 15.0, s"p50=$r")
    val bad = intercept[Exception] {
      df.select(lit("s").as("s")).agg(
        TDigest.t_digest_quantiles(col("s"), Seq(0.5))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("numeric"), bad.getMessage)
  }

  test("SQL registry: bottom_k and t_digest callable from SQL text with literal config args") {
    graft.functions.GraftFunctions.registerTemp(spark)
    val r = spark.sql("""
      SELECT bottom_k(struct(CAST(id AS STRING) AS sort_key, id), 3) AS s,
             t_digest_quantiles(CAST(id AS DOUBLE), array(0.5D), 100)[0] AS p50
      FROM range(10)""").collect().head
    val sample = r.getSeq[org.apache.spark.sql.Row](0)
    assert(sample.map(_.getString(0)) == Seq("0", "1", "2"))
    assert(math.abs(r.getDouble(1) - 4.5) <= 1.0, s"p50=${r.getDouble(1)}")
    // non-literal config args are rejected at resolution, not silently
    val err = intercept[Exception] {
      spark.sql("SELECT bottom_k(struct('a' AS sort_key, id), CAST(id AS INT)) FROM range(3)").collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("t-digest: within 1% of exact on uniform, 2.5% on log-normal") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val uniform = Seq.fill(50000)(rnd.nextDouble() * 1000.0)
    val lognorm = Seq.fill(50000)(math.exp(rnd.nextGaussian() * 1.5 + 3.0))
    for ((data, tol) <- Seq((uniform, 0.01), (lognorm, 0.025))) {
      val df = data.toDF("x").repartition(8)
      val r = df.agg(
        TDigest.t_digest_quantiles(col("x"), Seq(0.5, 0.9, 0.99)).as("td"),
        expr("percentile(x, array(0.5, 0.9, 0.99))").as("exact"))
        .collect().head
      val td = r.getSeq[Double](0)
      val exact = r.getSeq[Double](1)
      td.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < tol, s"td $a exact $e") }
    }
  }

  test("t-digest: merge path (partial aggregation) ~= single-buffer result") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(20000)(rnd.nextDouble() * 100.0)
    val one = new graft.functions.TDigestBuf(200)
    data.foreach(one.add)
    val parts = data.grouped(1000).map { chunk =>
      val b = new graft.functions.TDigestBuf(200); chunk.foreach(b.add); b
    }
    val merged = parts.reduce { (a, b) => a.absorb(b); a }
    for (q <- Seq(0.1, 0.5, 0.9, 0.99))
      assert(math.abs(merged.quantile(q) - one.quantile(q)) /
        one.quantile(q) < 0.01, s"q=$q")
  }

  test("t-digest memory: centroid count bounded by compression") {
    val rnd = new scala.util.Random(1)
    val b = new graft.functions.TDigestBuf(100)
    (1 to 100000).foreach(_ => b.add(rnd.nextDouble()))
    b.compress()
    assert(b.centroids.length <= 102, s"${b.centroids.length} centroids")
  }
}
