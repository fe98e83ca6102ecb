package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet").cache()
  private lazy val toks =
    docs.select(explode(TextOps.tokens(col("text"))).as("token"))

  test("CMS never undercounts and bounds the sketch table size") {
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val sketch = Sketches.cmsBuild(toks, "token")
    assert(sketch.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth,
      "sketch must stay metadata-sized")
    val terms = exact.keys.toSeq.sorted.toDF("term")
    val est = Sketches.cmsEstimate(sketch, terms)
      .as[(String, Long)].collect().toMap
    // the CMS contract: estimate >= exact for EVERY term
    for ((t, n) <- exact)
      assert(est(t) >= n, s"CMS undercounted '$t': ${est(t)} < $n")
    // and with 4x1024 cells against this tiny vocabulary, most
    // estimates are exact (collisions are possible, gross error not)
    val overcounted = exact.count { case (t, n) => est(t) > n }
    assert(overcounted <= exact.size / 2,
      s"implausible collision rate: $overcounted of ${exact.size}")
  }

  test("CMS estimate equals a driver-side replay of the same cells") {
    val rows = toks.as[String].collect()
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- rows; d <- 0 until Sketches.CmsDepth) {
      val slot = TextOps.hex60Local(s"$d:$t") % Sketches.CmsWidth
      cells((d, slot)) = cells.getOrElse((d, slot), 0L) + 1
    }
    val some = rows.distinct.sorted.take(5)
    val est = Sketches.cmsEstimate(Sketches.cmsBuild(toks, "token"),
        some.toSeq.toDF("term"))
      .as[(String, Long)].collect().toMap
    for (t <- some) {
      val want = (0 until Sketches.CmsDepth)
        .map(d => cells((d, TextOps.hex60Local(s"$d:$t") % Sketches.CmsWidth)))
        .min
      assert(est(t) === want, s"cell replay diverged for '$t'")
    }
  }

  test("HLL estimate matches a driver-side integer replay exactly") {
    val tok = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val got = Sketches.hllEstimate(tok, col("token"), Seq(col("source")))
      .as[(String, Long)].collect().toMap
    // independent replay with plain Scala integer arithmetic
    val bySource = tok.as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val num = BigInt(Sketches.HllNumerator.toBigInteger)
    for ((src, values) <- bySource) {
      val regs = scala.collection.mutable.Map.empty[Long, Long]
      for (v <- values) {
        val h = TextOps.hex60Local(v)
        val idx = h % Sketches.HllRegisters
        val rho = 53L - java.lang.Long.toBinaryString(h >> 8).length
        regs(idx) = math.max(regs.getOrElse(idx, 0L), rho)
      }
      val sAll = regs.values.map(r => 1L << (53 - r).toInt).sum +
        (Sketches.HllRegisters - regs.size).toLong * (1L << 53)
      val want = (num / (BigInt(sAll) * 1000000)).toLong
      assert(got(src) === want, s"HLL diverged for $src")
    }
  }

  test("HLL is register-exact: estimate within the expected error band") {
    val tok = docs.select(lit("all").as("g"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val exact = tok.select("token").distinct().count()
    val est = Sketches.hllEstimate(tok, col("token"), Seq(col("g")))
      .select("hll_est").as[Long].head()
    // raw HLL (no small-range correction) on n << m registers biases
    // high but stays within a loose band; the point is sanity, the
    // EXACTNESS contract is the replay test above
    assert(est > 0 && est < exact * 3 + 200,
      s"estimate $est implausible vs exact $exact")
  }

  test("histogram quantile error is bounded by one bucket width") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val b = 64
    val stats = li.agg(min(col("l_extendedprice")),
      max(col("l_extendedprice"))).as[(Double, Double)].head()
    val width = (stats._2 - stats._1) / b
    val rows = Sketches.histQuantileError(li, col("l_extendedprice"),
        buckets = b, qs = Seq(50, 90, 99))
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length === 3)
    rows.foreach { case (q, est, exact, err) =>
      // the nearest-rank value lies inside the chosen bucket, so the
      // lower-edge estimate sits within one width below it
      assert(est <= exact + 1e-6 && err <= width + 1e-6,
        s"q=$q est=$est exact=$exact err=$err width=$width")
    }
  }

  test("histogram quantile estimator: degenerate constant column") {
    val const = Seq.fill(100)(42.0).toDF("x")
    val rows = Sketches.histQuantileError(const, col("x"), buckets = 16,
        qs = Seq(50, 99))
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length === 2)
    rows.foreach { case (q, est, exact, err) =>
      assert(est === 42.0 && exact === 42.0 && err === 0.0, s"q=$q: $est")
    }
  }
}
