package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("approx percentiles track the exact quantiles within tolerance") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("exact"),
        Windows.approxPercentiles(col("l_extendedprice"), Seq(0.5, 0.99))
          .as("approx"))
      .select(col("exact"), col("approx"))
      .as[(Seq[Double], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      exact.zip(approx).foreach { case (e, a) =>
        assert(math.abs(e - a) / math.max(e, 1.0) < 0.05,
          s"approx quantile too far: exact=$e approx=$a")
      }
    }
  }

  test("approx percentile sketch merges across partitions consistently") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def p50(parts: Int): Double =
      li.repartition(parts)
        .agg(Windows.approxPercentiles(col("l_extendedprice"), Seq(0.5)))
        .as[Seq[Double]].head().head
    // partitioning changes merge order; the sketch must stay stable
    // within its accuracy envelope
    val a = p50(1); val b = p50(7)
    assert(math.abs(a - b) / math.max(a, 1.0) < 0.02, s"$a vs $b")
  }

  test("peakConcurrency: overlap, end-exclusive boundary, cross-day carry") {
    def peaks(rows: Seq[(String, Long)]): Map[String, Long] =
      Windows.peakConcurrency(rows.toDF("k", "t"), col("k"), col("t"), 15L)
        .as[(String, Long)].collect().toMap
    // a: [0,15) [10,25) [20,35) -> pairwise overlaps, peak 2
    // b: [0,15) [15,30) -> end-exclusive: NOT concurrent, peak 1
    val r = peaks(Seq(("a", 0L), ("a", 10L), ("a", 20L),
      ("b", 0L), ("b", 15L)))
    assert(r === Map("a" -> 2L, "b" -> 1L), s"$r")
    // holds spanning the day cut: starts at 86390/86395 (day 0), both
    // still held at 86400+ (day 1) where a third starts — the peak is
    // only visible through the cross-day carry-in
    val c = peaks(Seq(("c", 86390L), ("c", 86395L), ("c", 86401L)))
    assert(c === Map("c" -> 3L), s"cross-day carry lost: $c")
  }

  test("peakConcurrency split-merge equals a driver-side global sweep") {
    // deterministic pseudo-random fixture crossing several day cuts
    val ts = (1 to 400).map(i => (i * 2654435761L) % 300000L)
    val hold = 7200L
    val expected = {
      val bounds = ts.map(t => (t, 1L)) ++ ts.map(t => (t + hold, -1L))
      var cur = 0L; var peak = 0L
      bounds.sortBy(b => (b._1, b._2)).foreach { case (_, d) =>
        cur += d; if (cur > peak) peak = cur
      }
      peak
    }
    val got = Windows.peakConcurrency(
        ts.map(t => ("k", t)).toDF("k", "t"), col("k"), col("t"), hold)
      .as[(String, Long)].collect().head._2
    assert(got === expected, s"split-merge $got != global sweep $expected")
  }

  test("window_ewma_hourly: dyadic kernel recomputed driver-side, dense spine") {
    val rows = graft.registry.ExtQueries
      .queries("window_ewma_hourly")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (ty, rs) => ty -> rs.sortBy(_._2) }
    assert(rows.nonEmpty)
    rows.foreach { case (ty, series) =>
      // dense spine: consecutive hours, no gaps
      series.sliding(2).foreach { case Array(a, b) =>
        assert(b._2 - a._2 == 3600L, s"$ty spine gap at ${a._2}")
      case _ => }
      val counts = series.map(_._3)
      series.zipWithIndex.foreach { case ((_, _, _, num, den, milli), i) =>
        val terms = (0 until 8).filter(_ <= i)
        val expNum = terms.map(k => counts(i - k) * (1L << (7 - k))).sum
        val expDen = terms.map(k => 1L << (7 - k)).sum
        assert(num == expNum && den == expDen,
          s"$ty row $i: ($num,$den) != ($expNum,$expDen)")
        assert(milli == expNum * 1000 / expDen)
      }
      // warmed rows carry the full 255 weight mass
      assert(series.drop(7).forall(_._5 == 255L))
    }
  }
}
