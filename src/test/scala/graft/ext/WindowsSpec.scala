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
}
