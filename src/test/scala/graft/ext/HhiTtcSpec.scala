package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HHI market concentration and conversion-latency quartiles — the
  * registry entries are inline compositions, so the spec materializes
  * scratch sf dirs and drives them through the registry surface. */
class HhiTtcSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    graft.registry.ExtQueriesAnalytics.queries(name)(spark, dir)

  test("hhi: monopoly region is 1e6; equal duopoly halves it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hhi").toString
    // region MONO has one supplier; region DUO two with equal revenue
    Seq((0L, "MONO"), (1L, "DUO")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((10L, 0L), (20L, 1L), (21L, 1L))
      .toDF("n_nationkey", "n_regionkey")
      .withColumn("n_name", concat(lit("N"), col("n_nationkey")))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 10L), (2L, 20L), (3L, 21L))
      .toDF("s_suppkey", "s_nationkey")
      .withColumn("s_name", concat(lit("S"), col("s_suppkey")))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L, 500.0), (2L, 2L, 300.0), (3L, 3L, 300.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
      .withColumn("l_partkey", col("l_orderkey"))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_quantity", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = run("analytics_hhi_concentration", dir)
      .select("r_name", "n_suppliers", "total_cents", "hhi_ppm",
        "top_share_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("MONO") === (("MONO", 1L, 50000L, 1000000L, 1000000L)))
    assert(got("DUO") === (("DUO", 2L, 60000L, 500000L, 500000L)))
  }

  test("hhi invariants on real data: 1/n <= hhi <= top share") {
    val rows = run("analytics_hhi_concentration", "/root/testdata/sf0.001")
      .select("n_suppliers", "hhi_ppm", "top_share_ppm")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, hhi, top) =>
      assert(hhi <= top, s"sum of squared shares is bounded by the max")
      assert(hhi >= 1000000L / n - 1, s"HHI of $n suppliers floors at 1/n")
    }
  }

  test("ttc: nearest-rank quartiles over hand-computed deltas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttc").toString
    val t0 = 1700000000L
    def ev(u: Long, t: String, at: Long) = (u, t, at)
    // deltas (hours): u1=1, u2=2, u3=3, u4=10; u5 purchase BEFORE
    // view (excluded); u6 view only (excluded)
    val rows = Seq(
      ev(1L, "view", t0), ev(1L, "purchase", t0 + 3600),
      ev(2L, "view", t0), ev(2L, "purchase", t0 + 7200),
      ev(3L, "view", t0), ev(3L, "purchase", t0 + 10800),
      ev(4L, "view", t0), ev(4L, "purchase", t0 + 36000),
      ev(5L, "purchase", t0), ev(5L, "view", t0 + 60),
      ev(6L, "view", t0))
    rows.toDF("user_id", "event_type", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("analytics_time_to_convert", dir)
      .select("n_converted", "p25_hours", "p50_hours", "p75_hours",
        "max_hours")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((4L, 1L, 2L, 3L, 10L)))
  }
}
