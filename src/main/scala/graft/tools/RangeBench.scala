package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AutoRangeJoin measured win (VERDICT r13 #6 / r14 #2): the SAME
  * naive point-in-interval BETWEEN query, run with the optimizer rule
  * DISABLED (Spark's native plan for a no-equi-conjunct inner join:
  * BroadcastNestedLoopJoin — every point row evaluated against every
  * interval) and ENABLED (the bucketed equi-join rewrite,
  * plans/AutoRangeJoin). Row-identical outputs asserted; wall times
  * and the rewritten plan's join line printed as one JSON line.
  *
  *   tools/run_jvm.sh graft.tools.RangeBench [sfDir] [nIntervals] [reps]
  *
  * Shape: points = lineitem.l_orderkey at the given SF (~600k rows at
  * sf0.1), intervals = nIntervals synthetic [lo, lo+999] bands over
  * the key space (deterministic). The naive side's cost is
  * points x intervals condition evals — the quadratic the rule
  * exists to remove; the rewritten side explodes each interval to
  * ~span/256 + 1 buckets and hash-joins on the bucket key. */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nIv = if (args.length > 1) args(1).toInt else 10000
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.AutoRangeJoin.install(spark)

    val pts = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").cast("long").as("p"))
    val nPts = pts.count() // also warms the file listing + cache
    val maxKey = pts.agg(max(col("p"))).head().getLong(0)
    // deterministic interval bands over the key space, span 1000
    val iv = spark.range(nIv.toLong)
      .select(col("id").as("interval_id"),
        (col("id") * (maxKey / math.max(nIv, 1)) + 13).as("lo"))
      .withColumn("hi", col("lo") + 999)

    def query(): DataFrame =
      pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"), min(col("p")).as("key_lo"),
          max(col("p")).as("key_hi"))

    def timeWith(enabled: Boolean): (Double, Long) = {
      spark.conf.set(graft.plans.AutoRangeJoin.EnabledConf,
        enabled.toString)
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = query().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (ts.map(_._1).min, ts.head._2)
    }

    // result parity first (cheap aggregate compare), then timings
    spark.conf.set(graft.plans.AutoRangeJoin.EnabledConf, "true")
    val on = query().agg(sum(col("n_points")), sum(col("key_lo")),
      sum(col("key_hi")), count(lit(1))).head()
    spark.conf.set(graft.plans.AutoRangeJoin.EnabledConf, "false")
    val off = query().agg(sum(col("n_points")), sum(col("key_lo")),
      sum(col("key_hi")), count(lit(1))).head()
    require(on == off, s"rewrite changed the result: $on vs $off")

    val (tOff, nOff) = timeWith(enabled = false)
    val (tOn, nOn) = timeWith(enabled = true)
    require(nOff == nOn, s"row counts diverged: $nOff vs $nOn")

    spark.conf.set(graft.plans.AutoRangeJoin.EnabledConf, "true")
    val plan = query().queryExecution.executedPlan.toString()
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join")).getOrElse("?").trim.take(140)
    val naiveLine = {
      spark.conf.set(graft.plans.AutoRangeJoin.EnabledConf, "false")
      val p = query().queryExecution.executedPlan.toString()
      p.linesIterator.find(_.contains("Join")).getOrElse("?").trim.take(140)
    }
    println(
      s"""{"tool":"range_bench","sf":"$sfDir","n_points":$nPts,""" +
        s""""n_intervals":$nIv,"result_rows":$nOn,"reps":$reps,""" +
        s""""naive_min_s":${math.rint(tOff * 1000) / 1000},""" +
        s""""rewritten_min_s":${math.rint(tOn * 1000) / 1000},""" +
        s""""speedup":${math.rint(tOff / tOn * 100) / 100},""" +
        s""""naive_join":"$naiveLine","rewritten_join":"$joinLine"}""")
    spark.stop()
  }
}
