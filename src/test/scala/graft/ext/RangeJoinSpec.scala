package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (0L, 10L, 300L),   // spans 2 buckets at width 256
    (1L, 200L, 800L),  // overlaps interval 0 and 2
    (2L, 768L, 1023L), // exactly one bucket
    (3L, 900L, 900L),  // single point
    (4L, 50L, 40L)     // degenerate lo > hi: matches nothing
  ).toDF("interval_id", "lo", "hi")

  test("bucketed range join equals the naive BETWEEN join") {
    val points = spark.range(0, 1100, 7).select(col("id").as("x"))
    val got = RangeJoin
      .bucketedRangeJoin(points, intervals, "x", "lo", "hi", 256)
      .select("x", "interval_id").as[(Long, Long)].collect().toSet
    // truth via the quadratic join (fine at spec scale)
    val want = points.crossJoin(intervals)
      .filter(col("x") >= col("lo") && col("x") <= col("hi"))
      .select("x", "interval_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
    // overlap produces multi-matches; the degenerate interval none
    assert(want.map(_._2).contains(0L) && want.map(_._2).contains(1L))
    assert(!want.map(_._2).contains(4L))
  }

  test("non-power-of-two widths floor correctly (incl. past 2^53)") {
    val points = Seq(0L, 99L, 100L, (1L << 55) + 7).toDF("x")
    val iv = Seq((0L, 0L, 99L), (1L, 100L, 199L),
      (2L, 1L << 55, (1L << 55) + 100)).toDF("interval_id", "lo", "hi")
    val got = RangeJoin.bucketedRangeJoin(points, iv, "x", "lo", "hi", 100)
      .select("x", "interval_id").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 0L), (99L, 0L), (100L, 1L),
      ((1L << 55) + 7, 2L)))
  }

  test("the plan is an equi-join on the bucket, not nested-loop") {
    val points = spark.range(0, 1000).select(col("id").as("x"))
    val plan = RangeJoin
      .bucketedRangeJoin(points, intervals, "x", "lo", "hi", 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
  }
}
