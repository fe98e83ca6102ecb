package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("monthlyDrift: signed ppm deltas, threshold flag, null-safe first month") {
    // Jan: 10 rows, Feb: 13 (+300000 ppm, flagged), Mar: 12 (-76923, not)
    val rows =
      (1 to 10).map(i => (s"2024-01-${"%02d".format(i)}", 1.0)) ++
      (1 to 13).map(i => (s"2024-02-${"%02d".format(i)}", 2.0)) ++
      (1 to 12).map(i => (s"2024-03-${"%02d".format(i)}", 3.0))
    val df = rows.toDF("d", "v").withColumn("d", to_date(col("d")))
    val out = Profile.monthlyDrift(df, col("d"), col("v"))
      .orderBy(col("month"))
      .select(col("month"), col("n"), col("total"), col("prev_n"),
        col("delta_ppm"), col("drift_flag"))
      .as[(String, Long, Double, Option[Long], Option[Long], Long)]
      .collect().toSeq
    assert(out === Seq(
      ("2024-01", 10L, 10.0, None, None, 0L),
      ("2024-02", 13L, 26.0, Some(10L), Some(300000L), 1L),
      ("2024-03", 12L, 36.0, Some(13L), Some(-76923L), 0L)), s"$out")
  }

  test("monthlyDrift carries lag across year boundaries and year gaps") {
    // Dec 2022 (4 rows) -> Feb 2024 (6) -> Mar 2024 (3): the year-
    // partitioned lag alone would give Feb 2024 a NULL baseline; the
    // triangular carry must hand it Dec 2022's count (greatest earlier
    // year's last in-data month), skipping the absent 2023 entirely.
    val rows = (1 to 4).map(i => (s"2022-12-0$i", 1.0)) ++
      (1 to 6).map(i => (s"2024-02-0$i", 1.0)) ++
      (1 to 3).map(i => (s"2024-03-0$i", 1.0))
    val df = rows.toDF("d", "v").withColumn("d", to_date(col("d")))
    val out = Profile.monthlyDrift(df, col("d"), col("v"))
      .orderBy(col("month"))
      .select(col("month"), col("n"), col("prev_n"))
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      ("2022-12", 4L, None),
      ("2024-02", 6L, Some(4L)),
      ("2024-03", 3L, Some(6L))), s"$out")
  }

  test("monthlyDrift plan holds no unpartitioned window") {
    val df = (1 to 5).map(i => (s"2024-0$i-01", 1.0)).toDF("d", "v")
      .withColumn("d", to_date(col("d")))
    val plan = Profile.monthlyDrift(df, col("d"), col("v"))
      .queryExecution.executedPlan.toString
    // year-partitioned lag + triangular carry: no single-task global
    // sort anywhere in the drift plan (the library-wide ban). Same
    // simple-mode print convention as PlanShapeSpec's quantile check:
    // Window [exprs], [partitionSpec], [orderSpec] — an unpartitioned
    // window drops the middle bracket group.
    val windows = "Window \\[[^\\]]*\\](, \\[[^\\]]*\\])*".r
      .findAllIn(plan).toList
    assert(windows.nonEmpty, s"expected the year-partitioned lag:\n$plan")
    windows.foreach { w =>
      assert(w.count(_ == '[') >= 3,
        s"unpartitioned window leaked into monthlyDrift: $w\n$plan")
    }
  }

  test("monthlyDrift negative delta truncates toward zero (sign-decomposed)") {
    // 7 -> 5: -(2*1e6 div 7) = -285714 (truncated, not floored to -285715)
    val rows = (1 to 7).map(i => (s"2024-01-0$i", 1.0)) ++
      (1 to 5).map(i => (s"2024-02-0$i", 1.0))
    val df = rows.toDF("d", "v").withColumn("d", to_date(col("d")))
    val deltas = Profile.monthlyDrift(df, col("d"), col("v"))
      .orderBy(col("month")).select(col("delta_ppm"))
      .as[Option[Long]].collect().toSeq
    assert(deltas === Seq(None, Some(-285714L)), s"$deltas")
  }
}
