package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row count, NULL count and exact distinct
  * count, as a long-format frame (column, n_rows, n_null, n_distinct).
  *
  * Shape at scale: one aggregation job per profile. Row/null counts
  * come from a single shared pass; exact distinct counts each expand
  * to a distinct aggregate (Spark plans them with `expand` — one pass
  * over the data, one shuffle per distinct column). For wide tables at
  * 100 TB, swap `countDistinct` for `approx_count_distinct` (HLL, one
  * pass, no expand) via `approx = true`.
  */
object Profile {

  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs = count(lit(1)).as("_n") +: df.columns.toSeq.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__null"),
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"${c}__distinct"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val spark = df.sparkSession
    import spark.implicits._
    val n = row.getLong(0)
    df.columns.toSeq.zipWithIndex.map { case (c, i) =>
      (c, n, row.getLong(1 + 2 * i), row.getLong(2 + 2 * i))
    }.toDF("column", "n_rows", "n_null", "n_distinct")
  }

  /** Month-over-month volume drift — the ingest-monitoring gate a
    * standing pipeline runs before trusting a new partition: per-month
    * row count and order-proof value sum, the relative change vs the
    * previous month as integer ppm, and a flag when the swing exceeds
    * `thresholdPpm`. The first month has no baseline: NULL delta, flag
    * 0 (absence of evidence is not drift).
    *
    * Scale shape: the corpus collapses to one row per month in a
    * map-side-combined agg, and even that metadata-sized frame never
    * sees an unpartitioned window (this library bans the shape
    * outright rather than reasoning per-site about which single-task
    * sorts are "small enough"): the lag runs split-merge like
    * [[graft.ext.Sketches.histQuantileError]] — partitioned BY YEAR
    * (years-way parallel), with each year's first in-data month taking
    * its predecessor from a triangular join over the <=years-row
    * last-month-per-year table. Lag splits at any cut, so the result
    * is identical to a global lag (the oracle replays it as one —
    * two derivations agreeing).
    *
    * Integer discipline: the signed relative change is computed as
    * `sign * (|n - prev| * 1e6 div prev)` — division only ever sees
    * non-negative operands, sidestepping the truncate-vs-floor
    * divergence engines exhibit on negative integer division. */
  def monthlyDrift(df: DataFrame, dateCol: Column, valueCol: Column,
                   thresholdPpm: Long = 200000L): DataFrame = {
    val monthly = df
      .groupBy(date_format(dateCol, "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(valueCol * 1000000).cast("long")) / 1000000.0)
          .as("total"))
    val wy = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_gy")).orderBy(col("month"))
    val lagged = monthly.withColumn("_gy", substring(col("month"), 1, 4))
      .withColumn("_prev_in_year", lag(col("n"), 1).over(wy))
    // carry: the last in-data month's n per year; each year's first
    // in-data month takes the greatest EARLIER year's value (max_by
    // skips null-year rows of the left join, so the overall first
    // month keeps a NULL baseline). Joins are broadcast over a frame
    // bounded by the year count of the data.
    val lastOfYear = lagged.groupBy(col("_gy").as("_ly"))
      .agg(max_by(col("n"), col("month")).as("_last_n"))
    val carry = lagged.filter(col("_prev_in_year").isNull)
      .select(col("month").as("_fm"), col("_gy").as("_fy"))
      .join(broadcast(lastOfYear), col("_ly") < col("_fy"), "left")
      .groupBy(col("_fm"))
      .agg(max_by(col("_last_n"), col("_ly")).as("_carry_n"))
    lagged.join(broadcast(carry), col("month") === col("_fm"), "left")
      .withColumn("prev_n", coalesce(col("_prev_in_year"), col("_carry_n")))
      .drop("_gy", "_prev_in_year", "_fm", "_carry_n", "_fy")
      .withColumn("delta_ppm",
        when(col("prev_n").isNull, lit(null).cast("long"))
          .when(col("n") >= col("prev_n"),
            expr("(n - prev_n) * 1000000L div prev_n"))
          .otherwise(-expr("(prev_n - n) * 1000000L div prev_n")))
      .withColumn("drift_flag",
        when(abs(coalesce(col("delta_ppm"), lit(0L))) > thresholdPpm,
          lit(1L)).otherwise(lit(0L)))
  }
}
