package graft.ops

import org.apache.spark.sql.DataFrame
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
}
