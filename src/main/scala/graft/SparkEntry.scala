package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Model

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver test corpus (TPC-H-ish parquet at the given sfDir), paired with
  * ANSI SQL for the DuckDB oracle. Column names and types are aligned on
  * both sides because the driver hash-compares after sorting columns by
  * name.
  *
  * Conventions for oracle parity:
  *  - timestamps are emitted as formatted strings or DATE (never raw
  *    timestamp) to avoid tz-adjustment ambiguity between engines;
  *  - integer-valued computed columns are cast to BIGINT on both sides;
  *  - double arithmetic keeps the exact same expression shape on both
  *    sides (IEEE ops are deterministic per row);
  *  - sums over doubles are computed as DECIMAL(38,6) on both sides so
  *    accumulation order cannot change the result.
  */
object SparkEntry {
  import graft.registry.RetailQueries
  import graft.registry.RetailQueries.{SalesCte, modeledSales}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    modeledSales(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RetailQueries.queries ++ graft.registry.ExtQueries.queries ++
      graft.registry.PipelineQueries.queries ++
      graft.registry.StreamQueries.queries ++ fQueries

  private def fQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.6 sales_fact derivations F1-F7 ----
    "derive_gross_amount" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("gross_amount"))),
    "derive_discount_amount" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("discount_amount"))),
    "derive_net_amount" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("net_amount"))),
    "derive_is_discounted" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("is_discounted"))),
    "derive_sale_ts" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"),
        date_format(col("sale_date"), "yyyy-MM-dd HH:mm:ss").as("sale_ts_iso"))),
    "derive_order_year" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("order_year"))),
    "derive_order_month" -> ((s, dir) =>
      modeledSales(s, dir).select(col("sale_id"), col("order_month"))),
    // flagship: the fully modeled fact with stable output types
    "model_sales_fact" -> ((s, dir) =>
      modeledSales(s, dir).select(
        col("sale_id"),
        date_format(col("sale_date"), "yyyy-MM-dd HH:mm:ss").as("sale_ts_iso"),
        col("customer_id"), col("product_id"), col("store_id"),
        col("quantity"), col("unit_price"), col("discount_pct"),
        col("gross_amount"), col("discount_amount"), col("net_amount"),
        col("is_discounted"), col("order_year"), col("order_month")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RetailQueries.oracleSql ++ graft.registry.ExtQueries.oracleSql ++
      graft.registry.PipelineQueries.oracleSql ++
      graft.registry.StreamQueries.oracleSql ++ fOracle

  private def fOracle: Map[String, String] = Map(
    "derive_gross_amount" -> s"""$SalesCte
      SELECT sale_id, quantity * unit_price AS gross_amount FROM sales""",
    "derive_discount_amount" -> s"""$SalesCte
      SELECT sale_id,
             (quantity * unit_price) * (discount_pct / 100) AS discount_amount
      FROM sales""",
    "derive_net_amount" -> s"""$SalesCte
      SELECT sale_id,
             (quantity * unit_price)
               - ((quantity * unit_price) * (discount_pct / 100)) AS net_amount
      FROM sales""",
    "derive_is_discounted" -> s"""$SalesCte
      SELECT sale_id, discount_pct > 0 AS is_discounted FROM sales""",
    "derive_sale_ts" -> s"""$SalesCte
      SELECT sale_id,
             strftime(sale_date, '%Y-%m-%d %H:%M:%S') AS sale_ts_iso
      FROM sales""",
    "derive_order_year" -> s"""$SalesCte
      SELECT sale_id, CAST(year(sale_date) AS BIGINT) AS order_year FROM sales""",
    "derive_order_month" -> s"""$SalesCte
      SELECT sale_id, strftime(sale_date, '%Y-%m') AS order_month FROM sales""",
    "model_sales_fact" -> s"""$SalesCte
      SELECT sale_id,
             strftime(sale_date, '%Y-%m-%d %H:%M:%S') AS sale_ts_iso,
             customer_id, product_id, store_id,
             quantity, unit_price, discount_pct,
             quantity * unit_price AS gross_amount,
             (quantity * unit_price) * (discount_pct / 100) AS discount_amount,
             (quantity * unit_price)
               - ((quantity * unit_price) * (discount_pct / 100)) AS net_amount,
             discount_pct > 0 AS is_discounted,
             CAST(year(sale_date) AS BIGINT) AS order_year,
             strftime(sale_date, '%Y-%m') AS order_month
      FROM sales"""
  )

  /** Headline queries — the heavy representative paths (Bench times
    * every registered query; these are the ones to read first). */
  def headline: Seq[String] = Seq(
    "pipeline_sales_e2e", "model_sales_fact", "analytics_q1",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_embedding_cosine", "sim_bruteforce_topk_agg", "sim_ivf_topk",
    "window_session", "stream_tumbling", "asof_join_last_purchase")
}
