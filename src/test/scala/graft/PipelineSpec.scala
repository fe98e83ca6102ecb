package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{DataQualityException, Load}
import graft.registry.RetailQueries

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def newPipeline() = {
    val wh = Files.createTempDirectory("wh").toString
    val logs = Files.createTempDirectory("logs").toString
    (new Pipeline(spark, wh, logs, RetailQueries.AsOf,
      metros = RetailQueries.MetroNations,
      regionMap = RetailQueries.NationRegionMap), wh, logs)
  }

  test("all four pipelines run end-to-end and the warehouse validates") {
    val (p, wh, logs) = newPipeline()
    val sales = RetailQueries.sales(spark, sf0001)
    val dedupOrder = Some(Seq(col("sale_date"), col("customer_id"),
      col("product_id"), col("store_id"), col("quantity"),
      col("unit_price"), col("discount_pct")))
    p.run("customers", RetailQueries.customers(spark, sf0001))
    p.run("products", RetailQueries.products(spark, sf0001))
    p.run("stores", RetailQueries.stores(spark, sf0001))
    p.run("sales", sales, dedupOrder)

    val fact = spark.read.parquet(s"$wh/sales_fact")
    val custDim = spark.read.parquet(s"$wh/customers_dim")
    val dateDim = spark.read.parquet(s"$wh/date_dim")
    assert(fact.count() > 0 && custDim.count() > 0)

    // date_dim spans the fact's min..max sale date inclusively
    val mm = fact.agg(min(col("sale_date").cast("date")),
      max(col("sale_date").cast("date"))).first()
    val expectedDays =
      (mm.getDate(1).toLocalDate.toEpochDay
        - mm.getDate(0).toLocalDate.toEpochDay) + 1
    assert(dateDim.count() == expectedDays)

    // FK integrity where the corpus guarantees it: product and store
    // keys (customer_id maps from l_orderkey per FIXTURES.md, which is
    // deliberately not a customer FK in this corpus)
    val prodDim = spark.read.parquet(s"$wh/products_dim")
    val storeDim = spark.read.parquet(s"$wh/stores_dim")
    Load.requireReferentialIntegrity(fact, col("product_id"),
      prodDim.select(col("product_id").as("dim_pid")), col("dim_pid"))
    Load.requireReferentialIntegrity(fact, col("store_id"),
      storeDim.select(col("store_id").as("dim_sid")), col("dim_sid"))

    // run/stage logs recorded SUCCESS for all four runs
    val runLog = spark.read.json(s"$logs/etl_run_log.jsonl")
    assert(runLog.filter(col("status") === "SUCCESS").count() == 4)
    val stageLog = spark.read.json(s"$logs/etl_stage_log.jsonl")
    assert(stageLog.filter(col("status") === "FAILED").count() == 0)
  }

  test("gate failures mark the run FAILED and propagate") {
    val (p, _, logs) = newPipeline()
    // schema drift: missing a contract column
    val bad = RetailQueries.customers(spark, sf0001).drop("email")
    assertThrows[DataQualityException] { p.run("customers", bad) }
    // full-row duplicates
    val dups = {
      val c = RetailQueries.customers(spark, sf0001)
      c.unionByName(c.limit(5))
    }
    assertThrows[DataQualityException] { p.run("customers", dups) }
    // unmapped state in stores
    val badStores = RetailQueries.stores(spark, sf0001)
      .withColumn("state", lit("NOWHERE"))
    assertThrows[DataQualityException] { p.run("stores", badStores) }
    val runLog = spark.read.json(s"$logs/etl_run_log.jsonl")
    assert(runLog.filter(col("status") === "FAILED").count() == 3)
  }

  test("full refresh is idempotent: re-running replaces, not appends") {
    val (p, wh, _) = newPipeline()
    p.run("products", RetailQueries.products(spark, sf0001))
    val n1 = spark.read.parquet(s"$wh/products_dim").count()
    p.run("products", RetailQueries.products(spark, sf0001))
    val n2 = spark.read.parquet(s"$wh/products_dim").count()
    assert(n1 == n2)
  }
}
