package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Extract
import graft.registry.RetailQueries
import graft.schema.Contracts

/** Full parity run: the four pipelines over the reference system's own
  * CSV datasets (read-only at /root/reference/data), with the retail
  * contracts (state->region map, metro cities, tenure buckets). The
  * reference's own successful runs produced 10,000-row dims, a 366-row
  * date_dim and a 50,000-row fact (SURVEY §5.2) — the rebuild must
  * reproduce those.
  */
class RetailE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dataDir = "/root/reference/data"

  private def csvSchema(table: String): StructType = {
    // source CSVs carry ids as ints and dates as strings; the declared
    // cast to the contract happens in T1 (SURVEY §1.2)
    val raw: Map[String, DataType] = table match {
      case "sales" => Map("sale_id" -> LongType, "sale_date" -> StringType,
        "customer_id" -> LongType, "product_id" -> LongType,
        "store_id" -> LongType, "quantity" -> LongType,
        "unit_price" -> DoubleType, "discount_pct" -> DoubleType)
      case "customers" => Map("customer_id" -> LongType,
        "first_name" -> StringType, "last_name" -> StringType,
        "email" -> StringType, "city" -> StringType,
        "signup_date" -> StringType)
      case "products" => Map("product_id" -> LongType,
        "product_name" -> StringType, "category" -> StringType,
        "price" -> DoubleType)
      case "stores" => Map("store_id" -> LongType,
        "store_name" -> StringType, "city" -> StringType,
        "state" -> StringType)
    }
    StructType(Contracts.ExpectedColumns(table).map(c =>
      StructField(c, raw(c))))
  }

  private def file(table: String): String = table match {
    case "sales" => s"$dataDir/sales/sales.csv"
    case other => s"$dataDir/$other/$other.csv"
  }

  test("all four reference pipelines reproduce the documented warehouse") {
    val wh = Files.createTempDirectory("retail_wh").toString
    val logs = Files.createTempDirectory("retail_logs").toString
    val p = new Pipeline(spark, wh, logs, RetailQueries.AsOf)

    Pipeline.LoadOrder.foreach { table =>
      val (src, n) = Extract.extractCsv(spark, file(table),
        csvSchema(table), Contracts.ExpectedColumns(table))
      assert(n == (if (table == "sales") 50000 else 10000),
        s"$table source count")
      p.run(table, src)
    }

    val fact = spark.read.parquet(s"$wh/sales_fact")
    val dateDim = spark.read.parquet(s"$wh/date_dim")
    val customers = spark.read.parquet(s"$wh/customers_dim")
    val products = spark.read.parquet(s"$wh/products_dim")
    val stores = spark.read.parquet(s"$wh/stores_dim")

    assert(fact.count() == 50000)
    assert(dateDim.count() == 366)
    assert(customers.count() == 10000)
    assert(products.count() == 10000)
    assert(stores.count() == 10000)

    // derived-column semantics on real data
    assert(customers.filter(col("email_domain") =!= "example.com").count() == 0)
    assert(customers.filter(!col("customer_tenure_bucket")
      .isin("NEW", "REGULAR", "LOYAL")).count() == 0)
    assert(stores.filter(col("store_region").isNull).count() == 0)
    assert(stores.filter(!col("store_region")
      .isin("NORTH", "SOUTH", "EAST", "WEST")).count() == 0)
    // metro flag: exactly the four metro cities (post-uppercase)
    val metros = stores.filter(col("is_metro_store"))
      .select("city").distinct().as[String].collect().toSet
    assert(metros == Set("MUMBAI", "DELHI", "BANGALORE", "CHENNAI"))
    // money math: net = gross - discount on every fact row
    assert(fact.filter(
      abs(col("net_amount") - (col("gross_amount") - col("discount_amount")))
        > 1e-9).count() == 0)
    // fact FK integrity against all three entity dims
    Seq(("customer_id", customers), ("product_id", products),
      ("store_id", stores)).foreach { case (k, dim) =>
      graft.ops.Load.requireReferentialIntegrity(fact, col(k),
        dim.select(col(k).as("dk")), col("dk"))
    }
    // date_dim covers every sale date
    graft.ops.Load.requireReferentialIntegrity(
      fact.select(col("sale_date").cast("date").as("d")), col("d"),
      dateDim.select(col("date").cast("date").as("dd")), col("dd"))
  }
}
