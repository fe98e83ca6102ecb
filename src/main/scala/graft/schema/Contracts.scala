package graft.schema

import org.apache.spark.sql.types._

/** Static schema contracts for the retail warehouse.
  *
  * Mirrors the declared-config approach of the reference
  * (runner/pipeline_config.py:49-248): column contracts, primary keys,
  * NULL defaults, declared types and the state->region lookup are all
  * data, not code. Schemas are explicit `StructType`s — production reads
  * never infer.
  */
object Contracts {

  // ---- Expected source columns per table (pipeline_config.py:49-93) ----
  val ExpectedColumns: Map[String, Seq[String]] = Map(
    "sales" -> Seq("sale_id", "sale_date", "customer_id", "product_id",
      "store_id", "quantity", "unit_price", "discount_pct"),
    "customers" -> Seq("customer_id", "first_name", "last_name", "email",
      "city", "signup_date"),
    "products" -> Seq("product_id", "product_name", "category", "price"),
    "stores" -> Seq("store_id", "store_name", "city", "state")
  )

  // ---- Primary keys (pipeline_config.py:96-102) ----
  val PrimaryKeys: Map[String, Seq[String]] = Map(
    "sales" -> Seq("sale_id"),
    "customers" -> Seq("customer_id"),
    "products" -> Seq("product_id"),
    "stores" -> Seq("store_id")
  )

  // ---- NULL defaults for non-PK columns (pipeline_config.py:105-125) ----
  // Split by type because DataFrameNaFunctions.fill is type-segregated
  // (SURVEY §7.5 #6).
  val StringDefaults: Map[String, Map[String, String]] = Map(
    "customers" -> Map("first_name" -> "UNKNOWN", "last_name" -> "UNKNOWN",
      "email" -> "UNKNOWN", "city" -> "UNKNOWN"),
    "products" -> Map("product_name" -> "UNKNOWN", "category" -> "UNKNOWN"),
    "stores" -> Map("store_name" -> "UNKNOWN", "city" -> "UNKNOWN",
      "state" -> "UNKNOWN"),
    "sales" -> Map.empty
  )
  val NumericDefaults: Map[String, Map[String, Double]] = Map(
    "sales" -> Map("discount_pct" -> 0.0),
    "customers" -> Map.empty,
    "products" -> Map.empty,
    "stores" -> Map.empty
  )

  // ---- Declared types (pipeline_config.py:128-162), applied for real
  // (the reference's cast is a no-op bug — we implement the declared
  // semantics; SURVEY §1.2 quirk #1). ----
  val DeclaredTypes: Map[String, Map[String, DataType]] = Map(
    "sales" -> Map(
      "sale_id" -> StringType, "sale_date" -> TimestampType,
      "customer_id" -> StringType, "product_id" -> StringType,
      "store_id" -> StringType, "quantity" -> LongType,
      "unit_price" -> DoubleType, "discount_pct" -> DoubleType),
    "customers" -> Map(
      "customer_id" -> StringType, "first_name" -> StringType,
      "last_name" -> StringType, "email" -> StringType,
      "city" -> StringType, "signup_date" -> TimestampType),
    "products" -> Map(
      "product_id" -> StringType, "product_name" -> StringType,
      "category" -> StringType, "price" -> DoubleType),
    "stores" -> Map(
      "store_id" -> StringType, "store_name" -> StringType,
      "city" -> StringType, "state" -> StringType)
  )

  /** Derived columns appended by the modeling stage, in output order
    * (transform_data_modeling.py — per-builder derived lists). */
  val DerivedColumns: Map[String, Seq[String]] = Map(
    "customers" -> Seq("customer_full_name", "customer_tenure_days",
      "customer_tenure_bucket", "email_domain"),
    "products" -> Seq("price_band", "is_premium_product",
      "category_normalized"),
    "stores" -> Seq("is_metro_store", "store_region"),
    "sales" -> Seq("gross_amount", "discount_amount", "net_amount",
      "is_discounted", "order_year", "order_month")
  )

  /** Metro cities for is_metro_store (transform_data_modeling.py:137-138),
    * matched after uppercasing. */
  val MetroCities: Seq[String] = Seq("MUMBAI", "DELHI", "BANGALORE", "CHENNAI")

  /** state -> store_region lookup (runner/pipeline_config.py:165-218).
    * Unmapped states are a hard failure (transform_data_modeling.py:142-145).
    */
  val StateRegionMap: Map[String, String] = Map(
    // North
    "DL" -> "NORTH", "HR" -> "NORTH", "PB" -> "NORTH", "UP" -> "NORTH",
    "UK" -> "NORTH", "HP" -> "NORTH", "JK" -> "NORTH", "CH" -> "NORTH",
    "LA" -> "NORTH", "RJ" -> "NORTH",
    // South
    "KA" -> "SOUTH", "TN" -> "SOUTH", "TG" -> "SOUTH", "AP" -> "SOUTH",
    "KL" -> "SOUTH", "PY" -> "SOUTH", "LD" -> "SOUTH",
    // East
    "WB" -> "EAST", "OD" -> "EAST", "BR" -> "EAST", "JH" -> "EAST",
    "SK" -> "EAST", "AS" -> "EAST", "AR" -> "EAST", "MN" -> "EAST",
    "ML" -> "EAST", "MZ" -> "EAST", "NL" -> "EAST", "TR" -> "EAST",
    "AN" -> "EAST",
    // West / Central
    "MH" -> "WEST", "GJ" -> "WEST", "GA" -> "WEST", "MP" -> "WEST",
    "CG" -> "WEST", "DN" -> "WEST"
  )

  /** Tenure bucket thresholds (transform_data_modeling.py:399-404). */
  val TenureNewMaxDays = 90L
  val TenureRegularMaxDays = 365L

  /** Price band thresholds (transform_data_modeling.py:391-396). */
  val PriceLowMax = 500.0
  val PriceMediumMax = 2000.0
  /** Premium product threshold — strictly greater (ref line 105). */
  val PremiumPriceMin = 2000.0

  /** Max tolerated per-column NULL percentage at extract (extract.py:111-120). */
  val MaxNullPct = 95.0

  /** snake_case lint for output column names
    * (transform_data_modeling.py:375-383). */
  val SnakeCase = "^[a-z0-9]+(?:_[a-z0-9]+)*$".r
}
