package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.Contracts

/** T2 "dimensional modeling" — the reference's core query-expression
  * surface (etl/transform_data_modeling.py), re-expressed as pure Spark
  * Column algebra so every derivation stays inside Catalyst/whole-stage
  * codegen (no UDFs; SURVEY §2.12).
  *
  * All builders preserve row count (enforced separately by
  * [[Gates.requireRowCountPreserved]]).
  */
object Model {

  // -------------------------------------------------------------------
  // Scalar derivation expressions (SURVEY §2.6). Each is a pure Column
  // function so it is unit-testable and reusable in SQL and DataFrame
  // form alike.
  // -------------------------------------------------------------------

  /** C1: trim(concat(coalesce(first,'') , ' ', coalesce(last,'')))
    * (transform_data_modeling.py:66-68). */
  def fullName(first: Column, last: Column): Column =
    trim(concat(coalesce(first, lit("")), lit(" "), coalesce(last, lit(""))))

  /** C2: elapsed whole days between signup and asOf — floor of the
    * timestamp diff in seconds / 86400, NOT calendar-boundary datediff
    * (transform_data_modeling.py:70-72; SURVEY §7.5 #3). */
  def tenureDays(signup: Column, asOf: Timestamp): Column =
    floor((lit(asOf).cast("long") - signup.cast("long")) / 86400L)
      .cast("long")

  /** C3: tenure bucket thresholds at 90/365 days, boundary-inclusive
    * (transform_data_modeling.py:399-404). */
  def tenureBucket(days: Column): Column =
    when(days <= Contracts.TenureNewMaxDays, "NEW")
      .when(days <= Contracts.TenureRegularMaxDays, "REGULAR")
      .otherwise("LOYAL")

  /** C4: substring after '@'; NULL when no '@' present — split semantics,
    * not substring_index (transform_data_modeling.py:77). `get` (not
    * `getItem`) so an absent '@' yields NULL instead of an ANSI
    * out-of-bounds error. */
  def emailDomain(email: Column): Column = get(split(email, "@"), lit(1))

  /** R1: price band at 500/2000, boundary-inclusive lower band
    * (transform_data_modeling.py:391-396). */
  def priceBand(price: Column): Column =
    when(price <= Contracts.PriceLowMax, "LOW")
      .when(price <= Contracts.PriceMediumMax, "MEDIUM")
      .otherwise("HIGH")

  /** R2: strictly greater than 2000 — price == 2000.0 is NOT premium
    * (transform_data_modeling.py:105). */
  def isPremium(price: Column): Column = price > Contracts.PremiumPriceMin

  /** T2: metro membership, evaluated on the uppercased city
    * (transform_data_modeling.py:137-138). */
  def isMetro(cityUpper: Column,
              metros: Seq[String] = Contracts.MetroCities): Column =
    cityUpper.isin(metros: _*)

  /** T3: state -> region via a broadcast map literal (scale-safe: the
    * lookup is a small constant, so `element_at` on a `typedLit` map
    * stays a scalar expression — no shuffle, no join, fully codegen'd).
    * Unmapped states yield NULL here; [[Gates.requireNoUnmappedRegion]]
    * turns that into the reference's hard failure
    * (transform_data_modeling.py:140-145). */
  def storeRegion(state: Column,
                  map: Map[String, String] = Contracts.StateRegionMap): Column =
    element_at(typedLit(map), state)

  /** Pandas day-of-week (Monday=0..Sunday=6) from Spark's dayofweek
    * (Sunday=1..Saturday=7) — SURVEY §7.5 #2. */
  def pandasDow(date: Column): Column = (dayofweek(date) + 5) % 7

  // -------------------------------------------------------------------
  // Table builders (one per warehouse table). Input is the cleaned
  // contract-shaped frame; output appends the derived columns in the
  // reference's order and projects to the declared contract.
  // -------------------------------------------------------------------

  /** customers_dim (transform_data_modeling.py:44-80). */
  def customersDim(df: DataFrame, asOf: Timestamp): DataFrame = {
    val days = tenureDays(to_timestamp(col("signup_date")), asOf)
    df.withColumn("customer_full_name",
        fullName(col("first_name"), col("last_name")))
      .withColumn("customer_tenure_days", days)
      .withColumn("customer_tenure_bucket",
        tenureBucket(col("customer_tenure_days")))
      .withColumn("email_domain", emailDomain(col("email")))
  }

  /** products_dim (transform_data_modeling.py:83-109). */
  def productsDim(df: DataFrame): DataFrame =
    df.withColumn("price_band", priceBand(col("price")))
      .withColumn("is_premium_product", isPremium(col("price")))
      .withColumn("category_normalized", upper(col("category")))

  /** stores_dim (transform_data_modeling.py:112-148). City/state are
    * uppercased in place before the derived flags. The metro set and
    * region map default to the retail contracts but are injectable for
    * other domains. */
  def storesDim(df: DataFrame,
                metros: Seq[String] = Contracts.MetroCities,
                regionMap: Map[String, String] = Contracts.StateRegionMap)
      : DataFrame =
    df.withColumn("city", upper(col("city")))
      .withColumn("state", upper(col("state")))
      .withColumn("is_metro_store", isMetro(col("city"), metros))
      .withColumn("store_region", storeRegion(col("state"), regionMap))

  /** sales_fact derived measures F1-F7
    * (transform_data_modeling.py:154-185). */
  def salesFact(df: DataFrame): DataFrame =
    df.withColumn("gross_amount", col("quantity") * col("unit_price"))
      .withColumn("discount_amount",
        col("gross_amount") * (col("discount_pct") / 100))
      .withColumn("net_amount", col("gross_amount") - col("discount_amount"))
      .withColumn("is_discounted", col("discount_pct") > 0)
      .withColumn("sale_date", to_timestamp(col("sale_date")))
      .withColumn("order_year", year(col("sale_date")).cast("long"))
      .withColumn("order_month", date_format(col("sale_date"), "yyyy-MM"))

  /** G1: date_dim generator — one row per calendar day in
    * [minDate, maxDate] inclusive, plus 6 derived columns
    * (transform_data_modeling.py:191-216). Built from
    * `explode(sequence(...))` so it is a distributed generator, not a
    * driver loop; day-of-week uses the pandas convention (Mon=0).
    */
  def dateDim(spark: org.apache.spark.sql.SparkSession,
              minDate: java.sql.Date, maxDate: java.sql.Date): DataFrame = {
    val base = spark.range(1).select(
      explode(sequence(lit(minDate), lit(maxDate),
        expr("interval 1 day"))).as("date"))
    withDateDimColumns(base, col("date"))
  }

  /** date_dim column derivations, reusable over any date column. */
  def withDateDimColumns(df: DataFrame, d: Column): DataFrame =
    df.withColumn("year", year(d).cast("long"))
      .withColumn("month", month(d).cast("long"))
      .withColumn("year_month", date_format(d, "yyyy-MM"))
      .withColumn("day_of_week", pandasDow(d).cast("long"))
      .withColumn("is_weekend", pandasDow(d) >= 5)
      .withColumn("quarter", quarter(d).cast("long"))
}
