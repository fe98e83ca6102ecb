package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test corpus plus the retail<->TPC-H mapping
  * declared in FIXTURES.md: `lineitem` plays the sales fact,
  * `customer`/`part`/`supplier`(+`nation`/`region`) play the dims.
  */
object Tables {

  // Schema memo per SNAPSHOT, not per path (ADVICE r17): keying on
  // the path alone silently served a stale schema when a fixture dir
  // was regenerated within one JVM, and a foreign one when two
  // sessions with different parquet-inference configs shared the JVM.
  // The key now folds in the file-listing fingerprint (name, length,
  // mtime — a driver-side metadata walk, no Spark job) plus the one
  // inference conf that changes parquet schemas here, so a rewritten
  // table re-infers automatically and repeated reads of an unchanged
  // table still trigger ZERO schema-inference jobs at construction
  // (AnnServingPathSpec pins this).
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    val nanos = spark.conf
      .getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val fp = graft.ext.ArtifactStore.fingerprint(spark, p)
    val sch = schemaCache.getOrElseUpdate(s"$fp|$nanos|$p",
      spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(p)
  }

  /** events table with `ts` surfaced as a microsecond TimestampType,
    * adapting to how the corpus generator wrote the column:
    *  - TIMESTAMP(NANOS) parquet (rounds <= 9) reads as a long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (Spark has no
    *    nanos type); `div 1000` floors to micros exactly like engines
    *    that read the column natively;
    *  - TIMESTAMP(MICROS) parquet (round 10 corpus) reads as a
    *    timestamp directly; the cast only normalizes NTZ to the
    *    session-zoned type (UTC session -> identical instants).
    * Dispatching on the READ schema keeps every downstream query
    * byte-identical across both generator vintages. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** lineitem -> retail `sales` source shape (FIXTURES.md §B mapping):
    * sale_id = l_orderkey-l_linenumber, l_shipdate -> sale_date,
    * l_orderkey -> customer_id, l_partkey -> product_id,
    * l_suppkey -> store_id, l_quantity -> quantity,
    * l_extendedprice -> unit_price, l_discount*100 -> discount_pct.
    */
  def salesFromLineitem(li: DataFrame): DataFrame = li.select(
    concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("sale_id"),
    col("l_shipdate").cast("timestamp").as("sale_date"),
    col("l_orderkey").cast("string").as("customer_id"),
    col("l_partkey").cast("string").as("product_id"),
    col("l_suppkey").cast("string").as("store_id"),
    col("l_quantity").cast("long").as("quantity"),
    col("l_extendedprice").as("unit_price"),
    (col("l_discount") * 100).as("discount_pct"))

  /** customer -> retail `customers` source shape: c_name splits into
    * first/last, synthetic deterministic email, nation name as city,
    * o- less signup so we reuse c_custkey-seeded dates is not possible —
    * instead signup_date is derived from c_custkey deterministically. */
  def customersFromTpch(c: DataFrame): DataFrame = c.select(
    col("c_custkey").cast("string").as("customer_id"),
    split(col("c_name"), "#").getItem(0).as("first_name"),
    split(col("c_name"), "#").getItem(1).as("last_name"),
    concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
      lit("@example.com")).as("email"),
    col("c_mktsegment").as("city"),
    // deterministic signup date spread over ~8 years by key
    to_timestamp(date_add(lit(java.sql.Date.valueOf("2018-01-01")),
      (col("c_custkey") % 3000).cast("int"))).as("signup_date"))

  /** part -> retail `products` source shape. Price is spread over the
    * LOW/MEDIUM/HIGH bands (p_retailprice is 900..1000 in the corpus,
    * which would land every row in MEDIUM). */
  def productsFromPart(p: DataFrame): DataFrame = p.select(
    col("p_partkey").cast("string").as("product_id"),
    col("p_name").as("product_name"),
    col("p_type").as("category"),
    (col("p_retailprice") * (col("p_partkey") % 4)).as("price"))

  /** supplier(+nation) -> retail `stores` source shape: n_name as city,
    * 2-letter-ish state synthesized from nation key via region mapping
    * exercise is done in the query layer. */
  def storesFromSupplier(s: DataFrame, nation: DataFrame): DataFrame =
    s.join(broadcast(nation), s("s_nationkey") === nation("n_nationkey"))
      .select(
        col("s_suppkey").cast("string").as("store_id"),
        col("s_name").as("store_name"),
        col("n_name").as("city"),
        col("n_name").as("state"))
}
