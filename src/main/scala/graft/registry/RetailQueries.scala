package graft.registry

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.control.ControlPlane
import graft.ops.{Clean, Extract, Gates, Load, Model}

/** The SURVEY §2 parity surface: one named query per operator-inventory
  * row, each paired with DuckDB oracle SQL over the same parquet
  * tables. Query ids follow SURVEY §2 exactly.
  */
object RetailQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic as-of instant for tenure math — the reference's
    * AS_OF_DATE is datetime.now() at import (SURVEY §1.2 quirk #2); we
    * take it as an explicit parameter and pin it for the oracle. */
  val AsOf: Timestamp = Timestamp.valueOf("2026-01-09 00:00:00")
  val AsOfSql = "TIMESTAMP '2026-01-09 00:00:00'"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Morton/Z-curve bit interleave of two 16-bit ints (x gets the even
    * bit positions, y the odd) — 32 shift/mask terms summed, all
    * BIGINT, identical term-for-term in [[zInterleaveSql]]. */
  private def zInterleave(x: org.apache.spark.sql.Column,
                          y: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB twin of [[zInterleave]]. */
  private def zInterleaveSql(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  def sales(s: SparkSession, dir: String): DataFrame =
    Tables.salesFromLineitem(t(s, dir, "lineitem"))

  def modeledSales(s: SparkSession, dir: String): DataFrame =
    Model.salesFact(sales(s, dir))

  /** DuckDB CTE mirroring [[Tables.salesFromLineitem]]. */
  val SalesCte: String =
    """WITH sales AS (
      |  SELECT l_orderkey || '-' || l_linenumber AS sale_id,
      |         l_shipdate AS sale_date,
      |         CAST(l_orderkey AS VARCHAR) AS customer_id,
      |         CAST(l_partkey AS VARCHAR) AS product_id,
      |         CAST(l_suppkey AS VARCHAR) AS store_id,
      |         CAST(l_quantity AS BIGINT) AS quantity,
      |         l_extendedprice AS unit_price,
      |         l_discount * 100 AS discount_pct
      |  FROM lineitem)""".stripMargin

  /** DuckDB CTE mirroring [[Tables.customersFromTpch]]. */
  val CustomersCte: String =
    """WITH customers AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
      |         str_split(c_name, '#')[1] AS first_name,
      |         str_split(c_name, '#')[2] AS last_name,
      |         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
      |           || '@example.com' AS email,
      |         c_mktsegment AS city,
      |         CAST(DATE '2018-01-01'
      |           + CAST(c_custkey % 3000 AS INTEGER) AS TIMESTAMP) AS signup_date,
      |         c_custkey
      |  FROM customer)""".stripMargin

  /** DuckDB CTE mirroring [[Tables.productsFromPart]]. */
  val ProductsCte: String =
    """WITH products AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS product_id,
      |         p_name AS product_name,
      |         p_type AS category,
      |         p_retailprice * (p_partkey % 4) AS price,
      |         p_partkey
      |  FROM part)""".stripMargin

  /** DuckDB CTE mirroring [[Tables.storesFromSupplier]]. */
  val StoresCte: String =
    """WITH stores AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS store_id,
      |         s_name AS store_name,
      |         n_name AS city,
      |         n_name AS state,
      |         s_suppkey
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)""".stripMargin

  def customers(s: SparkSession, dir: String): DataFrame =
    Tables.customersFromTpch(t(s, dir, "customer"))

  def products(s: SparkSession, dir: String): DataFrame =
    Tables.productsFromPart(t(s, dir, "part"))

  def stores(s: SparkSession, dir: String): DataFrame =
    Tables.storesFromSupplier(t(s, dir, "supplier"), t(s, dir, "nation"))

  /** NATION_i -> region-name map (the state->region lookup analog; the
    * corpus assigns region i%5 to NATION_i). */
  val NationRegionMap: Map[String, String] = {
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    (0 until 25).map(i => s"NATION_$i" -> regions(i % 5)).toMap
  }
  /** Metro analog for T2: four nation names. */
  val MetroNations = Seq("NATION_1", "NATION_5", "NATION_7", "NATION_19")

  /** Customers frame with NULL PKs injected on every 10th key (for the
    * P3/A5 null-PK paths; the corpus itself is clean). */
  private def customersNullPk(s: SparkSession, dir: String): DataFrame =
    customers(s, dir).withColumn("customer_id",
      when(col("customer_id").cast("long") % 10 === 0, lit(null))
        .otherwise(col("customer_id")))

  /** lineitem subset unioned with itself — deterministic full-row dups
    * for the D1/O2 paths. */
  private def dupBase(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(concat(col("l_orderkey"), lit("-"), col("l_linenumber"))
        .as("sale_id"), col("l_quantity"))
    base.union(base)
  }
  private val DupBaseSql =
    """WITH base AS (
      |  SELECT l_orderkey || '-' || l_linenumber AS sale_id, l_quantity
      |  FROM lineitem WHERE l_orderkey % 100 = 0),
      |dupd AS (SELECT * FROM base UNION ALL SELECT * FROM base),
      |dups AS (
      |  SELECT sale_id, l_quantity, count(*) AS n_dup
      |  FROM dupd GROUP BY 1, 2 HAVING count(*) > 1)""".stripMargin

  // =====================================================================
  // Queries
  // =====================================================================

  val queries: Map[String, Q] = Map(
    // ---- §2.1 scans / sources / sinks ----
    "scan_csv" -> ((s, dir) => {
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv/region"
      t(s, dir, "region").coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      Extract.readCsv(s, tmp, StructType(Seq(
        StructField("r_regionkey", LongType), StructField("r_name", StringType))))
    }),
    "source_precheck" -> ((s, dir) => {
      import s.implicits._
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").map { name =>
        val ok = try {
          Extract.precheckSource(s"$dir/$name.parquet"); true
        } catch { case _: Throwable => false }
        (name, ok)
      }.toDF("table_name", "readable")
    }),
    "sink_full_refresh" -> ((s, dir) => {
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_sink/nation"
      val src = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      Load.fullRefresh(src, tmp)
      Load.fullRefresh(src, tmp) // idempotent overwrite, twice
      s.read.parquet(tmp)
    }),
    "scan_json" -> ((s, dir) => {
      // JSON round trip: write a projection as JSONL, read back with an
      // explicit schema
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_json/orders"
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .write.mode("overwrite").json(tmp)
      s.read.schema(StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType)))).json(tmp)
    }),
    "sink_scan_orc" -> ((s, dir) => {
      // ORC round trip
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_orc/nation"
      val src = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
      src.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
    }),
    "sink_partitioned_pruned" -> ((s, dir) => {
      // hive-style partitioned write + partition-pruned read: only the
      // selected year's files are scanned (PartitionFilters in the plan)
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_part/sales"
      val modeled = modeledSales(s, dir)
        .select(col("sale_id"), col("net_amount"), col("order_year"))
      modeled.write.mode("overwrite").partitionBy("order_year").parquet(tmp)
      val years = modeled.select(min(col("order_year"))).first().getLong(0)
      s.read.parquet(tmp).filter(col("order_year") === years)
        .select(col("sale_id"), col("net_amount"),
          col("order_year").cast("long").as("order_year"))
    }),
    // range-clustered write + per-bucket layout stats: rows are
    // clustered into closed-form key ranges (integer arithmetic over
    // the global [min, max] — no sampling, unlike repartitionByRange,
    // so any engine replays the SAME bucket boundaries), written
    // hive-partitioned by bucket, and the read-back layout audited as
    // (bucket, n, lo, hi). Non-overlapping per-file key ranges are
    // what make min/max pruning effective — the clustering half of
    // sink_partitioned_pruned's story.
    "sink_range_clustered" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice"))
      val r = o.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val nBuckets = 16L
      // integer floor-div (Spark's Column `/` is double division)
      val clustered = o.withColumn("bucket",
        expr(s"(o_orderkey - $lo) * $nBuckets div ${hi - lo + 1}"))
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_range/orders"
      graft.ext.Scratch.reclaimOnExit(tmp)
      clustered.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("key_lo"),
          max(col("o_orderkey")).as("key_hi"))
    }),
    // Z-order layout: the 2-D extension of sink_range_clustered. Both
    // dims are min-max normalized to 16 bits with the same closed-form
    // integer arithmetic (no sampling — any engine replays the exact
    // boundaries), bit-interleaved into a 32-bit z-value, and sharded
    // by its top 6 bits: every shard then spans ~1/8 of BOTH key
    // ranges simultaneously, which is what lets min/max pruning cut a
    // 100 TB scan on EITHER predicate column — the property a 1-D sort
    // can only give one column. Audited as per-shard (n, lo, hi) of
    // both dims after the hive-partitioned write + read-back.
    "sink_zorder_layout" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("dy"))
      val r = o.agg(min(col("ck")), max(col("ck")),
        min(col("dy")), max(col("dy"))).head()
      val (cLo, cHi, dLo, dHi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val z = o
        .withColumn("x", expr(s"(ck - $cLo) * 65536 div ${cHi - cLo + 1}"))
        .withColumn("y", expr(s"(dy - $dLo) * 65536 div ${dHi - dLo + 1}"))
        .withColumn("zval", zInterleave(col("x"), col("y")))
        .withColumn("zshard", expr("zval div 67108864")) // top 6 of 32 bits
        .drop("x", "y")
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_zorder/orders"
      graft.ext.Scratch.reclaimOnExit(tmp)
      z.write.mode("overwrite").partitionBy("zshard").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(col("zshard").cast("long").as("zshard"))
        .agg(count(lit(1)).as("n"),
          min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
          min(col("dy")).as("dy_lo"), max(col("dy")).as("dy_hi"))
    }),
    // schema-evolution scan: an old-schema write and a new-schema
    // write (extra column) read back as ONE table via mergeSchema —
    // old rows surface the added column as NULL. The append-only
    // schema-widening pattern every long-lived warehouse table needs.
    "scan_schema_evolution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_evo/customer"
      graft.ext.Scratch.reclaimOnExit(tmp)
      c.select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"))
        .write.mode("overwrite").parquet(s"$tmp/v1")
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_name"), col("c_acctbal"))
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$tmp/v1", s"$tmp/v2")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),
    "sink_type_normalize" -> ((s, dir) =>
      Load.typeNormalize(sales(s, dir).select(col("sale_id"), col("sale_date")))),
    "control_log_sink" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_log").toString
      val sink = new ControlPlane.LogSink(tmp)
      val rid = sink.newRunId()
      sink.logRun(ControlPlane.RunLog(rid, "sales_pipeline", "STARTED",
        sink.now(), null, null))
      sink.logStage(ControlPlane.StageLog(rid, "EXTRACT", "STARTED", -1, -1,
        sink.now(), null, null))
      sink.logStage(ControlPlane.StageLog(rid, "EXTRACT", "SUCCESS", 10, 10,
        sink.now(), sink.now(), null))
      sink.logRun(ControlPlane.RunLog(rid, "sales_pipeline", "SUCCESS",
        sink.now(), sink.now(), null))
      val runs = s.read.json(s"$tmp/etl_run_log.jsonl").count()
      val stages = s.read.json(s"$tmp/etl_stage_log.jsonl").count()
      Seq(("etl_run_log", runs), ("etl_stage_log", stages))
        .toDF("log", "n_rows")
    }),

    // ---- §2.2 projections / filters ----
    "project_contract" -> ((s, dir) =>
      sales(s, dir).select(
        col("sale_id"),
        date_format(col("sale_date"), "yyyy-MM-dd HH:mm:ss").as("sale_date_iso"),
        col("customer_id"), col("product_id"), col("store_id"),
        col("quantity"), col("unit_price"), col("discount_pct"))),
    "rename_snake_case" -> ((s, dir) =>
      Clean.renameSnakeCase(
        t(s, dir, "region").select(
          col("r_regionkey").cast("long"), col("r_name"))
          .toDF("  R RegionKey ", "R  NAME!"))),
    "filter_drop_null_pk" -> ((s, dir) =>
      Clean.dropNullPk(customersNullPk(s, dir), Seq("customer_id"))
        .select(col("customer_id"))),
    "fill_defaults" -> ((s, dir) => {
      val withNulls = customers(s, dir).withColumn("city",
        when(col("city") === "BUILDING", lit(null)).otherwise(col("city")))
      Clean.fillDefaults(withNulls, Map("city" -> "UNKNOWN"), Map.empty)
        .select(col("customer_id"), col("city"))
    }),
    "cast_declared_types" -> ((s, dir) =>
      Clean.castDeclaredTypes(
        t(s, dir, "lineitem").select(
          concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("sale_id"),
          col("l_quantity").as("quantity"),
          col("l_extendedprice").as("unit_price"),
          (col("l_discount") * 100).as("discount_pct")),
        Map("sale_id" -> StringType, "quantity" -> LongType,
          "unit_price" -> DoubleType, "discount_pct" -> DoubleType))),
    "filter_metadata_active" -> ((s, _) =>
      ControlPlane.listActivePipelines(s)),

    // ---- §2.3 dedup ----
    "detect_full_row_dups" -> ((s, dir) =>
      Gates.fullRowDups(dupBase(s, dir))),
    "dedup_keep_first_by_pk" -> ((s, dir) =>
      Clean.dedupKeepFirst(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice")),
        Seq("o_custkey"), col("o_orderkey"))),
    "detect_pk_dups_sql" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_dup")).filter(col("n_dup") > 1)),

    // ---- §2.4 aggregations ----
    "agg_null_fraction" -> ((s, dir) => {
      val c = customers(s, dir).withColumn("city",
        when(col("city") === "BUILDING", lit(null)).otherwise(col("city")))
      val aggs = c.columns.toSeq.map(name =>
        ((count(lit(1)) - count(col(name))) * 100.0 / count(lit(1)))
          .as(s"${name}_null_pct"))
      c.agg(aggs.head, aggs.tail: _*)
    }),
    "agg_count_rows" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))),
    "agg_min_max_date" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        date_format(min(col("l_shipdate").cast("date")), "yyyy-MM-dd")
          .as("min_sale_date"),
        date_format(max(col("l_shipdate").cast("date")), "yyyy-MM-dd")
          .as("max_sale_date"))),
    "agg_group_having_dups" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders")).filter(col("n_orders") > 1)),
    "agg_count_where_null" -> ((s, dir) =>
      customersNullPk(s, dir).filter(col("customer_id").isNull)
        .agg(count(lit(1)).as("n_null_pk"))),

    // ---- §2.5 joins ----
    "join_metadata_tables" -> ((s, _) =>
      ControlPlane.tablesForPipeline(s, "sales_pipeline")),
    "join_dim_lookup_map" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      val joined = sup
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"), "left")
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"), "left")
        .select(col("s_suppkey").cast("string").as("store_id"),
          col("s_name").as("store_name"), col("r_name").as("store_region"))
      // fail on unmapped key, mirroring the reference's NaN guard
      Gates.requireNoUnmappedRegion(joined, "store_region", "store_id")
      joined
    }),
    "join_fk_integrity" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
        "left_anti").agg(count(lit(1)).as("n_orphans"))
      orphans
    }),

    // ---- §2.6 customers_dim C1-C4 ----
    "derive_full_name" -> ((s, dir) => {
      val c = customers(s, dir).withColumn("last_name",
        when(col("customer_id").cast("long") % 7 === 0, lit(null))
          .otherwise(col("last_name")))
      c.select(col("customer_id"),
        Model.fullName(col("first_name"), col("last_name"))
          .as("customer_full_name"))
    }),
    "derive_tenure_days" -> ((s, dir) =>
      customers(s, dir).select(col("customer_id"),
        Model.tenureDays(
          timestamp_seconds(col("signup_date").cast("long") +
            (col("customer_id").cast("long") % 24) * 3600),
          AsOf).as("customer_tenure_days"))),
    "derive_tenure_bucket" -> ((s, dir) =>
      customers(s, dir).select(col("customer_id"),
        Model.tenureBucket(
          Model.tenureDays(to_timestamp(col("signup_date")), AsOf))
          .as("customer_tenure_bucket"))),
    "derive_email_domain" -> ((s, dir) =>
      customers(s, dir).select(col("customer_id"),
        Model.emailDomain(col("email")).as("email_domain"),
        Model.emailDomain(col("city")).as("no_at_domain"))),

    // ---- §2.6 products_dim R1-R3 ----
    "derive_price_band" -> ((s, dir) =>
      products(s, dir).select(col("product_id"), col("price"),
        Model.priceBand(col("price")).as("price_band"))),
    "derive_is_premium" -> ((s, dir) =>
      products(s, dir).select(col("product_id"),
        Model.isPremium(col("price")).as("is_premium_product"))),
    "derive_category_norm" -> ((s, dir) =>
      products(s, dir).select(col("product_id"),
        upper(col("category")).as("category_normalized"))),

    // ---- §2.6 stores_dim T1-T3 ----
    "derive_city_state_upper" -> ((s, dir) =>
      stores(s, dir).select(col("store_id"),
        upper(lower(col("city"))).as("city"))),
    "derive_is_metro" -> ((s, dir) =>
      stores(s, dir).select(col("store_id"),
        Model.isMetro(upper(col("city")), MetroNations).as("is_metro_store"))),
    "derive_store_region" -> ((s, dir) => {
      val df = stores(s, dir).select(col("store_id"), col("state"),
        Model.storeRegion(col("state"), NationRegionMap).as("store_region"))
      Gates.requireNoUnmappedRegion(df)
      df
    }),

    // ---- §2.7 date_dim generator G1 ----
    "generate_date_dim" -> ((s, dir) => {
      val mm = t(s, dir, "lineitem").agg(
        min(col("l_shipdate").cast("date")),
        max(col("l_shipdate").cast("date"))).first()
      Model.dateDim(s, mm.getDate(0), mm.getDate(1))
        .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))
    }),

    // ---- §2.8 sorts / limits ----
    "sort_metadata_load_order" -> ((s, _) => ControlPlane.resolveAll(s)),
    // (sale_id, l_quantity) is a TOTAL order over the dup groups:
    // sale_id alone ties when a derived corpus (the sf1 gate) carries
    // two distinct rows under one synthetic id, and an ordered LIMIT
    // under a tie is engine-ambiguous at the cut
    "limit_dup_sample" -> ((s, dir) =>
      Gates.fullRowDups(dupBase(s, dir))
        .orderBy(col("sale_id"), col("l_quantity")).limit(5)),

    // table profiling (extension of the A1 stats gate)
    "profile_table" -> ((s, dir) =>
      graft.ops.Profile.profile(t(s, dir, "customer"))),
    // month-over-month volume drift: the ingest-monitoring gate — the
    // corpus collapses to one row per month map-side, the lag window
    // runs over that metadata-sized frame; signed ppm via the
    // sign-decomposed div (negative integer division is engine-divergent)
    "profile_month_drift" -> ((s, dir) =>
      graft.ops.Profile.monthlyDrift(t(s, dir, "orders"),
        col("o_orderdate"), col("o_totalprice"))),

    // ---- §2.9 set ops (Spark built-ins; not in the reference) ----
    "setop_union_except" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_custkey") % 3 === 0)
        .select(col("o_orderkey"))
      val b = t(s, dir, "orders").filter(col("o_custkey") % 2 === 0)
        .select(col("o_orderkey"))
      a.union(b).except(a.intersect(b)) // symmetric difference, distinct
    })
  )

  // =====================================================================
  // Oracle SQL
  // =====================================================================

  val oracleSql: Map[String, String] = Map(
    "scan_csv" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region",
    "sink_full_refresh" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""",
    "scan_json" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "sink_scan_orc" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation",
    "sink_partitioned_pruned" -> s"""$SalesCte,
      m AS (SELECT sale_id,
              (quantity * unit_price)
                - ((quantity * unit_price) * (discount_pct / 100)) AS net_amount,
              CAST(year(sale_date) AS BIGINT) AS order_year
            FROM sales)
      SELECT sale_id, net_amount, order_year FROM m
      WHERE order_year = (SELECT min(order_year) FROM m)""",
    // closed-form range buckets: identical integer arithmetic over
    // the same global [min, max]
    "sink_range_clustered" -> """
      WITH r AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi
                 FROM orders)
      SELECT CAST((o_orderkey - lo) * 16 // (hi - lo + 1) AS BIGINT)
               AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(o_orderkey) AS BIGINT) AS key_lo,
             CAST(max(o_orderkey) AS BIGINT) AS key_hi
      FROM orders CROSS JOIN r
      GROUP BY 1""",
    // identical closed-form normalization + 32-term interleave; the
    // audit replays without any filesystem involvement
    "sink_zorder_layout" -> s"""
      WITH b AS (SELECT o_custkey AS ck,
                        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS dy
                 FROM orders),
      r AS (SELECT min(ck) AS clo, max(ck) AS chi,
                   min(dy) AS dlo, max(dy) AS dhi FROM b),
      n AS (SELECT ck, dy,
                   (ck - clo) * 65536 // (chi - clo + 1) AS x,
                   (dy - dlo) * 65536 // (dhi - dlo + 1) AS y
            FROM b CROSS JOIN r),
      z AS (SELECT ck, dy,
                   ${zInterleaveSql("x", "y")} AS zval
            FROM n)
      SELECT CAST(zval // 67108864 AS BIGINT) AS zshard,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(ck) AS BIGINT) AS ck_lo,
             CAST(max(ck) AS BIGINT) AS ck_hi,
             CAST(min(dy) AS BIGINT) AS dy_lo,
             CAST(max(dy) AS BIGINT) AS dy_hi
      FROM z GROUP BY 1""",
    // old-schema rows (all) surface NULL for the added column; the
    // new-schema write carries the even keys
    "scan_schema_evolution" -> """
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
             CAST(NULL AS DOUBLE) AS c_acctbal
      FROM customer
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey % 2 = 0""",
    "sink_type_normalize" -> s"""$SalesCte
      SELECT sale_id,
             strftime(sale_date, '%Y-%m-%dT%H:%M:%S') AS sale_date
      FROM sales""",
    "control_log_sink" ->
      """SELECT * FROM (VALUES ('etl_run_log', CAST(2 AS BIGINT)),
        ('etl_stage_log', CAST(2 AS BIGINT))) AS t(log, n_rows)""",

    "project_contract" -> s"""$SalesCte
      SELECT sale_id, strftime(sale_date, '%Y-%m-%d %H:%M:%S') AS sale_date_iso,
             customer_id, product_id, store_id, quantity, unit_price,
             discount_pct
      FROM sales""",
    "rename_snake_case" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region",
    "filter_drop_null_pk" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS customer_id FROM customer
        WHERE c_custkey % 10 <> 0""",
    "fill_defaults" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS city
        FROM customer""",
    "cast_declared_types" ->
      """SELECT l_orderkey || '-' || l_linenumber AS sale_id,
        CAST(l_quantity AS BIGINT) AS quantity,
        l_extendedprice AS unit_price,
        l_discount * 100 AS discount_pct
        FROM lineitem""",
    "filter_metadata_active" ->
      """SELECT * FROM (VALUES ('customers_pipeline'), ('products_pipeline'),
        ('stores_pipeline'), ('sales_pipeline')) AS t(pipeline_name)""",

    "detect_full_row_dups" -> s"""$DupBaseSql SELECT * FROM dups""",
    "dedup_keep_first_by_pk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                   AS rn
          FROM orders) WHERE rn = 1""",
    "detect_pk_dups_sql" ->
      """SELECT l_orderkey, count(*) AS n_dup FROM lineitem
        GROUP BY l_orderkey HAVING count(*) > 1""",

    "agg_null_fraction" ->
      """SELECT
        (COUNT(*) - COUNT(customer_id)) * 100.0 / COUNT(*) AS customer_id_null_pct,
        (COUNT(*) - COUNT(first_name)) * 100.0 / COUNT(*) AS first_name_null_pct,
        (COUNT(*) - COUNT(last_name)) * 100.0 / COUNT(*) AS last_name_null_pct,
        (COUNT(*) - COUNT(email)) * 100.0 / COUNT(*) AS email_null_pct,
        (COUNT(*) - COUNT(city)) * 100.0 / COUNT(*) AS city_null_pct,
        (COUNT(*) - COUNT(signup_date)) * 100.0 / COUNT(*) AS signup_date_null_pct
        FROM (SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
                str_split(c_name, '#')[1] AS first_name,
                str_split(c_name, '#')[2] AS last_name,
                lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
                  || '@example.com' AS email,
                NULLIF(c_mktsegment, 'BUILDING') AS city,
                CAST(DATE '2018-01-01' + CAST(c_custkey % 3000 AS INTEGER)
                  AS TIMESTAMP) AS signup_date
              FROM customer)""",
    "agg_count_rows" -> "SELECT count(*) AS n_rows FROM lineitem",
    "agg_min_max_date" ->
      """SELECT strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_sale_date,
        strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_sale_date
        FROM lineitem""",
    "agg_group_having_dups" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
        GROUP BY o_custkey HAVING count(*) > 1""",
    "agg_count_where_null" ->
      "SELECT count(*) AS n_null_pk FROM customer WHERE c_custkey % 10 = 0",

    "join_metadata_tables" ->
      """SELECT * FROM (VALUES ('date_dim', 'sales', 'full', '1'),
        ('sales_fact', 'sales', 'full', '2'))
        AS t(table_name, source_name, load_strategy, load_order)""",
    "join_dim_lookup_map" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS store_id, s_name AS store_name,
        r_name AS store_region
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey""",
    "join_fk_integrity" ->
      """SELECT count(*) AS n_orphans FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)""",

    "derive_full_name" -> s"""$CustomersCte
      SELECT customer_id,
             trim(coalesce(first_name, '') || ' ' ||
                  coalesce(CASE WHEN c_custkey % 7 = 0 THEN NULL
                                ELSE last_name END, '')) AS customer_full_name
      FROM customers""",
    "derive_tenure_days" -> s"""$CustomersCte
      SELECT customer_id,
             CAST(FLOOR((epoch($AsOfSql)
               - (epoch(signup_date) + (c_custkey % 24) * 3600)) / 86400)
               AS BIGINT) AS customer_tenure_days
      FROM customers""",
    "derive_tenure_bucket" -> s"""$CustomersCte,
      d AS (SELECT customer_id,
              CAST(FLOOR((epoch($AsOfSql) - epoch(signup_date)) / 86400)
                AS BIGINT) AS days
            FROM customers)
      SELECT customer_id,
             CASE WHEN days <= 90 THEN 'NEW'
                  WHEN days <= 365 THEN 'REGULAR'
                  ELSE 'LOYAL' END AS customer_tenure_bucket
      FROM d""",
    "derive_email_domain" -> s"""$CustomersCte
      SELECT customer_id,
             str_split(email, '@')[2] AS email_domain,
             str_split(city, '@')[2] AS no_at_domain
      FROM customers""",

    "derive_price_band" -> s"""$ProductsCte
      SELECT product_id, price,
             CASE WHEN price <= 500 THEN 'LOW'
                  WHEN price <= 2000 THEN 'MEDIUM'
                  ELSE 'HIGH' END AS price_band
      FROM products""",
    "derive_is_premium" -> s"""$ProductsCte
      SELECT product_id, price > 2000 AS is_premium_product FROM products""",
    "derive_category_norm" -> s"""$ProductsCte
      SELECT product_id, upper(category) AS category_normalized FROM products""",

    "derive_city_state_upper" -> s"""$StoresCte
      SELECT store_id, upper(lower(city)) AS city FROM stores""",
    "derive_is_metro" -> s"""$StoresCte
      SELECT store_id,
             upper(city) IN ('NATION_1', 'NATION_5', 'NATION_7', 'NATION_19')
               AS is_metro_store
      FROM stores""",
    "derive_store_region" -> s"""$StoresCte
      SELECT store_id, state, r_name AS store_region
      FROM stores
      JOIN nation ON state = n_name
      JOIN region ON n_regionkey = r_regionkey""",

    "generate_date_dim" ->
      """WITH mm AS (SELECT CAST(min(l_shipdate) AS DATE) AS mn,
                            CAST(max(l_shipdate) AS DATE) AS mx FROM lineitem),
        days AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
                   AS DATE) AS d FROM mm)
        SELECT strftime(d, '%Y-%m-%d') AS "date",
               CAST(year(d) AS BIGINT) AS "year",
               CAST(month(d) AS BIGINT) AS "month",
               strftime(d, '%Y-%m') AS year_month,
               CAST(isodow(d) - 1 AS BIGINT) AS day_of_week,
               (isodow(d) - 1) >= 5 AS is_weekend,
               CAST(quarter(d) AS BIGINT) AS "quarter"
        FROM days""",

    "sort_metadata_load_order" ->
      """SELECT * FROM (VALUES
        ('customers_pipeline', 'customers_dim', '1'),
        ('products_pipeline', 'products_dim', '1'),
        ('stores_pipeline', 'stores_dim', '1'),
        ('sales_pipeline', 'date_dim', '1'),
        ('sales_pipeline', 'sales_fact', '2'))
        AS t(pipeline_name, table_name, load_order)""",
    "limit_dup_sample" -> s"""$DupBaseSql
      SELECT * FROM dups ORDER BY sale_id, l_quantity LIMIT 5""",

    "profile_table" -> {
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      cols.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           count(*) - count($c) AS n_null,
           count(DISTINCT $c) AS n_distinct FROM customer""")
        .mkString(" UNION ALL ")
    },
    // sign-decomposed ppm division: both engines truncate NON-NEGATIVE
    // integer division identically, so the sign is applied outside
    "profile_month_drift" -> """
      WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
              CAST(count(*) AS BIGINT) AS n,
              (SUM(CAST(FLOOR(o_totalprice*1000000) AS BIGINT))
                 / 1000000.0) AS total
            FROM orders GROUP BY 1),
      l AS (SELECT month, n, total,
              lag(n) OVER (ORDER BY month) AS prev_n FROM m),
      d AS (SELECT month, n, total, prev_n,
              CASE WHEN prev_n IS NULL THEN NULL
                   WHEN n >= prev_n THEN (n - prev_n) * 1000000 // prev_n
                   ELSE -((prev_n - n) * 1000000 // prev_n)
              END AS delta_ppm
            FROM l)
      SELECT month, n, total, prev_n, CAST(delta_ppm AS BIGINT) AS delta_ppm,
             CASE WHEN abs(coalesce(delta_ppm, 0)) > 200000
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
             END AS drift_flag
      FROM d""",
    "setop_union_except" ->
      """WITH a AS (SELECT o_orderkey FROM orders WHERE o_custkey % 3 = 0),
        b AS (SELECT o_orderkey FROM orders WHERE o_custkey % 2 = 0),
        u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        SELECT DISTINCT o_orderkey FROM u
        EXCEPT (SELECT * FROM a INTERSECT SELECT * FROM b)"""
  )
}
