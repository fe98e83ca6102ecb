package graft.control

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control plane: pipeline/table metadata + append-only run/stage log
  * (utils/metadata_table_helpers.py + utils/log_table_helpers.py +
  * scripts/bootstrap_metadata.py re-expressed).
  *
  * Deliberately OFF the cluster path (SURVEY §7.4): run/stage log
  * writes are tiny single-row appends, so they go to a driver-local
  * JSONL file, not through a Spark job. Metadata is small and static,
  * so it is modeled as literal DataFrames that Catalyst can broadcast
  * into any join (J1).
  */
object ControlPlane {

  // ---- Metadata model (sql/create_control_tables.sql:99-153) ----
  case class PipelineMd(pipeline_name: String, source_name: String,
                        description: String, is_active: Boolean)
  case class TableMd(table_name: String, source_name: String,
                     load_strategy: String, watermark_column: String,
                     last_loaded_value: String, is_active: Boolean)
  case class PipelineTableMap(pipeline_name: String, table_name: String,
                              load_order: String, is_active: Boolean)

  /** Bootstrap rows (scripts/bootstrap_metadata.py:42-123): 4 pipelines,
    * 5 tables, 5 mappings; date_dim loads before sales_fact. load_order
    * is TEXT to mirror the reference DDL (lexicographic sort — SURVEY
    * §2.8 O1). */
  val pipelines: Seq[PipelineMd] = Seq(
    PipelineMd("customers_pipeline", "customers", "customers dim load", true),
    PipelineMd("products_pipeline", "products", "products dim load", true),
    PipelineMd("stores_pipeline", "stores", "stores dim load", true),
    PipelineMd("sales_pipeline", "sales", "sales fact + date dim load", true))
  val tables: Seq[TableMd] = Seq(
    TableMd("customers_dim", "customers", "full", null, null, true),
    TableMd("products_dim", "products", "full", null, null, true),
    TableMd("stores_dim", "stores", "full", null, null, true),
    TableMd("date_dim", "sales", "full", null, null, true),
    TableMd("sales_fact", "sales", "full", null, null, true))
  val pipelineTableMap: Seq[PipelineTableMap] = Seq(
    PipelineTableMap("customers_pipeline", "customers_dim", "1", true),
    PipelineTableMap("products_pipeline", "products_dim", "1", true),
    PipelineTableMap("stores_pipeline", "stores_dim", "1", true),
    PipelineTableMap("sales_pipeline", "date_dim", "1", true),
    PipelineTableMap("sales_pipeline", "sales_fact", "2", true))

  def pipelineMdDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pipelines.toDF()
  }
  def tableMdDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tables.toDF()
  }
  def pipelineTableMapDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pipelineTableMap.toDF()
  }

  /** J1 + O1: resolve the tables a pipeline loads, in load order —
    * inner equi-join map⋈table_md on table_name, filter active, order
    * by load_order (utils/metadata_table_helpers.py:202-210). Both
    * sides are tiny -> broadcast-hash join, no shuffle. */
  def tablesForPipeline(spark: SparkSession, pipeline: String): DataFrame =
    pipelineTableMapDf(spark).as("ptm")
      .filter(col("ptm.pipeline_name") === pipeline && col("ptm.is_active"))
      .join(broadcast(tableMdDf(spark).as("t")), Seq("table_name"))
      .filter(col("t.is_active"))
      .select(col("table_name"), col("t.source_name"), col("t.load_strategy"),
        col("ptm.load_order"))
      .orderBy(col("ptm.load_order"))

  /** O1: all pipeline->table mappings resolved, ordered by pipeline then
    * TEXT load_order (lexicographic — mirrors the reference's TEXT DDL,
    * SURVEY §2.8). */
  def resolveAll(spark: SparkSession): DataFrame =
    pipelineTableMapDf(spark).as("ptm")
      .filter(col("ptm.is_active"))
      .join(broadcast(tableMdDf(spark).as("t")), Seq("table_name"))
      .filter(col("t.is_active"))
      .select(col("ptm.pipeline_name"), col("table_name"),
        col("ptm.load_order"))
      .orderBy(col("ptm.pipeline_name"), col("ptm.load_order"))

  /** P6: active-pipeline lookup (utils/metadata_table_helpers.py:60-70). */
  def listActivePipelines(spark: SparkSession): DataFrame =
    pipelineMdDf(spark).filter(col("is_active")).select(col("pipeline_name"))

  /** Mutable metadata store — the full CRUD API of
    * utils/metadata_table_helpers.py (:44-214), driver-side (metadata
    * is tiny; a Spark job per lookup would be anti-scale). Reads are
    * also exposed as DataFrames for J1-style joins.
    */
  class MetadataStore(initPipelines: Seq[PipelineMd] = pipelines,
                      initTables: Seq[TableMd] = tables,
                      initMap: Seq[PipelineTableMap] = pipelineTableMap) {
    private val ps = scala.collection.mutable.LinkedHashMap(
      initPipelines.map(p => p.pipeline_name -> p): _*)
    private val ts = scala.collection.mutable.LinkedHashMap(
      initTables.map(t => t.table_name -> t): _*)
    private var ptm = initMap.toVector

    /** get_pipeline (:44-57) */
    def getPipeline(name: String): Option[PipelineMd] = ps.get(name)
    /** list_active_pipelines (:60-70) */
    def listActivePipelines(): Seq[PipelineMd] =
      ps.values.filter(_.is_active).toSeq
    /** register_pipeline (:73-104) — upsert, reactivates if present */
    def registerPipeline(p: PipelineMd): Unit = ps(p.pipeline_name) = p
    /** deactivate_pipeline (:107-127) */
    def deactivatePipeline(name: String): Boolean =
      ps.get(name) match {
        case Some(p) => ps(name) = p.copy(is_active = false); true
        case None => false
      }
    /** get_table (:132-145) */
    def getTable(name: String): Option[TableMd] = ts.get(name)
    /** list_active_tables_for_source (:148-164) */
    def listActiveTablesForSource(source: String): Seq[TableMd] =
      ts.values.filter(t => t.is_active && t.source_name == source).toSeq
    /** update_table_watermark (:167-189) */
    def updateTableWatermark(table: String, column: String,
                             value: String): Boolean =
      ts.get(table) match {
        case Some(t) =>
          ts(table) = t.copy(watermark_column = column,
            last_loaded_value = value); true
        case None => false
      }
    /** list_tables_for_pipeline (:194-214) — J1 join + load_order sort */
    def listTablesForPipeline(pipeline: String): Seq[(TableMd, String)] =
      ptm.filter(m => m.pipeline_name == pipeline && m.is_active)
        .flatMap(m => ts.get(m.table_name).filter(_.is_active)
          .map(t => (t, m.load_order)))
        .sortBy(_._2)
    def addMapping(m: PipelineTableMap): Unit = ptm = ptm :+ m

    def pipelinesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      ps.values.toSeq.toDF()
    }
    def tablesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      ts.values.toSeq.toDF()
    }
  }

  // ---- Run/stage log (S5; utils/log_table_helpers.py:51-196) ----
  case class RunLog(run_id: String, pipeline_name: String, status: String,
                    start_time: String, end_time: String, error: String)
  case class StageLog(run_id: String, stage_name: String, status: String,
                      rows_in: Long, rows_out: Long, start_time: String,
                      end_time: String, error: String)

  /** Append-only driver-side JSONL sink. Each call is one small write;
    * keeping this off Spark mirrors the reference's layering and avoids
    * a distributed job per log row. */
  class LogSink(dir: String) {
    Files.createDirectories(Paths.get(dir))
    private def append(file: String, json: String): Unit =
      Files.write(Paths.get(dir, file), (json + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    private def esc(s: String): String =
      if (s == null) "null"
      else "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def newRunId(): String = UUID.randomUUID().toString
    def logRun(r: RunLog): Unit = append("etl_run_log.jsonl",
      s"""{"run_id":${esc(r.run_id)},"pipeline_name":${esc(r.pipeline_name)},""" +
        s""""status":${esc(r.status)},"start_time":${esc(r.start_time)},""" +
        s""""end_time":${esc(r.end_time)},"error":${esc(r.error)}}""")
    def logStage(s: StageLog): Unit = append("etl_stage_log.jsonl",
      s"""{"run_id":${esc(s.run_id)},"stage_name":${esc(s.stage_name)},""" +
        s""""status":${esc(s.status)},"rows_in":${s.rows_in},"rows_out":${s.rows_out},""" +
        s""""start_time":${esc(s.start_time)},"end_time":${esc(s.end_time)},""" +
        s""""error":${esc(s.error)}}""")
    def now(): String = Instant.now().toString
  }
}
