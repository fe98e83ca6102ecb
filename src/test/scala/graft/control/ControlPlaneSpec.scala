package graft.control

import graft.SparkSpec
import graft.control.ControlPlane._

class ControlPlaneSpec extends SparkSpec {

  test("metadata CRUD mirrors the reference API semantics") {
    val md = new MetadataStore()
    // bootstrap state (scripts/bootstrap_metadata.py)
    assert(md.listActivePipelines().map(_.pipeline_name) == Seq(
      "customers_pipeline", "products_pipeline", "stores_pipeline",
      "sales_pipeline"))
    assert(md.getPipeline("sales_pipeline").exists(_.is_active))
    // resolution join in load order: date_dim before sales_fact
    assert(md.listTablesForPipeline("sales_pipeline").map(_._1.table_name)
      == Seq("date_dim", "sales_fact"))
    // deactivate hides from the active list but not from get
    assert(md.deactivatePipeline("stores_pipeline"))
    assert(!md.listActivePipelines().exists(_.pipeline_name == "stores_pipeline"))
    assert(md.getPipeline("stores_pipeline").isDefined)
    assert(!md.deactivatePipeline("nope"))
    // register upserts and reactivates
    md.registerPipeline(PipelineMd("stores_pipeline", "stores", "re", true))
    assert(md.listActivePipelines().exists(_.pipeline_name == "stores_pipeline"))
    // watermark update persists
    assert(md.updateTableWatermark("sales_fact", "sale_date", "2026-01-01"))
    assert(md.getTable("sales_fact").exists(_.last_loaded_value == "2026-01-01"))
    // source-scoped table listing
    assert(md.listActiveTablesForSource("sales").map(_.table_name).toSet
      == Set("date_dim", "sales_fact"))
    // DataFrame views are queryable
    assert(md.pipelinesDf(spark).count() == 4)
    assert(md.tablesDf(spark)
      .filter(org.apache.spark.sql.functions.col("last_loaded_value")
        === "2026-01-01").count() == 1)
  }

  test("run and stage logs append and are readable as JSON") {
    val dir = java.nio.file.Files.createTempDirectory("cp_logs").toString
    val sink = new LogSink(dir)
    val rid = sink.newRunId()
    sink.logRun(RunLog(rid, "p", "STARTED", sink.now(), null, null))
    sink.logRun(RunLog(rid, "p", "FAILED", sink.now(), sink.now(),
      "boom \"quoted\"\nnewline"))
    val runs = spark.read.json(s"$dir/etl_run_log.jsonl")
    assert(runs.count() == 2)
    assert(runs.filter(org.apache.spark.sql.functions.col("error")
      .contains("quoted")).count() == 1)
  }
}
