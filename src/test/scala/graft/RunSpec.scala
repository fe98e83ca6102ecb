package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Drives the full CLI path in-process (graft.Run.run returns the exit
  * code main would pass to sys.exit). */
class RunSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def argv(extra: String*): Seq[String] =
    extra ++ Seq("--data", sf0001,
      "--warehouse", tmp("run_wh"), "--logs", tmp("run_logs"))

  test("bad input prints usage and exits 1") {
    assert(Run.run(Seq("--pipeline_name", "nonsense"), () => spark) == 1)
    assert(Run.run(Seq("--bogus_flag", "x"), () => spark) == 1)
    assert(Run.run(Seq.empty, () => spark) == 1)
  }

  test("dry-run validates config + connectivity without executing") {
    val wh = tmp("dry_wh")
    val rc = Run.run(Seq("-p", "customers", "--dry-run", "--data", sf0001,
      "--warehouse", wh, "--logs", tmp("dry_logs")), () => spark)
    assert(rc == 0)
    // nothing loaded
    assert(!Files.exists(Paths.get(wh, "customers_dim")))
    // a missing data dir fails the dry run
    assert(Run.run(Seq("-p", "customers", "-d", "--data", "/no/such/dir",
      "--warehouse", wh, "--logs", tmp("dry_logs2")), () => spark) == 1)
  }

  test("named pipeline executes end-to-end in load order with text logging") {
    val wh = tmp("run_wh")
    val logs = tmp("run_logs")
    val rc = Run.run(Seq("--pipeline_name", "stores", "--data", sf0001,
      "--warehouse", wh, "--logs", logs), () => spark)
    assert(rc == 0)
    val loaded = spark.read.parquet(s"$wh/stores_dim")
    assert(loaded.count() > 0)
    assert(loaded.columns.contains("store_region"))
    // rotating text log carries the reference's line format
    val lines = Files.readAllLines(Paths.get(logs, "etl_logs.log")).asScala
    assert(lines.exists(_.contains("| runner | stores_pipeline |")))
    assert(lines.exists(_.contains("Pipeline invocation started")))
    // run/stage JSONL sink was written too
    assert(Files.exists(Paths.get(logs, "etl_run_log.jsonl")))
  }

  test("sales pipeline loads date_dim before sales_fact per metadata order") {
    val wh = tmp("run_wh_sales")
    val rc = Run.run(Seq("-p", "sales", "--data", sf0001,
      "--warehouse", wh, "--logs", tmp("run_logs_sales")), () => spark)
    assert(rc == 0)
    assert(spark.read.parquet(s"$wh/date_dim").count() > 0)
    assert(spark.read.parquet(s"$wh/sales_fact").count() > 0)
  }
}
