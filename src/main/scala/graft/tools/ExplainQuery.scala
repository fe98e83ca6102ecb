package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of a registered query:
  * runMain graft.tools.ExplainQuery <name> [sfDir]
  *
  * Same session config as [[TimeQuery]] so the plan matches what
  * Bench and Verify execute (broadcast threshold, shuffle
  * partitions). Use to audit the shapes the registry comments claim
  * — broadcast vs shuffle joins, partial aggregation, pushed
  * filters, whole-stage codegen spans — before trusting a timing.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // default to sf0.1 — the scale Bench/TimeQuery run at — so
    // size-stat-driven choices (broadcast vs shuffle, AQE splits) in
    // the printed plan match what the bench actually executes
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
