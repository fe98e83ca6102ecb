package graft.tools

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan lint: renders every ExtQueries plan at
  * a given SF and reports scale anti-patterns — CartesianProduct
  * (never acceptable) and BroadcastNestedLoopJoin (acceptable ONLY
  * when the broadcast side is metadata-sized by construction: 1-row
  * stats frames, probe-quantile literals, bounded grids). The spec
  * twin (`RegistryPlanLintSpec`) pins the exact allowlist so a new
  * query can't quietly ship a cartesian plan.
  *
  * runMain graft.tools.PlanLint [sfDir]
  */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.registry.ExtQueries.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj)
          println(s"[planlint] $name cartesian=$cart bnlj=$bnlj")
      } catch {
        case NonFatal(e) =>
          println(s"[planlint] $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    println("[planlint] done")
    spark.stop()
  }
}
