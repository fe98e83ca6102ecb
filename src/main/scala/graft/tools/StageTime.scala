package graft.tools

import org.apache.spark.sql.SparkSession

/** Print per-stage sales pipeline seconds N times at a given SF —
  * the feedback loop for TRANSFORM_P1 work.
  * runMain graft.tools.StageTime [sfDir] [reps] */
object StageTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.load(spark, sfDir, "lineitem").count() // warm
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val stages = graft.registry.PipelineQueries.salesStageSeconds(spark, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      graft.registry.PipelineQueries.clearScratch(spark)
      System.gc()
      println(f"rep $r: wall=$wall%.2f  " +
        stages.map { case (k, v) => f"$k=$v%.2f" }.mkString("  "))
    }
    spark.stop()
  }
}
