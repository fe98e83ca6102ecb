package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: dump optimized-plan lines containing the quality-score
  * punct-regex marker for the score-consumer queries, so the plan
  * lint can pin per-site expected counts with justifications. */
object ScoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val marker = "[^A-Za-z0-9 ]"
    for (name <- args.drop(1)) {
      val qe = graft.registry.ExtQueries.queries(name)(spark, sfDir)
        .queryExecution
      println(s"===== $name")
      qe.optimizedPlan.toString.linesIterator.zipWithIndex.foreach {
        case (l, i) if l.contains(marker) =>
          println(f"$i%4d ${l.take(300)}")
        case _ =>
      }
    }
    spark.stop()
  }
}
