package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query execution profile for optimization work:
  * runMain graft.tools.QueryProfile <name> [sfDir]
  *
  * Runs the query once untimed (warm-up: codegen, file listing, any
  * session staging), then once instrumented, and prints
  *  - wall seconds of the instrumented run,
  *  - jobs / stages / tasks launched (the driver-round-trip count a
  *    multi-action plan hides from explain output),
  *  - summed executor run/cpu time and shuffle bytes written,
  *  - the EXECUTED plan (after AQE re-optimization: real join
  *    strategies, coalesced partition counts, reused exchanges —
  *    `explain` before execution shows none of those).
  *
  * The job/stage/task counters are the per-query cost model for the
  * bench's latency-bound regime at sf0.1: most registered queries are
  * seconds of fixed orchestration (sequential jobs, exchange
  * round-trips, blocking materializations) over milliseconds of data,
  * so the count of blocking jobs is the first number to shrink.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.Tables.load(spark, sfDir, "lineitem").count() // session warm
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up rep (also pays any staging)
    spark.catalog.clearCache()
    System.gc()

    val jobs = new AtomicInteger
    val tasks = new AtomicInteger
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val shufW = new AtomicLong
    // per-stage: (tasks, sum run ms, max task ms, shuffle write bytes)
    final class St {
      var n = 0; var run = 0L; var maxMs = 0L; var shw = 0L
      var done = false
    }
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val st = byStage.computeIfAbsent(s.stageInfo.stageId, _ => new St)
        st.done = true
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          val st = byStage.computeIfAbsent(t.stageId, _ => new St)
          st.synchronized {
            st.n += 1; st.run += m.executorRunTime
            st.maxMs = math.max(st.maxMs, m.executorRunTime)
            st.shw += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val tc0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val constructS = (System.nanoTime() - tc0) / 1e9
    val t0 = System.nanoTime()
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async; settle before reading the counters
    Thread.sleep(1500)
    println(f"[profile] $name rows=$n construct=$constructS%.3f s " +
      f"count=$wall%.3f s total=${constructS + wall}%.3f s")
    println(s"[profile] jobs=${jobs.get} stages=${byStage.size} " +
      s"tasks=${tasks.get}")
    println(f"[profile] executor run=${runMs.get / 1e3}%.2f s " +
      f"cpu=${cpuNs.get / 1e9}%.2f s " +
      f"shuffle_write=${shufW.get / 1048576.0}%.2f MB")
    val heavy = byStage.entrySet().toArray(Array.empty[java.util.Map.Entry[Int, St]])
      .sortBy(-_.getValue.run).take(12)
    heavy.foreach { e =>
      val s = e.getValue
      println(f"[stage] id=${e.getKey}%-4d tasks=${s.n}%-4d " +
        f"run=${s.run / 1e3}%7.2f s max_task=${s.maxMs / 1e3}%6.2f s " +
        f"shw=${s.shw / 1048576.0}%8.2f MB")
    }
    println("[profile] executed plan (final, post-AQE):")
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
