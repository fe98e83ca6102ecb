package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * {"metric","value","unit","queries","sf","reps","errors"}.
  *
  * The session is warmed with a trivial scan first so the first timed
  * query does not pay JVM/session startup. Each query runs
  * SPARK_GRAFT_BENCH_REPS times (default 3) and reports the per-query
  * MEDIAN, so one GC pause or compilation stall cannot skew a figure.
  * The JSON line is also written to SPARK_GRAFT_BENCH_OUT (default
  * BENCH_LOCAL.json) because stdout gets interleaved with sbt logging.
  * Query failures are NOT swallowed: they are printed to stderr as they
  * happen, listed in the "errors" field, and make the exit code 1 — a
  * crashing query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: session, codegen, file listing
    Tables.load(spark, sfDir, "lineitem").count()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).iterator.map { _ =>
        if (errors.contains(name)) -1.0
        else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          } catch {
            case NonFatal(e) =>
              val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              System.err.println(s"BENCH FAILURE in $name -> $msg")
              errors(name) = msg.take(300)
              -1.0
          } finally {
            // queries own caches for intra-query reuse; drop them so one
            // query's cache residue cannot throttle the next
            spark.catalog.clearCache()
          }
        }
      }.toSeq
      val median =
        if (errors.contains(name)) -1.0
        else times.sorted.apply(times.length / 2)
      (name, median)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","reps":$reps,"errors":$errJson}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
