package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * {"metric","value","unit","queries","sf","reps","spread","errors"}.
  *
  * Methodology (designed so a number can be trusted, not just read):
  *  - the session is warmed with a trivial scan first so the first
  *    timed query does not pay JVM/session startup;
  *  - reps are INTERLEAVED, not consecutive: rep r runs ALL queries in
  *    a seeded-shuffled order before rep r+1 starts. All queries share
  *    one JVM/session, so GC pressure, ContextCleaner timing and
  *    block-manager state couple neighbors — consecutive reps of one
  *    query all land in the same session regime and a median of them
  *    can still be pure session noise (round 3 measured 7.9x swings on
  *    byte-identical code this way). Shuffling per rep gives each
  *    query three different neighborhoods;
  *  - between queries the cache is cleared and (unless
  *    SPARK_GRAFT_BENCH_GC=0) a System.gc() drops dead blocks and
  *    finished-query garbage, so one query's residue cannot throttle
  *    the next;
  *  - the per-query MEDIAN is reported (driver contract), and the full
  *    [min, median, max] spread is emitted under "spread" so a
  *    regression can be told apart from variance: if the spread
  *    brackets both rounds' numbers the swing is noise, not a plan
  *    change.
  *
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
    val gcBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // the default codegen class cache holds 100 entries — BELOW the
      // registered query count, so interleaved reps would recompile
      // every generated stage on every rep (measured: +0.3-2s on
      // codegen-heavy queries). A long-lived session serving a hundred
      // distinct queries should size this cache accordingly; the bench
      // then measures steady-state plans, not Janino compile time.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: session, codegen, file listing
    Tables.load(spark, sfDir, "lineitem").count()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val times = names.map(n =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    for (rep <- 1 to reps) {
      // deterministic per-rep shuffle: every query gets a different
      // neighborhood each rep (fixed seeds keep runs reproducible)
      val order = new scala.util.Random(0x9E3779B9L * rep).shuffle(names)
      for (name <- order if !errors.contains(name)) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times(name) += (System.nanoTime() - t0) / 1e9
        } catch {
          case NonFatal(e) =>
            val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
            System.err.println(s"BENCH FAILURE in $name -> $msg")
            errors(name) = msg.take(300)
        } finally {
          // queries own caches for intra-query reuse; drop them (and,
          // optionally, dead blocks via an explicit GC) so one query's
          // residue cannot throttle the next
          spark.catalog.clearCache()
          if (gcBetween) System.gc()
        }
      }
    }
    val results = names.map { name =>
      val ts = times(name).sorted
      if (errors.contains(name) || ts.isEmpty) (name, -1.0, -1.0, -1.0)
      else (name, ts.head, ts(ts.length / 2), ts.last)
    }
    val qs = results.map { case (k, _, med, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, lo, med, hi) => "\"" + k + s"""\":[$lo,$med,$hi]""" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._3).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","reps":$reps,"spread":$spread,"errors":$errJson}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
