package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures whether [[graft.ext.Skew.saltedJoin]] actually beats (or
  * at least matches) Spark's own AQE skew-join handling on a genuinely
  * skewed key — the evidence VERDICT r8 asked for. The operator
  * hash-matches its oracle, but correctness says nothing about whether
  * the salt is worth its dim-side replication once AQE can split
  * skewed shuffle partitions at runtime.
  *
  * Fixture: a synthetic fact of `rows` rows in which ONE key carries
  * `hotPct`% of all rows (the "celebrity key" shape — a handful of
  * keys owning a double-digit share of a 100 TB fact) joined to a
  * 1M-row dim. Broadcast is disabled: at probe scale the dim would
  * broadcast and make BOTH strategies moot, but the 100 TB regime this
  * operator exists for is a dim too large to broadcast, i.e. a shuffle
  * join. AQE's skew thresholds are lowered proportionally
  * (8 MiB advisory / 16 MiB skew threshold vs the 64 MiB / 256 MiB
  * defaults) so the runtime split engages at probe scale exactly as
  * the defaults would on executor-sized partitions.
  *
  * Variants timed (3 reps each, median, cache-clear + GC between):
  *   plain_aqe_skew  — plain equi-join, AQE skew-join ON (the default)
  *   plain_no_skew   — plain equi-join, AQE skew-join OFF (what the
  *                     salt competed against pre-AQE)
  *   salted_16       — Skew.saltedJoin, saltFactor 16
  *
  * Usage: runMain graft.tools.SkewProbe [rows] [hotPct] [reps]
  * Findings land in SCALE.md ("salted join vs AQE").
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val hotPct = if (args.length > 1) args(1).toInt else 30
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fact: hotPct% of rows on key 0, the rest uniform over 1M keys;
    // dim: every key once. Both deterministic (no RNG) so every
    // variant and rep joins byte-identical inputs. The incompressible
    // `payload` column is load-bearing: it is aggregated after the
    // join, so it survives column pruning and SHUFFLES with the fact —
    // without it the fact side shuffles a lone near-constant key
    // column whose lz4 blocks are so small the hot partition never
    // crosses AQE's skew threshold, and the probe would measure AQE's
    // detection floor, not its split (a real fact row always carries
    // payload columns past the join)
    val nKeys = 1000000L
    def fact = spark.range(rows).select(col("id"),
      xxhash64(col("id") + 1).as("payload"),
      when(pmod(col("id"), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"))
    def dim = spark.range(nKeys).select(col("id").as("dk"),
      (col("id") * 7 % 97).as("dval"))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var skewMark = false
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        // pmod keeps the payload checksum inside int64 under ANSI
        val q = mk.agg(count(lit(1)), sum(col("dval")),
          sum(pmod(col("payload"), lit(1000))))
        // collect(), NOT head(): head wraps the plan in its own
        // QueryExecution, leaving q's adaptive plan unexecuted and the
        // skew marker below permanently false
        val r = q.collect()(0)
        val s = (System.nanoTime() - t0) / 1e9
        require(r.getLong(0) == rows, s"$label lost rows: ${r.getLong(0)}")
        // did AQE's OptimizeSkewedJoin actually rewrite this run's plan?
        skewMark ||= q.queryExecution.executedPlan.toString.contains("skew=true")
        s
      }.sorted
      println(f"[skewprobe] $label%-16s min ${ts.head}%.2f median " +
        f"${ts(ts.length / 2)}%.2f max ${ts.last}%.2f s  aqe_split=$skewMark")
    }

    def withSkewJoin(on: Boolean)(body: => Unit): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      try body
      finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }

    println(s"[skewprobe] rows=$rows hotPct=$hotPct reps=$reps " +
      s"(one warm-up per variant, untimed)")
    // untimed warm-ups: file-less range inputs, so this warms codegen only
    fact.join(dim, col("k") === col("dk")).agg(count(lit(1))).head()

    withSkewJoin(on = true) {
      time("plain_aqe_skew")(fact.join(dim, col("k") === col("dk")))
    }
    // OptimizeSkewedJoin declines to split when the split would add a
    // shuffle for a downstream requirement; force it so AQE shows its
    // best case, not its conservative default
    withSkewJoin(on = true) {
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      try time("plain_aqe_forced")(fact.join(dim, col("k") === col("dk")))
      finally spark.conf
        .set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    }
    withSkewJoin(on = false) {
      time("plain_no_skew")(fact.join(dim, col("k") === col("dk")))
    }
    withSkewJoin(on = true) {
      time("salted_16")(graft.ext.Skew.saltedJoin(
        fact, dim, "k", "dk", saltFactor = 16, spread = col("id")))
    }
    spark.stop()
  }
}
