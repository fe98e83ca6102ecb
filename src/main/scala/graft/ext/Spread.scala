package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan-parallelism floor for CPU-dense-per-byte
  * operators (tokenizing, shingling, hashing): r19 optimization.
  *
  * The problem (guide §2/§6, measured r19): Spark sizes scan splits
  * and AQE partition coalescing by BYTES, but a text operator's CPU
  * is orders of magnitude denser per byte than its input suggests —
  * shingle-hashing a 584 KB single-file corpus is ~3 s of CPU that a
  * byte-based planner happily leaves on ONE task (a small parquet
  * file is one row group = one real split), serializing the whole
  * map stage while 31 cores idle. Measured at sf0.1: the skipgram
  * scan 1.2 s -> 0.44 s, the containment pair core 2.9 s -> 1.3 s
  * once the scan is spread.
  *
  * The fix is a conditional round-robin spread applied at the entry
  * of the known CPU-dense operators: when the input's OPTIMIZER SIZE
  * ESTIMATE is under `spark.graft.spreadMaxBytes` (default 64 MB —
  * an input small enough that one extra tiny exchange is free) and
  * the operator is about to fan its bytes out into heavy per-row
  * work, repartition to a width derived from the cluster
  * (`defaultParallelism / 4`, floor 2 — measured sweet spot on the
  * bench box: beyond that, concurrent hash-heavy tasks thrash the
  * shared LLC and per-task overhead eats the gain; conf
  * `spark.graft.spreadPartitions` overrides). Above the byte bound
  * the call is a NO-OP: a corpus at production scale arrives in
  * thousands of splits and needs no help — this floor never adds an
  * exchange to a job that already has parallelism, so there is
  * nothing to mis-tune at 100 TB.
  *
  * Row-order safety: every registered query is value-checked against
  * a DuckDB oracle that sorts rows, and every aggregate in this
  * library is order-proof by contract (DECIMAL sums, array_sort
  * before collect_list, value-keyed keep-first), so a round-robin
  * placement change cannot change any result.
  */
object Spread {

  /** Spread `df` across the derived width if its optimizer size
    * estimate is small; identity otherwise. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption("spark.graft.spreadMaxBytes")
      .map(_.toLong).getOrElse(64L << 20)
    if (maxBytes <= 0) return df // conf escape hatch: disable
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) df.repartition(width(spark)) else df
  }

  /** Derived spread width: a quarter of the cluster's default
    * parallelism (floor 2). Rationale: the spread inputs are small
    * (bytes-bounded above), so tasks are CPU-bound hash/tokenize
    * loops — measured on the bench box, widths at or above the core
    * count INFLATE total CPU ~3x (LLC thrash) while width/4 keeps the
    * map stage parallel without contention; a cluster-scale session
    * derives a proportionally wider floor from its own parallelism. */
  def width(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.spreadPartitions").map(_.toInt)
      .getOrElse(math.max(2, spark.sparkContext.defaultParallelism / 4))
}
