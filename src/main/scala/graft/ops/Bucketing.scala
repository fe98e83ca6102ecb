package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-hashed) table layout — the co-located-join primitive.
  *
  * At 100 TB the dominant cost of a fact-to-fact equi-join is the
  * shuffle of both sides. Writing each table ONCE, hash-bucketed and
  * sorted by its join key, moves that shuffle from every query to the
  * write path: a join between two tables bucketed into the same count
  * on their join keys reads both sides already co-partitioned, and
  * the exchange disappears from the plan (pinned by BucketingSpec
  * with broadcast disabled). This is the layout the reference cannot
  * express at all — its single-node store has no notion of
  * distribution — and the single biggest repeated-query win Spark's
  * catalog layer offers.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table and
    * return the catalog-backed frame. The input is repartitioned by
    * the bucket expression into exactly `nBuckets` tasks first, so
    * each bucket is ONE file — without this, every upstream task
    * writes its own file per bucket and a 1000-task write yields
    * 1000 x nBuckets small files, the classic bucketing trap.
    *
    * `path` is a Hadoop path (plain local, `file:`, `hdfs:`, `s3a:`
    * ...): the stale-layout delete goes through the path's own
    * `FileSystem`, so staging works wherever the cluster's shared
    * storage lives, not only on the driver's local disk. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  // per-call staging id: two colocatedJoins in one session — even on
  // the same keys at the same width, sequential or concurrent — never
  // share a staging table or directory
  private val stagingId = new AtomicLong(0L)

  /** Equi-join two frames through bucketed staging: both sides land
    * bucketed into the same `nBuckets` on their join keys, then join
    * co-located — no shuffle exchange on either side. Staging tables
    * are uniquely named per call and land under `scratchRoot` (any
    * Hadoop path — shared FS on a cluster), reclaimed at exit.
    *
    * The write cost is real but paid once; every subsequent join on
    * the bucketed layout is exchange-free. Callers doing one-shot
    * joins should shuffle instead — this is the repeated-query /
    * curated-layout path. */
  def colocatedJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    nBuckets: Int, scratchRoot: String): DataFrame = {
    require(leftKey != rightKey,
      s"colocatedJoin needs distinct key names (got '$leftKey' on both " +
        "sides): col(key) === col(key) is ambiguous after the join — " +
        "rename one side before staging")
    val spark = left.sparkSession
    val id = stagingId.incrementAndGet()
    val lT = s"graft_bkt_l_${leftKey}_${nBuckets}_$id"
    val rT = s"graft_bkt_r_${rightKey}_${nBuckets}_$id"
    graft.ext.Scratch.reclaimOnExitHadoop(
      scratchRoot, spark.sessionState.newHadoopConf())
    val lB = writeBucketed(left, lT, leftKey, nBuckets, s"$scratchRoot/$lT")
    val rB = writeBucketed(right, rT, rightKey, nBuckets, s"$scratchRoot/$rT")
    lB.join(rB, col(leftKey) === col(rightKey))
  }

  /** App-scoped scratch root for bucketed staging (session-keyed so
    * concurrent drivers on one machine cannot clobber each other).
    * Local-mode default; on a cluster pass a shared-FS root (hdfs:/
    * s3a:) to [[colocatedJoin]] instead. */
  def scratchRoot(spark: SparkSession): String =
    s"${sys.props("java.io.tmpdir")}/graft_bucketed_" +
      spark.sparkContext.applicationId
}
