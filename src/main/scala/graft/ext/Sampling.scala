package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training corpora.
  *
  * `df.sample()` draws from a per-partition RNG: re-reading the corpus
  * with different partitioning (or adding one file) reshuffles who is
  * sampled — poison for train/val hygiene, where a row must NEVER
  * migrate between splits across runs. Everything here instead keys
  * the decision on an engine-portable content/id hash
  * ([[TextOps.hex60]] of the key, reduced into [0, 1e6)): the same row
  * maps to the same bucket on any cluster, any partitioning, any
  * engine — and therefore the sample itself is oracle-checkable SQL.
  *
  * Scale shape: every operator is a per-row filter/projection — narrow
  * maps, no shuffle, fully codegen'd.
  */
object Sampling {

  /** Number of hash buckets; rates quantize to 1/1e6. */
  val Buckets = 1000000L

  /** The row's deterministic bucket in [0, Buckets): hex60 of
    * (salt + key-as-string) mod Buckets. Distinct salts give
    * independent drawings from the same key space. */
  def bucket(key: Column, salt: String = ""): Column =
    TextOps.hex60(concat(lit(salt), key.cast("string"))) % Buckets

  /** Deterministic Bernoulli sample: keeps a row iff its bucket falls
    * below fraction * Buckets. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(bucket(key, salt) < (fraction * Buckets).toLong)
  }

  /** Deterministic train/val/test assignment: the canonical split
    * column for corpus hygiene. Bucket layout: [0, test) -> "test",
    * [test, test+val) -> "val", rest -> "train". */
  def splitColumn(key: Column, valPct: Double, testPct: Double,
                  salt: String = ""): Column = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 1.0)
    val b = bucket(key, salt)
    when(b < (testPct * Buckets).toLong, "test")
      .when(b < ((testPct + valPct) * Buckets).toLong, "val")
      .otherwise("train")
  }

  /** Deterministic fixed-size sample: the k rows with the smallest
    * (bucket, key) — a uniform k-row draw that is stable across
    * partitioning and engines (key breaks bucket collisions, so the
    * order is total for unique keys). Plans as TakeOrdered: each task
    * forwards its local top-k and the driver merges k rows per task —
    * never a global sort. */
  def fixedSizeSample(df: DataFrame, key: Column, k: Int,
                      salt: String = ""): DataFrame =
    df.withColumn("_graft_bucket", bucket(key, salt))
      .orderBy(col("_graft_bucket"), key)
      .limit(k)
      .drop("_graft_bucket")

  /** Stratified deterministic sample: per-stratum keep rates (e.g.
    * downsample dominant languages, keep all rare ones). Strata
    * without a configured rate use `default`. Rates are converted to
    * integer bucket thresholds at PLAN time (one double multiply on
    * the driver, never per-row float math an oracle could round
    * differently) and ride in a literal map — no join, still a narrow
    * filter. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       rates: Map[String, Double], default: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val thresholds = rates.map { case (k, r) => k -> (r * Buckets).toLong }
    val th = coalesce(
      element_at(typedlit(thresholds), strata.cast("string")),
      lit((default * Buckets).toLong))
    df.filter(bucket(key, salt) < th)
  }

  /** Deterministic weighted fixed-size sample — priority sampling
    * (Duffield, Lund & Thorup 2007): each row draws a uniform value
    * (its deterministic [[bucket]]) and gets priority u/w; the k
    * SMALLEST priorities win, so a row's inclusion probability scales
    * with its weight while the total sample size is exactly k. The
    * priority is integer math — `bucket * Buckets div weight` —
    * with a (priority, key) total order, so the draw is replayable on
    * any engine and partitioning, like every sampler here. Weights are
    * SATURATED into [1, Buckets): `u * Buckets div w` has ~u*Buckets/w
    * distinct priority levels, so a weight at or above Buckets (1e6)
    * would quietly degenerate toward the key tiebreak — such rows
    * clamp to Buckets-1 (max-weight behavior: a >=1M-token document
    * draws like any other maximally-heavy row) instead of aborting the
    * whole job on one data-dependent row (the pre-r11 refusal made a
    * single pathological document unrecoverable). Only weight RATIOS
    * matter, so callers wanting full resolution above the bound
    * rescale before sampling. Plans as TakeOrdered: per-task
    * local top-k, driver merges — never a global sort. */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
                     k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, "prioritySample needs k >= 1")
    val w = weight.cast("long")
    df.withColumn("_graft_u", bucket(key, salt) * Buckets)
      .withColumn("_graft_w",
        least(greatest(w, lit(1L)), lit(Buckets - 1L)))
      .withColumn("_graft_pri", expr("_graft_u div _graft_w"))
      .orderBy(col("_graft_pri"), key)
      .limit(k)
      .drop("_graft_u", "_graft_w", "_graft_pri")
  }

  /** Greedy k-center coreset (farthest-point traversal, Gonzalez
    * 1985): pick the min-id seed, then k-1 times the point FARTHEST
    * from the chosen set — the classic 2-approximation diversity
    * sample for "cover the embedding space with k exemplars"
    * (diverse finetuning subsets, eval-set seeding, cluster init).
    *
    * Determinism contract: per-point distance-to-set is kept as a
    * FLOOR-ppm-quantized long of the in-order squared-distance fold
    * (the [[graft.functions.DotProduct]] of the elementwise double
    * difference with itself — the probed bit-identical fold shape), so
    * every argmax compares LONGS with a vec_id tiebreak, and an SQL
    * oracle replays the trace exactly. Floats never order anything.
    *
    * Scale shape: O(n·k) — each round is one narrow `least(mind,
    * dist-to-new-center)` map over the working set (the new center
    * rides in as a 64-float literal) plus one TakeOrdered argmax; no
    * shuffle, no cross join. k driver actions of 1 row each. Each
    * round's state is EAGERLY RE-MATERIALIZED ([[Materialize.eager]] —
    * lineage truncation without a driver collect, since the state is
    * corpus-sized): without this, round j's `least(...)` chain embeds
    * every previous round's distance map and the argmax re-evaluates
    * all j-1 of them — O(n·k²) expression work hiding under a plan
    * that reads O(n·k). At corpus scale you run this on the
    * deterministic-sample output, not the raw 100 TB (compose with
    * [[deterministicSample]]).
    *
    * Stops early (returning fewer than k rows) once the farthest
    * remaining point is at ppm-distance 0 from the chosen set: every
    * remaining point then coincides with a chosen center, and
    * continuing would re-select already-chosen ids as duplicate trace
    * rows. Asking for k > #distinct-points yields #distinct rows.
    *
    * Returns the selection TRACE: (sel_idx, vec_id, dist_ppm) — the
    * seed's dist_ppm is NULL (no chosen set existed yet). */
  def kCenterCoreset(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame =
    kCenterCoresetWithState(emb, idCol, vecCol, k)._1

  /** Testing seam: also returns the final working-set state so a spec
    * can assert the plan-shape contract (one distance expression in
    * the final round's plan, not k — the materialization actually
    * truncated the chain). */
  private[graft] def kCenterCoresetWithState(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, "kCenterCoreset needs k >= 1")
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("v")).cache()
    try {
      def distPpm(center: Seq[Float]): Column = {
        val diff = zip_with(col("v"), typedlit(center),
          (x, y) => x.cast("double") - y.cast("double"))
        floor(graft.functions.VectorFunctions.dotNative(diff, diff)
          * 1000000d).cast("long")
      }
      val seed = base.orderBy(col("vec_id")).limit(1).head()
      var chosen = List[(Long, Long, java.lang.Long)](
        (0L, seed.getLong(0), null))
      var state = Materialize.eager(
        base.withColumn("mind", distPpm(seed.getSeq[Float](1))))
      var exhausted = false
      for (j <- 1 until k if !exhausted) {
        val sel = state.orderBy(col("mind").desc, col("vec_id"))
          .limit(1).head()
        val (id, mind) = (sel.getLong(0), sel.getAs[Long]("mind"))
        if (mind <= 0L) exhausted = true // all remaining points coincide
        else {
          chosen ::= ((j.toLong, id, Long.box(mind)))
          val cvec = base.filter(col("vec_id") === id).head().getSeq[Float](1)
          state = Materialize.eager(state.withColumn("mind",
            least(col("mind"), distPpm(cvec))))
        }
      }
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("sel_idx", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("dist_ppm", LongType, nullable = true)))
      (spark.createDataFrame(
        spark.sparkContext.parallelize(chosen.reverse.map {
          case (i, id, d) => org.apache.spark.sql.Row(i, id, d)
        }, numSlices = 1), schema), state)
    } finally base.unpersist()
  }
}
