package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-size frequency/cardinality sketches with engine-portable
  * integer arithmetic — the 100 TB answer to "how often / how many
  * distinct" questions that do not justify an exact global aggregate.
  *
  * Both sketches follow the library's exactness discipline: every
  * hash is [[TextOps.hex60]] (md5-derived, identical in any engine),
  * every estimate is integer/decimal arithmetic with a deterministic
  * rounding point, so the SKETCH ITSELF is oracle-checkable — a
  * width/depth/register change that silently degrades accuracy fails
  * the hash gate, exactly like the ANN/LSH recall reports.
  *
  * Scale shape: both sketches are one groupBy over (row-stream x
  * small constant) whose RESULT is metadata-sized (depth x width,
  * resp. sources x registers); partial aggregation runs map-side, the
  * shuffle carries only sketch cells. Merging two corpora's sketches
  * is cell-wise (+ / max) — the mergeability that makes them
  * per-partition/per-day composable where exact counts are not.
  */
object Sketches {

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over a token
    * stream: depth independent hash rows, width slots each. Estimates
    * only ever OVERCOUNT (min over depth rows bounds the collision
    * inflation), never undercount. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Row d's hash of a token: hex60 of "d:token" mod width — the d
    * prefix makes the depth rows independent hash functions. `d` may
    * be a literal or the exploded depth column. */
  private def cmsSlot(d: Column, token: Column): Column =
    TextOps.hex60(concat(d.cast("string"), lit(":"), token)) % CmsWidth

  /** The sketch table: (d, slot, cnt) — CmsDepth x CmsWidth cells max,
    * metadata-scale whatever the corpus size. `tokens` is one token
    * OCCURRENCE per row. One scan: the depth dimension rides in as an
    * exploded literal array, not CmsDepth re-reads of the stream. */
  def cmsBuild(tokens: DataFrame, tokenCol: String): DataFrame =
    tokens
      .select(col(tokenCol).as("_t"),
        explode(typedlit((0 until CmsDepth).toList)).as("d"))
      .select(col("d"), cmsSlot(col("d"), col("_t")).as("slot"))
      .groupBy(col("d"), col("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `terms` (one `term` row each) against a
    * built sketch: min over the depth rows of the addressed cells.
    * The sketch side is metadata-sized, so the join broadcasts.
    * LEFT join + coalesce(0): a cell no value ever hashed into counts
    * as zero, so a never-seen term estimates 0 (instead of vanishing)
    * and the min stays a true upper bound over ALL depth rows rather
    * than the touched subset. */
  def cmsEstimate(sketch: DataFrame, terms: DataFrame): DataFrame =
    terms
      .select(col("term"),
        explode(typedlit((0 until CmsDepth).toList)).as("d"))
      .select(col("term"), col("d"),
        cmsSlot(col("d"), col("term")).as("slot"))
      .join(broadcast(sketch), Seq("d", "slot"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** HyperLogLog (Flajolet et al. 2007) distinct count in exact
    * integer arithmetic, 256 registers.
    *
    * Per value: h = hex60(v) (60 bits); register index = h % 256; the
    * remaining w = h div 256 (< 2^52) contributes
    * rho = 53 - length(bin(w)) — i.e. leading-zero count in the
    * 52-bit window plus one (bin() has no leading zeros in either
    * engine; the w = 0 row degenerates to rho 52 instead of 53, a
    * 2^-52-probability bias accepted for the shared closed form).
    * Register value = max rho.
    *
    * The harmonic mean is kept EXACT by scaling: sum(2^-rho) over all
    * m registers is computed as S = sum(2^(53 - rho)) + empty * 2^53
    * (a BIGINT <= 256 * 2^53), and the estimate
    * alpha_m * m^2 / (S / 2^53) becomes one decimal128 integer
    * division — no float accumulation anywhere, so any engine gets
    * the identical estimate. alpha_256 = 0.7213/(1 + 1.079/256) is
    * frozen at ppm precision (709270). The paper's small/large-range
    * corrections are deliberately omitted: the estimator is the raw
    * one, bias and all, because the contract is cross-engine
    * exactness of a FIXED formula, not best-in-class accuracy. */
  val HllRegisters = 256
  val HllAlphaPpm = 709270L

  /** Per-group raw HLL registers: (groupCols*, idx, rho). The
    * register index is the low 8 bits of the hash (bitwise AND), the
    * rho-source the remaining bits (bitwise shift) — exact integer
    * ops, never a float division that loses low bits past 2^53. */
  def hllRegisters(df: DataFrame, valueCol: Column,
                   groupCols: Seq[Column]): DataFrame = {
    val h = TextOps.hex60(valueCol)
    df.select(groupCols :+ (h % HllRegisters).as("idx") :+
        (lit(53L) - length(bin(shiftright(h, 8))).cast("long")).as("rho"): _*)
      .groupBy(groupCols :+ col("idx"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** alpha_256 * m^2 * 2^53, the constant numerator of the scaled
    * harmonic mean — an exact 27-digit integer, frozen as a
    * decimal128 literal shared with the SQL oracle (which spells the
    * same digits as a HUGEINT). */
  val HllNumerator: java.math.BigDecimal = new java.math.BigDecimal(
    (BigInt(HllAlphaPpm) * HllRegisters * HllRegisters *
      (BigInt(1) << 53)).bigInteger)

  /** Per-group HLL estimate: (groupCols*, hll_est BIGINT).
    * est = numerator div (S_all * 1e6), where S_all adds 2^53 for
    * each of the m registers no value hashed into. */
  def hllEstimate(df: DataFrame, valueCol: Column,
                  groupCols: Seq[Column]): DataFrame = {
    val m = HllRegisters.toLong
    hllRegisters(df, valueCol, groupCols)
      .groupBy(groupCols: _*)
      .agg(
        // the SQL form of shiftleft takes a column shift amount; the
        // Scala function pins it to a literal Int
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - rho AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("s_all",
        col("s_present") + (lit(m) - col("n_present")) * lit(1L << 53))
      .withColumn("hll_est",
        expr(s"CAST('${HllNumerator.toPlainString}' AS DECIMAL(38,0)) div " +
          "(CAST(s_all AS DECIMAL(38,0)) * 1000000)").cast("long"))
      .drop("s_present", "n_present", "s_all")
  }

  /** Equi-width histogram quantile estimator, REPORTED WITH ITS ERROR
    * against the exact nearest-rank quantile — the quantile member of
    * the sketch family: the histogram is one groupBy whose result is
    * `buckets` rows (metadata scale, cell-wise mergeable across
    * partitions/days exactly like the CMS/HLL states), where the exact
    * path must see every distinct value. As with the CMS/HLL/recall
    * reports, running the exact side next to the sketch is deliberate
    * spec-side cost: the error column itself is hash-verified, so a
    * bucket-count change cannot silently degrade the estimate.
    *
    * Determinism: bucket index is `floor((x - min) * B / (max - min))`
    * clamped to B-1 — one double expression shape (multiply BEFORE
    * divide, both engines) — and the estimate is the bucket's lower
    * edge at the nearest-rank cumulative walk `cum >= (q*n + 99) // 100`
    * (the library's winsorize/MAD convention). A degenerate column
    * (min == max) pins every row to bucket 0 on both engines via an
    * explicit guard rather than relying on 0/0 semantics.
    *
    * Scale shape of the EXACT side: on a continuous column the
    * distinct-value histogram is ~n rows, so a cumulative walk with an
    * unpartitioned `Window.orderBy(x)` is a single-task global sort —
    * the one shape this library bans. Both cumulative sums here use
    * the split-merge form proven by [[Windows.peakConcurrency]]
    * instead: prefix sums are computed WITHIN each estimate bucket
    * (a `partitionBy(b)` window — n/B rows per task, B-way parallel),
    * and the cross-bucket carry — sum of all earlier buckets' counts —
    * comes from a triangular broadcast join over the <= B-row bucket
    * totals (metadata-sized; O(B^2) pairs, trivial for any sane B).
    * Prefix sums split associatively at any cut, so the result is
    * identical to the global walk; the plan contains ZERO unpartitioned
    * windows (asserted in PlanShapeSpec). At larger scale, raising
    * `buckets` widens both the estimate grid and the exact-side
    * parallelism together.
    *
    * Output: one row per q — (q, est, exact, abs_err), doubles with
    * identical derivation on both engines. */
  def histQuantileError(df: DataFrame, value: Column, buckets: Int,
                        qs: Seq[Int]): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"quantiles must be integer percents in [1,100]: $qs")
    val vals = df.select(value.cast("double").as("x")).filter(!isnan(col("x")))
    val stats = broadcast(vals.agg(min(col("x")).as("mn"),
      max(col("x")).as("mx"), count(lit(1)).as("n")))
    val idx = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(lit(buckets - 1L),
        floor((col("x") - col("mn")) * buckets / (col("mx") - col("mn")))
          .cast("long")))
    // the ONE data-sized aggregation: per-(bucket, value) counts;
    // everything downstream is bucket-partitioned or metadata-sized
    val vhist = vals.join(stats).withColumn("b", idx)
      .groupBy(col("b"), col("x")).agg(count(lit(1)).as("c"))
    // local prefix sums, B-way parallel (never a global sort)
    val inBucket = Window.partitionBy(col("b")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vhist.withColumn("lcum", sum(col("c")).over(inBucket))
    val btot = vhist.groupBy(col("b")).agg(sum(col("c")).as("bc"))
    // carry(b) = counts in strictly earlier buckets — triangular
    // broadcast join over <= B rows in place of a running-sum window
    val carry = btot.as("cur").join(broadcast(btot.as("prev")),
        col("prev.b") < col("cur.b"), "left")
      .groupBy(col("cur.b").as("b"))
      .agg(coalesce(sum(col("prev.bc")), lit(0L)).as("carry"))
    val vcum = local.join(broadcast(carry), Seq("b"))
      .withColumn("cum", col("carry") + col("lcum"))
    // estimate side: the bucket histogram is btot itself (<= B rows);
    // inclusive cumulative counts via the same triangular form
    val hcum = btot.as("cur").join(broadcast(btot.as("prev")),
        col("prev.b") <= col("cur.b"))
      .groupBy(col("cur.b").as("b")).agg(sum(col("prev.bc")).as("cum"))
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = broadcast(qs.toDF("q"))
    val est = qdf.join(broadcast(hcum)).join(stats)
      .filter(col("cum") >= expr(s"(q * n + 99) div 100"))
      .groupBy(col("q"), col("mn"), col("mx"))
      .agg(min(col("b")).as("b_est"))
      .select(col("q"),
        (col("mn") + col("b_est") * (col("mx") - col("mn")) / buckets)
          .as("est"))
    val exact = qdf.join(stats)
      .join(vcum.select(col("x"), col("cum")))
      .filter(col("cum") >= expr(s"(q * n + 99) div 100"))
      .groupBy(col("q")).agg(min(col("x")).as("exact"))
    est.join(exact, Seq("q"))
      .select(col("q").cast("long").as("q"), col("est"), col("exact"),
        abs(col("est") - col("exact")).as("abs_err"))
  }

  /** KMV (k-minimum-values) pairwise distinct-overlap estimation
    * (Beyer et al. 2007; the theta-sketch set-operation idiom): each
    * class keeps only its k SMALLEST distinct portable item hashes;
    * for a class pair, the k smallest of the sketch UNION are a
    * uniform sample of the union's distinct items, so
    * |sample ∩ both sketches| / k estimates Jaccard — cross-class
    * audience/content overlap priced from k-row sketches instead of a
    * full distinct-intersection shuffle (the thing that matters when
    * each class holds billions of ids at 100 TB). Deterministic by
    * construction ([[TextOps.hex60]] item hashes, no RNG), so the
    * estimate itself is oracle-checkable. Output per unordered pair:
    * the KMV Jaccard estimate AND the exact Jaccard (the deliberate
    * audit cost every recall report in this library pays), both in
    * exact integer ppm.
    *
    * Scale shape: sketches are built with ONE distinct + a
    * class-partitioned bounded window (k rows kept per class); all
    * pair math happens on |classes| x k rows — metadata-sized
    * regardless of corpus row count. The exact side is one distinct
    * two-class co-membership agg; at production scale the truth
    * columns are what you drop, not the estimator. */
  def kmvJaccard(df: DataFrame, cls: Column, item: Column,
                 k: Int = 64): DataFrame = {
    val hashed = df.select(cls.as("cls"),
        TextOps.hex60(item.cast("string")).as("h")).distinct()
    val w = Window.partitionBy(col("cls")).orderBy(col("h"))
    val sk = hashed.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k).select(col("cls"), col("h"))
    // unordered pair frame: each pair's merged sketch = distinct union
    // of the two k-row sketches, re-cut to its k smallest
    val classes = sk.select(col("cls")).distinct()
    val pairCls = classes.as("x").join(broadcast(classes.as("y")),
        col("x.cls") < col("y.cls"))
      .select(col("x.cls").as("cls_a"), col("y.cls").as("cls_b"))
    val merged = pairCls.join(sk.select(col("cls").as("cls_a"), col("h")),
        Seq("cls_a"))
      .select(col("cls_a"), col("cls_b"), col("h"))
      .union(pairCls.join(sk.select(col("cls").as("cls_b"), col("h")),
          Seq("cls_b"))
        .select(col("cls_a"), col("cls_b"), col("h")))
      .distinct()
    val wp = Window.partitionBy(col("cls_a"), col("cls_b"))
      .orderBy(col("h"))
    val topU = merged.withColumn("_r", row_number().over(wp))
      .filter(col("_r") <= k)
    val inA = sk.select(col("cls").as("cls_a"), col("h"),
      lit(1L).as("in_a"))
    val inB = sk.select(col("cls").as("cls_b"), col("h"),
      lit(1L).as("in_b"))
    val est = topU.join(inA, Seq("cls_a", "h"), "left")
      .join(inB, Seq("cls_b", "h"), "left")
      .groupBy(col("cls_a"), col("cls_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(coalesce(col("in_a"), lit(0L)) * coalesce(col("in_b"), lit(0L)))
          .as("n_both"))
      .withColumn("kmv_jaccard_ppm", expr("n_both * 1000000 div k_used"))
    // exact truth: distinct items per class, co-membership counts
    val d = df.select(cls.as("cls"), item.cast("string").as("it")).distinct()
    val ex = d.as("x").join(d.as("y"),
        col("x.it") === col("y.it") && col("x.cls") < col("y.cls"))
      .groupBy(col("x.cls").as("cls_a"), col("y.cls").as("cls_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = d.groupBy(col("cls")).agg(count(lit(1)).as("n"))
    est.join(ex, Seq("cls_a", "cls_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("cls").as("cls_a"), col("n").as("n_a")),
        Seq("cls_a"))
      .join(sizes.select(col("cls").as("cls_b"), col("n").as("n_b")),
        Seq("cls_b"))
      .withColumn("exact_jaccard_ppm",
        expr("n_inter * 1000000 div (n_a + n_b - n_inter)"))
      .select(col("cls_a"), col("cls_b"), col("k_used"), col("n_both"),
        col("kmv_jaccard_ppm"), col("n_inter"), col("n_a"), col("n_b"),
        col("exact_jaccard_ppm"),
        abs(col("kmv_jaccard_ppm") - col("exact_jaccard_ppm"))
          .as("abs_err_ppm"))
  }

  /** Bloom-filter false-positive audit: simulate the exact filter a
    * runtime semi-join reduction would build (m bits, k independent
    * [[TextOps.hex60]] positions per key — the same portable-hash
    * family every sketch here uses, so the BIT PATTERN is
    * engine-replayable, unlike the Java `BloomFilter` in
    * [[graft.functions.Bloom]] whose murmur layout only the JVM can
    * reproduce), then MEASURE its false-positive rate against a
    * labeled query set and price it against the occupancy-derived
    * expectation fill^k. The report is the sizing evidence behind
    * every bloom-prefiltered join: a measured fpr_ppm far above
    * occupancy^k means the hash family is misbehaving; occupancy near
    * saturation means m is undersized for n.
    *
    * Exactness: fill^k in ppm is bitsSet^k * 1e6 div m^k — all int64
    * for m <= 4096, k <= 3 (4096^3 * 1e6 < 2^63), floor-div both
    * engines.
    *
    * Scale shape: the inserted-bit table is bounded at m rows —
    * broadcast by construction however large the insert set — so the
    * probe side is one narrow map (k hashes per key) + a broadcast
    * join + one key-keyed agg; the report is a single-row rollup.
    * Inserting is one distinct + explode(k) + distinct, shuffles
    * bounded by min(n*k, m) rows. */
  def bloomFprReport(insert: DataFrame, query: DataFrame,
                     keyCol: String, memberCol: String,
                     m: Int = 4096, k: Int = 3): DataFrame = {
    require(m <= 4096 && k <= 3, "fill^k ppm must stay inside int64")
    def positions(key: Column): Column =
      transform(sequence(lit(1), lit(k)), i =>
        pmod(TextOps.hex60(concat(i.cast("string"), lit(":"),
          key.cast("string"))), lit(m.toLong)))
    val bits = broadcast(insert.select(explode(
        positions(col(keyCol))).as("pos")).distinct())
    // a key's k positions can collide with each other: membership is
    // "every DISTINCT position set", so count distinct probes vs hits
    val probes = query.select(col(keyCol).as("_key"),
        col(memberCol).cast("boolean").as("_member"),
        explode(array_distinct(positions(col(keyCol)))).as("pos"))
    val perKey = probes.join(bits.withColumn("_hit", lit(1L)),
        Seq("pos"), "left")
      .groupBy(col("_key"), col("_member"))
      .agg(count(lit(1)).as("_np"),
        sum(coalesce(col("_hit"), lit(0L))).as("_nh"))
      .withColumn("_pos", (col("_np") === col("_nh")).cast("long"))
    val nBits = bits.agg(count(lit(1)).as("bits_set"))
      .withColumn("_one", lit(1))
    perKey.groupBy()
      .agg(sum(col("_member").cast("long")).as("n_member_queries"),
        sum((!col("_member")).cast("long")).as("n_neg_queries"),
        sum(when(col("_member"), col("_pos")).otherwise(lit(0L)))
          .as("n_member_pos"),
        sum(when(!col("_member"), col("_pos")).otherwise(lit(0L)))
          .as("n_false_pos"))
      .withColumn("_one", lit(1)).join(broadcast(nBits), Seq("_one"))
      .select(lit(m.toLong).as("m_bits"), lit(k.toLong).as("k_hashes"),
        col("bits_set"), col("n_member_queries"), col("n_neg_queries"),
        col("n_member_pos"), col("n_false_pos"),
        // a query set with NO labeled negatives reports 0, not a
        // divide-by-zero (Spark 4 ANSI throws on integral / 0)
        expr("CASE WHEN n_neg_queries = 0 THEN 0" +
          " ELSE n_false_pos * 1000000 div n_neg_queries END")
          .as("fpr_ppm"),
        expr(Seq.fill(k)("bits_set").mkString(" * ") + " * 1000000 div (" +
          Seq.fill(k)(s"${m.toLong}L").mkString(" * ") + ")")
          .as("fpr_occupancy_ppm"))
  }
}
