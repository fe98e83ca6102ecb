package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hamming-banded near-dup pairs over DISTINCT-hash classes — the
  * shared engine behind [[Dedup.simhashPairs]] (64-bit text SimHash)
  * and [[Multimodal.phashHammingPairs]] (56-bit image dHash).
  *
  * Why classes, not rows (r16, the library's last scale-killer): a
  * banded SELF-join over per-row hashes lands every member of an
  * exact-duplicate class of size k in the same band buckets, emitting
  * k²/2 output pairs — at sf1 the per-row form of mm_phash_pairs
  * emitted 97.9 M pairs, and at 100 TB one viral image (10⁶ copies)
  * is 5·10¹¹ pairs out of a single bucket. Identical hashes carry no
  * pairwise information beyond their count, so the fix is structural:
  *
  *  1. collapse identical hashes to CLASSES first (hash-agg with
  *     map-side combine: rep = min id, n = class size) — the same
  *     scale story as exact text dedup;
  *  2. band the DISTINCT hashes only and self-join band buckets —
  *     a class of size k now contributes ONE row per band;
  *  3. verify with a codegen'd xor/bit_count BEFORE the pair
  *     distinct (the r12 lesson: the distinct shuffle carries only
  *     true near-dups, never the banded candidate multiset);
  *  4. emit REPRESENTATIVE pairs with class sizes: cross-class rows
  *     (rep_a < rep_b, hamming ≥ 1 — distinct hashes differ in at
  *     least one bit) carry n_pairs = n_a·n_b, and each class of
  *     size ≥ 2 emits ONE intra-class row (rep, rep, hamming 0,
  *     n_pairs = n·(n-1)/2). Σ n_pairs equals the doc-level pair
  *     count of the per-row form exactly (spec-pinned), so nothing
  *     is lost — it is re-expressed in O(classes) rows.
  *
  * Banding stays LOSSLESS by pigeonhole for maxHamming ≤ nBands - 1:
  * two hashes within that distance cannot differ in every band, so
  * they share at least one bucket and recall vs brute force is
  * exactly 1 — which is what lets a SQL oracle replay the output.
  *
  * Hot-bucket cap (the [[Dedup.hotKeys]] df-cap discipline, absent
  * exactly here until r16): even distinct hashes can crowd one band
  * bucket — a mega near-dup cluster puts thousands of DISTINCT
  * hashes behind one shared chunk, and bucket cost is quadratic in
  * occupancy. Buckets holding more than `maxBucket` classes are
  * dropped from the join, counted by an `observe` metric on the rows
  * already flowing into the staged band table, and logged at
  * execution through [[GuardLog]] — loud, never silent. The cap
  * costs recall only on pathological clusters (every surviving pair
  * is still exact-verified), and it is sized far above anything the
  * well-behaved corpus produces, so the oracle contract is untouched
  * until the data is degenerate — which is exactly when it must
  * fire.
  */
object BandedPairs {

  /** @param hashes    frame carrying one row per item
    * @param idCol     item id column name (long)
    * @param hashCol   hash column name (long; effective width
    *                  nBands * bandBits bits)
    * @param nBands    band count (lossless for maxHamming <= nBands-1)
    * @param bandBits  bits per band
    * @param maxHamming verify threshold on full-hash bit distance
    * @param maxBucket  max DISTINCT-hash classes per band bucket
    * @param guardName  GuardLog suffix for the hot-bucket drop count
    * @return (doc_a, doc_b, hamming, n_a, n_b, n_pairs) — class
    *         representative pairs; doc_a == doc_b marks the
    *         intra-class row of an exact-duplicate class
    */
  def classPairs(hashes: DataFrame, idCol: String, hashCol: String,
                 nBands: Int, bandBits: Int, maxHamming: Int,
                 maxBucket: Long, guardName: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"banding is lossless only up to Hamming ${nBands - 1} " +
        s"($nBands bands); got $maxHamming")
    GuardLog.ensure(hashes.sparkSession)
    // one hash-agg collapses exact-duplicate classes; staged once —
    // it feeds the band table AND the intra-class rows
    val cls = Materialize.eager(
      hashes.groupBy(col(hashCol).as("h"))
        .agg(min(col(idCol)).as("rep"), count(lit(1)).as("n")))
    val mask = (1L << bandBits) - 1
    val bands = cls.select(col("rep"), col("h"), col("n"),
      explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), b * bandBits).bitwiseAND(lit(mask))
          .as("key"))): _*)).as("bk"))
      .select(col("rep"), col("h"), col("n"),
        col("bk.band"), col("bk.key"))
    // bucket occupancy via a (band, key)-partitioned window — the
    // same shuffle the self-join needs, no extra pass; the observe
    // metric rides the staging job and GuardLog reports it there
    val occ = Window.partitionBy(col("band"), col("key"))
    val kept = Materialize.eager(bands
      .withColumn("_bucket_n", count(lit(1)).over(occ))
      .observe(GuardLog.Prefix + guardName,
        sum(when(col("_bucket_n") > maxBucket, 1L).otherwise(0L))
          .as("n_class_rows_dropped"))
      .filter(col("_bucket_n") <= maxBucket)
      .drop("_bucket_n"))
    val cross = kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.rep") < col("y.rep"))
      .select(col("x.rep").as("doc_a"), col("y.rep").as("doc_b"),
        bit_count(col("x.h").bitwiseXOR(col("y.h")))
          .cast("long").as("hamming"),
        col("x.n").as("n_a"), col("y.n").as("n_b"),
        (col("x.n") * col("y.n")).as("n_pairs"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val intra = cls.filter(col("n") >= 2)
      .select(col("rep").as("doc_a"), col("rep").as("doc_b"),
        lit(0L).as("hamming"), col("n").as("n_a"), col("n").as("n_b"),
        expr("n * (n - 1) div 2").as("n_pairs"))
    cross.unionByName(intra)
  }
}
