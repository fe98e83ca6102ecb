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

  /** The distinct-hash CLASS TABLE (h, rep, n) [[classPairs]] builds
    * internally — exposed so a deployed pipeline can persist it and
    * merge appends into it ([[classPairsIncremental]]). */
  def classTable(hashes: DataFrame, idCol: String,
                 hashCol: String): DataFrame =
    hashes.groupBy(col(hashCol).as("h"))
      .agg(min(col(idCol)).as("rep"), count(lit(1)).as("n"))

  /** Incremental [[classPairs]] via CLASS-TABLE MERGE (VERDICT r17
    * #5b): new items either join an existing hash class (count bump —
    * and possibly a new min-id representative) or mint one, and the
    * banded pair delta is computed from the TOUCHED classes only —
    * never a re-band of every doc, and never a re-hash of the
    * standing corpus (the expensive per-doc hashing is batch-only;
    * the class-space merge and banding are O(distinct hashes)).
    *
    * Output == `classPairs(standing UNION batch)` EXACTLY, row for
    * row (spec-pinned), assembled as:
    *
    *  - standing pairs whose BOTH endpoint classes are untouched pass
    *    through verbatim (their h, rep, n are provably unchanged, and
    *    their surviving band buckets are provably the same — see the
    *    crossed-bucket rule);
    *  - pairs touching a touched class are recomputed by banding the
    *    touched classes against ALL capped classes;
    *  - intra-class rows for touched classes are re-emitted with the
    *    merged counts.
    *
    * Touched = classes the batch hit (count/rep changed) ∪ classes in
    * a bucket the merge pushed OVER the hot-bucket cap: a new class
    * landing in a near-full bucket evicts the whole bucket from the
    * rebuild's join, so pairs its classes carried in standing output
    * may vanish — those classes must be re-adjudicated through the
    * capped join (bucket occupancy counts CLASSES, so only new-class
    * buckets can cross). The cap guard observe rides the merged band
    * staging, same contract as [[classPairs]].
    *
    * @param standingCls   persisted class table of the standing corpus
    *                      ([[classTable]] output)
    * @param standingPairs persisted [[classPairs]] output of the
    *                      standing corpus (same banding parameters)
    * @param batchHashes   the new batch, one row per item
    */
  def classPairsIncremental(standingCls: DataFrame,
                            standingPairs: DataFrame,
                            batchHashes: DataFrame,
                            idCol: String, hashCol: String,
                            nBands: Int, bandBits: Int, maxHamming: Int,
                            maxBucket: Long, guardName: String): DataFrame = {
    val (merged, kept, touched) = incrementalCore(standingCls, batchHashes,
      idCol, hashCol, nBands, bandBits, maxHamming, maxBucket, guardName)
    val untouchedStanding = standingPairs
      .join(touched.filter(col("old_rep").isNotNull)
        .select(col("old_rep").as("doc_a")).distinct(),
        Seq("doc_a"), "left_anti")
      .join(touched.filter(col("old_rep").isNotNull)
        .select(col("old_rep").as("doc_b")).distinct(),
        Seq("doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("n_a"),
        col("n_b"), col("n_pairs"))
    untouchedStanding.unionByName(
      recomputedPairs(merged, kept, touched, maxHamming))
  }

  /** DELTA-contract incremental [[classPairs]] (r19): the same
    * class-table merge as [[classPairsIncremental]], but the output is
    * the CHANGE SET against the persisted standing pair table instead
    * of the full merged table — `op = 'add'` rows to insert and
    * `op = 'del'` rows to retract, so
    * `standingPairs ∖ dels ∪ adds == classPairs(standing UNION batch)`
    * exactly (spec-pinned).
    *
    * Why this form exists: the full-table contract re-WRITES a
    * corpus-class-sized artifact every increment, which is the term
    * that plateaus its wall ratio at ~1.06× regardless of scale
    * (SCALE.md r19 — the simhash plateau finding). The delta touches
    * the standing pair table only through batch-proportional
    * semi-joins (rows whose endpoints are touched classes), and its
    * output is batch-proportional too — the consumer applies it to the
    * persisted table with a keyed merge (the [[graft.ops.Merge]]
    * shape) instead of rewriting 100 TB of pairs to change 0.1% of
    * them. A standing pair NOT touching a touched class is provably
    * identical in the rebuild, so the symmetric difference of the full
    * tables equals the symmetric difference of the touched slices —
    * which is all this computes. */
  def classPairsDelta(standingCls: DataFrame,
                      standingPairs: DataFrame,
                      batchHashes: DataFrame,
                      idCol: String, hashCol: String,
                      nBands: Int, bandBits: Int, maxHamming: Int,
                      maxBucket: Long, guardName: String): DataFrame =
    changeSet(standingCls, standingPairs, batchHashes, idCol, hashCol,
      nBands, bandBits, maxHamming, maxBucket, guardName,
      Seq(col("doc_a"), col("doc_b"), col("hamming"),
        col("n_a"), col("n_b"), col("n_pairs")))

  /** IDENTITY-delta incremental [[classPairs]] (r19): the change set
    * on pair IDENTITY `(doc_a, doc_b, hamming)` alone, sizes excluded.
    *
    * Why a second delta form: the full-row [[classPairsDelta]] carries
    * the class-size columns, and a count bump on a large duplicate
    * class rewrites EVERY pair row of that class even though no pair
    * appeared or vanished — measured at sf10 (SCALE.md r19), 61% of
    * the full-row delta is such size-only churn, and on a corpus whose
    * pair mass concentrates in big duplicate classes (exactly the
    * corpus worth deduping) a 10% batch touches most heavy classes.
    * The production artifact should be NORMALIZED: a pair-identity
    * table (this delta keeps it current) plus the class table
    * (h, rep, n — [[classTable]], already merged incrementally), with
    * the sized pair view reconstructed by joining the two at read. The
    * identity delta contains only pairs that genuinely appeared or
    * vanished (mints, bucket crossings, evictions, rep changes) — the
    * term that is actually batch-proportional.
    *
    * `identity(standing) ∖ dels ∪ adds == identity(rebuild)` exactly,
    * and joining the result with the merged class sizes reconstructs
    * [[classPairs]]' full rows — both spec-pinned. */
  def classPairsIdentityDelta(standingCls: DataFrame,
                              standingPairs: DataFrame,
                              batchHashes: DataFrame,
                              idCol: String, hashCol: String,
                              nBands: Int, bandBits: Int, maxHamming: Int,
                              maxBucket: Long, guardName: String): DataFrame =
    changeSet(standingCls, standingPairs, batchHashes, idCol, hashCol,
      nBands, bandBits, maxHamming, maxBucket, guardName,
      Seq(col("doc_a"), col("doc_b"), col("hamming")))

  /** The shared delta assembly behind [[classPairsDelta]] (full rows)
    * and [[classPairsIdentityDelta]] (pair identity): run the merge
    * core, slice the standing pairs touching a touched class (two
    * broadcastable semi-joins on the batch-proportional touched set —
    * the big pair table is scanned, never shuffled), recompute the
    * touched slice, and emit the symmetric difference tagged
    * add/del. `outCols` is the contract projection; both sides are
    * projected BEFORE the excepts so the difference is taken in the
    * contract's own column space. */
  private def changeSet(standingCls: DataFrame, standingPairs: DataFrame,
                        batchHashes: DataFrame,
                        idCol: String, hashCol: String,
                        nBands: Int, bandBits: Int, maxHamming: Int,
                        maxBucket: Long, guardName: String,
                        outCols: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val (merged, kept, touched) = incrementalCore(standingCls, batchHashes,
      idCol, hashCol, nBands, bandBits, maxHamming, maxBucket, guardName)
    val touchedOld = touched.filter(col("old_rep").isNotNull)
    val touchedStanding = Materialize.eager(standingPairs
      .join(touchedOld.select(col("old_rep").as("doc_a")).distinct(),
        Seq("doc_a"), "left_semi")
      .unionByName(standingPairs
        .join(touchedOld.select(col("old_rep").as("doc_b")).distinct(),
          Seq("doc_b"), "left_semi"))
      .select(outCols: _*).distinct())
    val recomputed = Materialize.eager(
      recomputedPairs(merged, kept, touched, maxHamming)
        .select(outCols: _*).distinct())
    recomputed.except(touchedStanding)
      .select(lit("add").as("op") +: outCols: _*)
      .unionByName(touchedStanding.except(recomputed)
        .select(lit("del").as("op") +: outCols: _*))
  }

  /** The merge/band/cap/touched core shared by
    * [[classPairsIncremental]] and [[classPairsDelta]] — see the
    * former's doc for the exact-conservation argument. Returns
    * (merged class table, capped band rows, touched classes carrying
    * merged `rep` and standing `old_rep`). */
  private def incrementalCore(standingCls: DataFrame,
                              batchHashes: DataFrame,
                              idCol: String, hashCol: String,
                              nBands: Int, bandBits: Int, maxHamming: Int,
                              maxBucket: Long, guardName: String)
      : (DataFrame, DataFrame, DataFrame) = {
    require(maxHamming >= 0 && maxHamming <= nBands - 1,
      s"banding is lossless only up to Hamming ${nBands - 1} " +
        s"($nBands bands); got $maxHamming")
    GuardLog.ensure(batchHashes.sparkSession)
    val batchCls = classTable(batchHashes, idCol, hashCol)
      .withColumnRenamed("rep", "rep_b").withColumnRenamed("n", "n_b")
    // class merge: count bump / min-rep / mint, all in one outer join
    val merged = Materialize.eager(standingCls
      .withColumnRenamed("rep", "rep_s").withColumnRenamed("n", "n_s")
      .join(batchCls, Seq("h"), "full_outer")
      .select(col("h"),
        least(col("rep_s"), col("rep_b")).as("rep"), // least skips NULL
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
          .as("n"),
        col("rep_s").as("old_rep"),
        col("rep_b").isNotNull.as("batch_hit"),
        col("rep_s").isNull.as("is_new_class")))
    val mask = (1L << bandBits) - 1
    val bands = merged.select(col("rep"), col("h"), col("n"),
      col("old_rep"), col("batch_hit"), col("is_new_class"),
      explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), b * bandBits).bitwiseAND(lit(mask))
          .as("key"))): _*)).as("bk"))
      .select(col("rep"), col("h"), col("n"), col("old_rep"),
        col("batch_hit"), col("is_new_class"),
        col("bk.band"), col("bk.key"))
    val occ = Window.partitionBy(col("band"), col("key"))
    // standing occupancy = merged occupancy minus the batch-minted
    // classes (count bumps do not move a class between buckets)
    val sized = Materialize.eager(bands
      .withColumn("_occ_all", count(lit(1)).over(occ))
      .withColumn("_occ_new",
        sum(when(col("is_new_class"), 1L).otherwise(0L)).over(occ))
      .observe(GuardLog.Prefix + guardName,
        sum(when(col("_occ_all") > maxBucket, 1L).otherwise(0L))
          .as("n_class_rows_dropped"))
      .withColumn("_crossed",
        col("_occ_all") > maxBucket &&
          (col("_occ_all") - col("_occ_new")) <= maxBucket))
    val kept = sized.filter(col("_occ_all") <= maxBucket)
    // touched in MERGED rep space (for the delta join) and in OLD rep
    // space (for evicting superseded standing rows)
    val touched = Materialize.eager(merged
      .select(col("rep"), col("old_rep"), col("batch_hit"))
      .join(sized.filter(col("_crossed")).select(col("rep").as("_cr"))
          .distinct(),
        col("rep") === col("_cr"), "left")
      .filter(col("batch_hit") || col("_cr").isNotNull)
      .select(col("rep"), col("old_rep")))
    (merged, kept, touched)
  }

  /** Pairs touching a touched class, recomputed through the capped
    * banded join — the additive half of both incremental contracts. */
  private def recomputedPairs(merged: DataFrame, kept: DataFrame,
                              touched: DataFrame,
                              maxHamming: Int): DataFrame = {
    val keptTouched = kept.join(touched.select(col("rep")).distinct(),
      Seq("rep"), "left_semi")
    val deltaCross = keptTouched.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.h") =!= col("y.h"))
      .select(
        when(col("x.rep") < col("y.rep"), col("x.rep"))
          .otherwise(col("y.rep")).as("doc_a"),
        when(col("x.rep") < col("y.rep"), col("y.rep"))
          .otherwise(col("x.rep")).as("doc_b"),
        bit_count(col("x.h").bitwiseXOR(col("y.h")))
          .cast("long").as("hamming"),
        when(col("x.rep") < col("y.rep"), col("x.n"))
          .otherwise(col("y.n")).as("n_a"),
        when(col("x.rep") < col("y.rep"), col("y.n"))
          .otherwise(col("x.n")).as("n_b"),
        (col("x.n") * col("y.n")).as("n_pairs"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val deltaIntra = merged
      .join(touched.select(col("rep")).distinct(), Seq("rep"), "left_semi")
      .filter(col("n") >= 2)
      .select(col("rep").as("doc_a"), col("rep").as("doc_b"),
        lit(0L).as("hamming"), col("n").as("n_a"), col("n").as("n_b"),
        expr("n * (n - 1) div 2").as("n_pairs"))
    deltaCross.unionByName(deltaIntra)
  }
}
