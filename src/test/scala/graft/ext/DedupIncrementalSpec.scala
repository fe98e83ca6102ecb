package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Conservation pins for the r18 incremental artifact forms (VERDICT
  * r17 #5): the incremental plans must reproduce the REBUILD exactly —
  * `jaccardIncrementalFrom` the batch-touching slice of the full
  * exact-Jaccard pair set (full-corpus df-cap), and
  * `classPairsIncremental` the entire merged class-pair table, row
  * for row, through count bumps, min-rep changes, minted classes, and
  * buckets the merge pushes over the hot-bucket cap. */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("jaccard incremental == rebuild's batch-touching slice on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rebuildTouching = Dedup.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.8)
      .filter(col("doc_a") % 10 === 3 || col("doc_b") % 10 === 3)
    val inc = Dedup.jaccardIncremental(
      docs.filter(col("doc_id") % 10 =!= 3),
      docs.filter(col("doc_id") % 10 === 3),
      "doc_id", "text", threshold = 0.8)
    val (want, got) = (rows(rebuildTouching), rows(inc))
    assert(want.nonEmpty, "fixture must contain batch-touching pairs")
    assert(got == want,
      s"extra=${got -- want} missing=${want -- got}")
    // the merged-df path (staged standing df + sizes, the registry
    // shape) must be value-identical to the recompute path
    val standing = docs.filter(col("doc_id") % 10 =!= 3)
    val sTok = Dedup.docTokens(standing, col("doc_id"), col("text"))
    val merged = Dedup.jaccardIncrementalFrom(
      sTok,
      Dedup.docTokens(docs.filter(col("doc_id") % 10 === 3),
        col("doc_id"), col("text")),
      threshold = 0.8,
      standingDf = Some(sTok.groupBy(col("token"))
        .agg(count(lit(1)).as("df_count"))),
      standingSizes = Some(sTok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"))))
    assert(rows(merged) == want,
      "merged-df incremental diverged from the recompute path")
  }

  test("jaccard conservation: standing ∪ incremental == rebuild (cap-stable fixture)") {
    val mk = (id: Long, txt: String) => (id, txt)
    val standing = Seq(
      mk(1, "red green blue yellow purple orange"),
      mk(2, "red green blue yellow purple orange"),
      mk(4, "one two three four five six seven"),
      mk(5, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      mk(13, "red green blue yellow purple orange"),
      mk(23, "completely different words here entirely"))
      .toDF("doc_id", "text")
    val all = standing.unionByName(batch)
    val rebuild = Dedup.jaccardPairs(all, "doc_id", "text", threshold = 0.8)
    val standingPairs = Dedup.jaccardPairs(standing, "doc_id", "text",
      threshold = 0.8)
    val inc = Dedup.jaccardIncremental(standing, batch, "doc_id", "text",
      threshold = 0.8)
    assert(rows(standingPairs).nonEmpty && rows(inc).nonEmpty)
    assert(rows(standingPairs) ++ rows(inc) == rows(rebuild),
      "standing ∪ incremental must equal the rebuild exactly when the " +
        "df-cap is stable across the append")
    assert((rows(standingPairs) intersect rows(inc)).isEmpty,
      "incremental must emit only batch-touching pairs")
  }

  test("simhash class-merge incremental == rebuild on the corpus (registry shapes)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val standing = docs.filter(col("doc_id") % 10 =!= 3)
    val batch = docs.filter(col("doc_id") % 10 === 3)
    val rebuild = Dedup.simhashPairs(docs, "doc_id", "text")
    val inc = Dedup.simhashPairsIncremental(
      Dedup.simhashClassTable(standing, "doc_id", "text"),
      Dedup.simhashPairs(standing, "doc_id", "text"),
      batch, "doc_id", "text")
    val (want, got) = (rows(rebuild), rows(inc))
    assert(want.nonEmpty)
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("simhash incremental survives count bumps, rep changes, mints, crossed buckets (randomized)") {
    // raw-hash harness: 16-bit hashes over 4x4-bit bands force dense
    // band-bucket collisions, a tight cap (3) makes the append push
    // real buckets over it, and batch ids below standing ids force
    // min-rep changes — every structural case the merge must survive,
    // drawn 5 seeds deep
    val nBands = 4; val bandBits = 4; val maxHamming = 3
    val maxBucket = 3L
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val items = (1L to 80L).map(i => (i, rnd.nextInt(1 << 16).toLong))
      val standing = items.filter(_._1 % 10 != 3).toDF("id", "h")
      val batch = items.filter(_._1 % 10 == 3).toDF("id", "h")
      val all = standing.unionByName(batch)
      val rebuild = BandedPairs.classPairs(all, "id", "h", nBands,
        bandBits, maxHamming, maxBucket, s"inc_spec_rb_$seed")
      val inc = BandedPairs.classPairsIncremental(
        BandedPairs.classTable(standing, "id", "h"),
        BandedPairs.classPairs(standing, "id", "h", nBands, bandBits,
          maxHamming, maxBucket, s"inc_spec_st_$seed"),
        batch, "id", "h", nBands, bandBits, maxHamming, maxBucket,
        s"inc_spec_inc_$seed")
      val (want, got) = (rows(rebuild), rows(inc))
      assert(got == want,
        s"seed=$seed: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("registry: dedup_simhash_incremental equals dedup_simhash exactly") {
    val q = graft.registry.ExtQueries.queries
    val full = rows(q("dedup_simhash")(spark, sf0001))
    val inc = rows(q("dedup_simhash_incremental")(spark, sf0001))
    assert(full.nonEmpty && inc == full)
  }

  test("simhash delta conservation: standing ∖ dels ∪ adds == rebuild (randomized)") {
    // the classPairsIncremental randomized harness, re-asserted for
    // the delta contract: applying the add/del change set to the
    // standing pair table must reproduce the rebuild exactly through
    // count bumps, rep changes, mints, and crossed buckets — and the
    // delta must never carry a no-op row (an add identical to a
    // standing row, or a del that the rebuild still contains)
    val nBands = 4; val bandBits = 4; val maxHamming = 3
    val maxBucket = 3L
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val items = (1L to 80L).map(i => (i, rnd.nextInt(1 << 16).toLong))
      val standing = items.filter(_._1 % 10 != 3).toDF("id", "h")
      val batch = items.filter(_._1 % 10 == 3).toDF("id", "h")
      val all = standing.unionByName(batch)
      val rebuild = rows(BandedPairs.classPairs(all, "id", "h", nBands,
        bandBits, maxHamming, maxBucket, s"delta_spec_rb_$seed"))
      val standingPairs = BandedPairs.classPairs(standing, "id", "h",
        nBands, bandBits, maxHamming, maxBucket, s"delta_spec_st_$seed")
      val delta = BandedPairs.classPairsDelta(
        BandedPairs.classTable(standing, "id", "h"), standingPairs,
        batch, "id", "h", nBands, bandBits, maxHamming, maxBucket,
        s"delta_spec_dl_$seed").cache()
      val adds = rows(delta.filter(col("op") === "add").drop("op"))
      val dels = rows(delta.filter(col("op") === "del").drop("op"))
      val standingSet = rows(standingPairs)
      assert((standingSet -- dels) ++ adds == rebuild,
        s"seed=$seed: applying the delta diverged from the rebuild")
      assert((adds intersect standingSet).isEmpty,
        s"seed=$seed: an add duplicated a standing row (no-op)")
      assert((dels intersect rebuild).isEmpty,
        s"seed=$seed: a del retracted a row the rebuild keeps")
      assert(dels.subsetOf(standingSet),
        s"seed=$seed: a del named a row standing never had")
    }
  }

  test("identity delta conservation + normalized view reconstructs full rows (randomized)") {
    // the normalized-artifact contract: pair IDENTITY kept current by
    // the identity delta, class sizes by the class-table merge; the
    // sized pair view (identity join class sizes) must equal the full
    // rebuild row for row — through the same randomized structural
    // cases as the other harnesses
    val nBands = 4; val bandBits = 4; val maxHamming = 3
    val maxBucket = 3L
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val items = (1L to 80L).map(i => (i, rnd.nextInt(1 << 16).toLong))
      val standing = items.filter(_._1 % 10 != 3).toDF("id", "h")
      val batch = items.filter(_._1 % 10 == 3).toDF("id", "h")
      val all = standing.unionByName(batch)
      val rebuild = BandedPairs.classPairs(all, "id", "h", nBands,
        bandBits, maxHamming, maxBucket, s"iddelta_spec_rb_$seed").cache()
      val standingPairs = BandedPairs.classPairs(standing, "id", "h",
        nBands, bandBits, maxHamming, maxBucket, s"iddelta_spec_st_$seed")
      val delta = BandedPairs.classPairsIdentityDelta(
        BandedPairs.classTable(standing, "id", "h"), standingPairs,
        batch, "id", "h", nBands, bandBits, maxHamming, maxBucket,
        s"iddelta_spec_dl_$seed").cache()
      val idOf = (df: DataFrame) =>
        rows(df.select(col("doc_a"), col("doc_b"), col("hamming")))
      val adds = rows(delta.filter(col("op") === "add").drop("op"))
      val dels = rows(delta.filter(col("op") === "del").drop("op"))
      assert((idOf(standingPairs) -- dels) ++ adds == idOf(rebuild),
        s"seed=$seed: identity delta diverged from the rebuild's identities")
      // normalized view: merged identities joined to merged class
      // sizes (rep -> n) reconstructs the full sized rows
      val mergedCls = BandedPairs.classTable(all, "id", "h")
        .select(col("rep"), col("n"))
      val mergedIds = standingPairs
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .except(delta.filter(col("op") === "del")
          .select(col("doc_a"), col("doc_b"), col("hamming")))
        .unionByName(delta.filter(col("op") === "add")
          .select(col("doc_a"), col("doc_b"), col("hamming")))
      val view = mergedIds
        .join(mergedCls.select(col("rep").as("doc_a"), col("n").as("n_a")),
          Seq("doc_a"))
        .join(mergedCls.select(col("rep").as("doc_b"), col("n").as("n_b")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          col("n_a"), col("n_b"),
          when(col("doc_a") === col("doc_b"),
            expr("n_a * (n_a - 1) div 2"))
            .otherwise(col("n_a") * col("n_b")).as("n_pairs"))
      assert(rows(view) == rows(rebuild),
        s"seed=$seed: normalized view diverged from the full rebuild")
    }
  }

  test("registry: dedup_simhash_delta applies onto standing to give dedup_simhash") {
    val q = graft.registry.ExtQueries.queries
    val full = rows(q("dedup_simhash")(spark, sf0001))
    val standing = rows(graft.ext.PairStage.simhashClassPairs(
      spark, sf0001, maxHamming = 3, excludeMod = 3))
    val delta = q("dedup_simhash_delta")(spark, sf0001).cache()
    val adds = rows(delta.filter(col("op") === "add").drop("op"))
    val dels = rows(delta.filter(col("op") === "del").drop("op"))
    assert(adds.nonEmpty, "fixture batch must add pairs")
    assert((standing -- dels) ++ adds == full,
      "delta applied to the staged standing pairs must equal the rebuild")
  }
}
