package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental / filtered ANN family: index maintenance without
  * refits (stale-centroid upserts, the corpus x batch contract of
  * dedup_incremental transplanted to ANN) and predicate-pushed
  * filtered search with selectivity-compensated probing. The oracle
  * rows pin determinism; this spec pins the QUALITY claims — how much
  * recall staleness costs, that one extra probe buys it back until
  * the refit trigger fires, and that filtered recall survives a 100x
  * selectivity tightening because probeN grows with 1/selectivity. */
class AnnIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < 10)
  private val K = 5

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet

  private lazy val truth = topkSet(Similarity.bruteForceTopK(
    queries, emb, "vec_id", "vec_id", "embedding", K))

  private lazy val corpus = emb.filter(col("vec_id") % 10 =!= 7)
  private lazy val batch = emb.filter(col("vec_id") % 10 === 7)
  private lazy val nc = Similarity.autoCentroids(emb.count())
  // the stale index: fit on the standing corpus only, as
  // PairStage.ivfCentroidsCorpus stages it (inline here — the spec
  // pins the operator, not the staging)
  private lazy val staleCents = Similarity.ivfCentroids(
    corpus, "vec_id", "embedding",
    Similarity.autoCentroids(corpus.count()), iters = 2)
  private lazy val freshCents = Similarity.ivfCentroids(
    emb, "vec_id", "embedding", nc, iters = 2)

  private def recallOf(df: DataFrame): Double =
    topkSet(df).intersect(truth).size.toDouble / truth.size

  test("stale-index recall cost is bounded; refit restores the floor; probe-compensation is priced") {
    val fresh2 = recallOf(Similarity.ivfTopKWith(freshCents, emb, queries,
      "vec_id", "embedding", k = K, nProbe = 2))
    val stale2 = recallOf(Similarity.ivfTopKWith(staleCents, emb, queries,
      "vec_id", "embedding", k = K, nProbe = 2))
    val sweep = Seq(3, 4, 6).map(p => p -> recallOf(
      Similarity.ivfTopKWith(staleCents, emb, queries,
        "vec_id", "embedding", k = K, nProbe = p))).toMap
    info(f"recall@5: fresh nProbe=2 $fresh2%.2f, stale nProbe=2 " +
      f"$stale2%.2f, stale probe sweep $sweep")
    // staleness costs recall (that is WHY the refit trigger exists) but
    // must not collapse at a 10% un-refit fraction...
    assert(stale2 >= fresh2 - 0.15,
      f"staleness cost exceeded 15 points: stale $stale2%.2f vs fresh $fresh2%.2f")
    // ...recovery is monotone in nProbe...
    assert(stale2 <= sweep(3) + 1e-9 && sweep(3) <= sweep(4) + 1e-9 &&
      sweep(4) <= sweep(6) + 1e-9, s"recovery not monotone: $sweep")
    // ...and the PRICE of compensating instead of refitting is ~3x the
    // probe cost (measured 6 probes to clear the fresh-2 floor on both
    // the sf0.001 and sf0.01 fixtures) — every search pays it forever,
    // which is why the report's refit_due trigger, not probe inflation,
    // is the maintenance policy. The refit itself (fresh fit on the
    // upserted corpus) restores the floor by construction: the
    // registered ann_incremental_recall's post-refit row IS the staged
    // report's configuration.
    assert(sweep(6) >= fresh2 - 1e-9,
      f"3x probes should clear the fresh floor: ${sweep(6)}%.2f vs $fresh2%.2f")
  }

  test("upsert report: cells partition both sides, staleness ppm and trigger are exact") {
    val rep = Similarity.ivfUpsertReport(staleCents, corpus, batch,
      "vec_id", "embedding").cache()
    val (sumCorpus, sumAdded) = rep.agg(sum("n_corpus"), sum("n_added"))
      .as[(Long, Long)].head()
    assert(sumCorpus === corpus.count(),
      "per-cell corpus counts must partition the standing corpus")
    assert(sumAdded === batch.count(),
      "per-cell added counts must partition the batch")
    val staleVals = rep.select("stale_ppm").distinct().as[Long].collect()
    assert(staleVals.length === 1, "staleness is a global counter")
    assert(staleVals.head ===
      sumAdded * 1000000L / (sumCorpus + sumAdded))
    // batch is 10% of the corpus, the default trigger is 5% -> due
    assert(rep.select("refit_due").distinct().as[Long].collect()
      .toSeq === Seq(1L))
    // upsert totals must equal a from-scratch assignment's cell sizes
    // when the same (stale) centroids are used: incremental == batch
    // parity, the dedup_incremental contract
    val full = Similarity.ivfAssignWith(staleCents, emb, "vec_id",
        "embedding")
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
    val mismatch = rep.select(col("centroid_id"), col("n_total"))
      .join(full, Seq("centroid_id"), "full")
      .filter(coalesce(col("n_total"), lit(-1L)) =!=
        coalesce(col("n"), lit(-1L)))
    assert(mismatch.count() === 0,
      "upserted cell sizes diverge from a one-shot assignment")
    rep.unpersist()
  }

  test("filtered recall survives selectivity tightening (10% and 1%)") {
    // vec_id-derived predicates give exact selectivities; truth is the
    // brute-force top-k over the FILTERED corpus (what a filtered
    // search is answerable against)
    def filteredRecall(pred: org.apache.spark.sql.Column,
                       compensate: Boolean): Double = {
      val truthF = topkSet(Similarity.bruteForceTopK(queries,
        emb.filter(pred), "vec_id", "vec_id", "embedding", K))
      val got =
        if (compensate)
          topkSet(Similarity.ivfFilteredTopKWith(freshCents,
            Similarity.ivfCellStats(freshCents, emb, "vec_id", "embedding"),
            emb, queries, "vec_id", "embedding", pred, k = K, nProbe = 2,
            nCentroids = nc))
        else // uncompensated control: same filter, fixed nProbe=2
          topkSet(Similarity.ivfTopKWith(freshCents, emb.filter(pred),
            queries, "vec_id", "embedding", k = K, nProbe = 2))
      got.intersect(truthF).size.toDouble / truthF.size
    }
    val p10 = col("vec_id") % 10 === 1
    val p1 = col("vec_id") % 100 === 1
    val r10c = filteredRecall(p10, compensate = true)
    val r10u = filteredRecall(p10, compensate = false)
    val r1c = filteredRecall(p1, compensate = true)
    val r1u = filteredRecall(p1, compensate = false)
    info(f"filtered recall@5: 10%% sel compensated $r10c%.2f vs fixed " +
      f"$r10u%.2f; 1%% sel compensated $r1c%.2f vs fixed $r1u%.2f")
    assert(r10c >= r10u - 1e-9 && r1c >= r1u - 1e-9,
      "compensation must never lose to the fixed probe count")
    // the claim that matters at 100 TB: compensated probing holds a
    // floor as the filter tightens 10x (probeN grows with n/kept and
    // is clamped at nCentroids — at 1% selectivity on the fixture it
    // IS the full scan, which is the correct degenerate answer)
    assert(r10c >= 0.80, f"10%% selectivity recall collapsed: $r10c%.2f")
    assert(r1c >= 0.99, f"1%% selectivity recall collapsed: $r1c%.2f " +
      "(probeN should clamp to a full scan here)")
  }

  test("filtered search sizes probeN from the staged cell stats, not a corpus re-scan") {
    // The r12 contract (VERDICT r11 #3): n comes from the index's
    // cell-membership stats, never a full-corpus count job. Pinned
    // behaviorally — POISONED stats must change the probe count. If
    // the operator secretly re-counted the corpus, inflating n_cell
    // 1000x would be invisible; instead it must clamp probeN to
    // nCentroids and reproduce the full-probe search exactly.
    val honest = Similarity.ivfCellStats(freshCents, emb, "vec_id",
      "embedding")
    // stats partition the corpus: sum(n_cell) == |corpus| exactly
    assert(honest.agg(sum("n_cell")).as[Long].head() === emb.count())
    val pred = col("vec_id") % 2 === 1
    val poisoned = honest.withColumn("n_cell", col("n_cell") * 1000L)
    val got = topkSet(Similarity.ivfFilteredTopKWith(freshCents, poisoned,
      emb, queries, "vec_id", "embedding", pred, k = K, nProbe = 2,
      nCentroids = nc))
    val fullProbe = topkSet(Similarity.ivfTopKWith(freshCents,
      emb.filter(pred), queries, "vec_id", "embedding", k = K,
      nProbe = nc))
    assert(got === fullProbe,
      "1000x-inflated stats must clamp probeN to nCentroids — if they " +
        "don't, the operator is re-counting the corpus instead of " +
        "reading the staged stats")
  }

  test("staged filtered sliver reproduces the ad-hoc filtered search exactly") {
    // the r13 registry path: the predicate sliver's assignment is a
    // session-staged artifact (PairStage.ivfFilteredCells — parquet
    // round-trip of int64 ids + IEEE unit vectors), so staged and
    // ad-hoc searches must agree row-for-row, probe compensation
    // included
    val stats = Similarity.ivfCellStats(freshCents, emb, "vec_id",
      "embedding")
    val pred = col("label") % 4 === 1
    val adhoc = topkSet(Similarity.ivfFilteredTopKWith(freshCents, stats,
      emb, queries, "vec_id", "embedding", pred, k = K, nProbe = 2,
      nCentroids = nc))
    val sliver = PairStage.ivfFilteredCells(spark, sf0001, nc, iters = 2,
      predTag = "label%4=1", pred = pred)
    val staged = topkSet(Similarity.ivfFilteredTopKStaged(freshCents,
      stats, sliver, queries, "vec_id", "embedding", k = K, nProbe = 2,
      nCentroids = nc))
    assert(staged === adhoc,
      "staged-sliver filtered search diverged from the ad-hoc path")
  }

  // ---- IVF-PQ composition ----

  private def ivfPqCells(cents: DataFrame): (DataFrame, DataFrame) = {
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 4, ksub = 16, iters = 2)
    val codes = Similarity.pqEncodeWith(books, emb, "vec_id",
      "embedding", dim = 64, m = 4)
    val assigned = Similarity.ivfAssignWith(cents, emb, "vec_id",
        "embedding")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("centroid_id"))
    (books, codes.join(assigned, Seq("vec_id"))
      .select(col("vec_id"), col("centroid_id"), col("j"),
        col("code_id")))
  }

  test("IVF-PQ with a saturated shortlist IS flat IVF — the composition is exact") {
    // With shortlist >= every probed candidate set, the PQ stage
    // passes everything through and the exact rerank ranks the same
    // probed rows the flat-IVF search ranks: the two operators must
    // agree row-for-row. This pins the composition's plumbing (cell
    // restriction, LUT join keys, self-match exclusion, NaN handling)
    // against an independently-oracled operator, leaving the default
    // config to differ ONLY by intended shortlist truncation.
    val (books, cells) = ivfPqCells(freshCents)
    val sat = topkSet(Similarity.ivfPqTopKWith(freshCents, books, cells,
      emb, queries, "vec_id", "embedding", dim = 64, m = 4, k = K,
      nProbe = 2, shortlist = emb.count().toInt))
    val ivf = topkSet(Similarity.ivfTopKWith(freshCents, emb, queries,
      "vec_id", "embedding", k = K, nProbe = 2))
    assert(sat === ivf)
  }

  test("IVF-PQ at the default shortlist: recall floor vs exact truth, no self-matches") {
    val (books, cells) = ivfPqCells(freshCents)
    val got = Similarity.ivfPqTopKWith(freshCents, books, cells, emb,
      queries, "vec_id", "embedding", dim = 64, m = 4, k = K,
      nProbe = 2, shortlist = 50)
    assert(got.filter(col("query_id") === col("neighbor_id")).count() === 0L)
    val pairs = topkSet(got)
    val ivf = topkSet(Similarity.ivfTopKWith(freshCents, emb, queries,
      "vec_id", "embedding", k = K, nProbe = 2))
    // the composed search can only lose candidates the ADC shortlist
    // truncates; cell restriction is identical, so its hits against
    // brute-force truth are bounded above by flat IVF's
    val rPq = pairs.intersect(truth).size / truth.size.toDouble
    val rIvf = ivf.intersect(truth).size / truth.size.toDouble
    assert(rPq <= rIvf + 1e-9,
      s"ivfpq recall $rPq cannot exceed flat-ivf recall $rIvf")
    assert(rPq >= 0.2,
      s"ivfpq recall $rPq collapsed below the fixture floor (ivf $rIvf)")
  }

  test("ivfProbeTuneReport: recall and scan mass are monotone; saturated probing is exact") {
    val n = emb.count()
    val nC = Similarity.autoCentroids(n)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", nC,
      iters = 2)
    val stats = Similarity.ivfCellStats(cents, emb, "vec_id", "embedding")
    val cells = Similarity.ivfAssignWith(cents, emb, "vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 10)
    val rep = Similarity.ivfProbeTuneReport(cents, stats, cells, emb, q,
        "vec_id", "embedding", k = 5, nProbes = Seq(1, 2, nC),
        corpusN = n, nQueries = q.count())
      .orderBy("scanned_rows")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rep.map(_._1) === Seq("ivf_np1", "ivf_np2", s"ivf_np$nC"))
    // more probes can only add candidates: recall and scan mass are
    // both non-decreasing in nProbe
    assert(rep.map(_._4) === rep.map(_._4).sorted, s"recall not monotone: $rep")
    assert(rep.map(_._5) === rep.map(_._5).sorted,
      s"scan mass not monotone: $rep")
    // probing every cell IS brute force: exact recall, full corpus
    // scanned per query
    val sat = rep.last
    assert(sat._4 === 1000000L, s"saturated probe must be exact: $sat")
    assert(sat._5 === q.count() * n, s"saturated probe scans everything: $sat")
  }

  test("ivfBuildReport aggregates cell stats exactly and holds its invariants") {
    // constructed stats: cells 5/3/2 of a 4-centroid index ->
    // floor-mean = 10 div 4 = 2, imbalance = 5e6 div 2 = 2.5e6,
    // top2 = (5+3)e6 div 10 = 8e5, one trained cell empty
    val stats = Seq((0L, 5L), (1L, 3L), (2L, 2L))
      .toDF("centroid_id", "n_cell")
    val row = Similarity.ivfBuildReport(stats, nCentroids = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(row === ((4L, 3L, 1L, 10L, 5L, 2L, 2500000L, 800000L)))
    // real corpus: vectors partition into cells, nonempty <= trained,
    // and max >= floor-mean makes imbalance >= 1e6 by construction
    val n = emb.count()
    val nC = Similarity.autoCentroids(n)
    val rep = Similarity.ivfBuildReport(
        Similarity.ivfCellStats(
          Similarity.ivfCentroids(emb, "vec_id", "embedding", nC,
            iters = 2),
          emb, "vec_id", "embedding"), nC)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(rep._1 === nC.toLong && rep._2 <= rep._1)
    assert(rep._4 === n, "cell populations must partition the corpus")
    assert(rep._7 >= 1000000L, "max cell cannot sit below the mean")
    assert(rep._8 <= 1000000L && rep._8 > 0L)
  }
}
