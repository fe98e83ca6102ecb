package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{AsOfJoin, Audio, Corpus, Dedup, Graph, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, TextOps, Video, Windows}


import QueryShared._

/** Embedding transforms, similarity search / ANN with recall reports, multimodal plumbing.
  *
  * One family slice of the extension registry — [[ExtQueries]]
  * aggregates every slice behind the unchanged `queries` /
  * `oracleSql` surface (the r10 split of the 4.4k-line
  * monolith; entries are verbatim, no behavior change).
  */
object ExtQueriesSimilarity {

  val queries: Map[String, Q] = Map(

    // L2 norm + unit vector, exploded to scalar (vec_id, dim, value)
    // rows — the compare contract has no array-column total order.
    // IEEE sqrt/divide are correctly rounded, so the raw doubles are
    // engine-portable. Zero vectors (norm 0) are excluded: they have
    // no unit direction (and SQL engines disagree on 0/0).
    "emb_normalize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.withNormalized(emb, "embedding", "unit")
        .withColumn("l2_norm", Similarity.norm(col("embedding")))
        .filter(col("l2_norm") > 0)
        .select(col("vec_id"), col("l2_norm"), posexplode(col("unit")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          col("l2_norm"), col("col").as("unit_val"))
    }),
    // per-dimension embedding health: quantize-once integer stats +
    // exact integer variance per dim — dead-dimension / clipped-export
    // detection before the vectors feed an index
    "emb_dimension_health" -> ((s, dir) =>
      Similarity.dimensionHealthReport(t(s, dir, "embeddings"),
        "embedding")),
    // Fisher-style label separation: between-centroid scatter vs
    // within-class variance per label, exact integer micro^2 units
    "emb_label_separation" -> ((s, dir) =>
      Similarity.labelSeparationReport(t(s, dir, "embeddings"),
        "label", "embedding")),
    // JL random projection 64 -> 16 dims with md5-derived plane
    // weights, exploded to scalar rows like emb_normalize
    "emb_random_projection" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
        posexplode(Similarity.randomProjection(col("embedding"),
          dim = 64, outDim = 16)))
        .select(col("vec_id"), col("pos").cast("long").as("rp_dim"),
          col("col").as("rp_val"))),

    // maximum-inner-product retrieval (raw dot, NOT cosine — the
    // recommender/learned-retriever order; differs from cosine
    // whenever corpus norms vary). Bounded-heap agg shape; the ANN
    // path is the norm-augmentation reduction to cosine (MipsSpec
    // pins the order equivalence)
    "sim_mips_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mipsTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "vec_id",
        "embedding", k = 5)
    }),
    // MIPS *ANN*: the Bachrach norm-augmentation reduction made
    // concrete — corpus vectors gain sqrt(M^2-|x|^2), queries gain 0,
    // and the UNCHANGED cosine-IVF stack (staged augmented fit,
    // build-once/search-many) retrieves by inner-product order. The
    // score column is the augmented-space cosine: per query a
    // positive affine image of the raw dot, so ranks are MIPS ranks
    // (MipsSpec pins the equivalence)
    "sim_mips_ivf_topk" -> ((s, dir) => {
      // the SERVING shape (r17): n and M² come from the staged
      // corpus card and the corpus probe reads the staged augmented
      // inverted list — a retrieval call runs zero full-corpus jobs
      // (pre-r17 this entry ran a count(), a max-norm scan, AND a
      // corpus re-assignment per call)
      val emb = t(s, dir, "embeddings")
      val (n, msq) = graft.ext.PairStage.corpusCard(s, dir)
      val nc = Similarity.autoCentroids(n)
      Similarity.ivfTopKStaged(
        graft.ext.PairStage.mipsIvfCentroids(s, dir, nc, iters = 2),
        graft.ext.PairStage.mipsIvfCorpusCells(s, dir, nc, iters = 2),
        Similarity.normAugment(emb.filter(col("vec_id") < 10),
          "embedding", lit(msq), isQuery = true, "av"),
        "vec_id", "av", k = 5, nProbe = 2)
    }),
    // per-label centroid-cosine outliers: the mislabeled-sample sweep
    "emb_outlier_report" -> ((s, dir) =>
      Similarity.labelOutlierReport(t(s, dir, "embeddings"), "vec_id",
        "label", "embedding", k = 5)),
    // per-cell SemDeDup removal rates (the paper's per-cluster dedup
    // fraction): an nCentroids-row rollup over the semdedup output —
    // the observable that decides eps and flags boilerplate-heavy
    // regions of the embedding space
    "emb_semdedup_cell_report" -> ((s, dir) => {
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      Similarity.semDedupFrom(
          graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
          graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
          eps = 0.3)
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("n_cell"),
          sum(col("is_removed")).as("n_removed"))
        .withColumn("removal_ppm", expr("n_removed * 1000000 div n_cell"))
    }),
    "sim_bruteforce_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "vec_id",
        "embedding", k = 5)
    }),
    "sim_bruteforce_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKAgg(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "vec_id",
        "embedding", k = 5)
    }),
    "sim_lsh_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshNearNeighbors(emb, "vec_id", "embedding", dim = 64,
        planes = Similarity.autoPlanes(
          graft.ext.PairStage.corpusCard(s, dir)._1), threshold = 0.2)
    }),
    // centroid count grows ~sqrt(n) with the corpus via autoCentroids
    // (the SQL twin derives the identical count from count(*)) — a
    // fixed count would leave n/const vectors per cell and the
    // within-cell scan linear again at 100x
    "sim_ivf_topk" -> ((s, dir) => {
      // fit AND inverted list are STAGED (PairStage.ivfCentroids /
      // ivfCorpusCells; n from the one-row corpus card) — a
      // retrieval call is the broadcast probe join over staged
      // cells, zero full-corpus jobs (VERDICT r16 #1);
      // value-identical to the inline assignment
      val emb = t(s, dir, "embeddings")
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      Similarity.ivfTopKStaged(
        graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
        graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
        emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 2)
    }),
    // nProbe tuning curve: measured recall@5 vs exact truth AND
    // measured probed-cell scan mass per candidate probe count, off
    // the STAGED fit/stats and ONE shared brute-force truth table —
    // the IVF twin of dedup_lsh_tune_report
    "ann_nprobe_tune_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val n = graft.ext.PairStage.corpusCard(s, dir)._1
      val nc = Similarity.autoCentroids(n)
      val q = emb.filter(col("vec_id") < 10)
      Similarity.ivfProbeTuneReport(
        graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
        graft.ext.PairStage.ivfCellStats(s, dir, nc, iters = 2),
        graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
        emb, q, "vec_id", "embedding", k = 5, nProbes = Seq(1, 2, 4),
        corpusN = n, nQueries = q.count())
    }),
    // IVF index health: one report row over the staged per-cell
    // stats (nCentroids rows — the same artifact the filtered search
    // sizes probeN from), never a corpus pass. The oracle replays the
    // Lloyd fit + assignment in SQL and aggregates identically.
    "ann_ivf_build_report" -> ((s, dir) => {
      val nC = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      Similarity.ivfBuildReport(
        graft.ext.PairStage.ivfCellStats(s, dir, nC, iters = 2), nC)
    }),
    // k-means cluster assignment as a first-class OUTPUT (corpus
    // partitioning for diversity balancing / per-cluster sampling),
    // not just the internal step of IVF search: the Lloyd-refined
    // coarse quantizer's final per-vector cell, hash-verified
    // INCLUDING the iterative fit (the oracle replays every Lloyd
    // round in SQL)
    "emb_kmeans_assign" -> ((s, dir) => {
      // reads the staged inverted list — the assignment IS the
      // artifact, so the consumer is a two-column scan of it
      graft.ext.PairStage.ivfCorpusCells(s, dir,
          Similarity.autoCentroids(
            graft.ext.PairStage.corpusCard(s, dir)._1), iters = 2)
        .select(col("vec_id"), col("centroid_id"))
    }),
    // greedy k-center coreset (farthest-point traversal): 8 maximally
    // spread exemplars — the diversity-selection primitive. The
    // selection trace is fully deterministic (ppm-quantized distances,
    // vec_id tiebreaks), so the oracle replays all 8 rounds as
    // unrolled CTEs. See Sampling.kCenterCoreset.
    "sample_coreset_kcenter" -> ((s, dir) =>
      Sampling.kCenterCoreset(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8)),
    // embedding-diversity balancing: the k-means cells play the class
    // label and every cell downsamples to the minority cell's count —
    // the semantic-coverage counterpart of source-domain balancing,
    // composed from two verified operators (cluster assignment +
    // deterministic class rebalancing)
    "sample_cluster_balanced" -> ((s, dir) => {
      val assigned = graft.ext.PairStage.ivfCorpusCells(s, dir,
          Similarity.autoCentroids(
            graft.ext.PairStage.corpusCard(s, dir)._1), iters = 2)
        .select(col("vec_id"), col("centroid_id"))
      Corpus.balanceClasses(assigned, col("centroid_id"), col("vec_id"))
        .select(col("vec_id"), col("centroid_id"))
    }),
    // product quantization: corpus compressed to 4 codeword ids per
    // vector, search by integer ADC lookup-table sums — like the IVF
    // fit, the ITERATIVE per-subspace k-means is hash-verified in SQL
    "sim_pq_topk" -> ((s, dir) => {
      // codebooks + encoded corpus are STAGED (PairStage.pqIndex):
      // a deployed PQ index persists both — re-encoding per search
      // would defeat the compression
      val emb = t(s, dir, "embeddings")
      val (books, codes) = graft.ext.PairStage.pqIndex(s, dir,
        dim = 64, m = 4, ksub = 16, iters = 2)
      Similarity.pqTopKWith(books, codes, emb,
        emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, m = 4, k = 5)
    }),
    // IVF-PQ composed search — the billion-scale retrieval
    // architecture: the coarse quantizer restricts WHICH rows are
    // scored (nProbe cells), product codes decide HOW CHEAPLY (m int
    // lookups per row); exact rerank on the integer shortlist. The
    // staged artifact is the inverted-list form (codes WITH cell ids).
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      val (cents, books, cells) = graft.ext.PairStage.ivfPqIndex(
        s, dir, nc, dim = 64, m = 4, ksub = 16, iters = 2)
      Similarity.ivfPqTopKWith(cents, books, cells, emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, m = 4, k = 5, nProbe = 2)
    }),
    // int8 symmetric quantization + exact rerank: the corpus-wide scan
    // reads 8-bit codes (4x fewer bytes than float32, integer ALU
    // scoring), full-precision vectors fetched only for the k*4
    // candidate sliver — the memory-bandwidth ANN shape at 100 TB
    "sim_int8_rerank_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.int8RerankTopKWith(
        graft.ext.PairStage.int8Index(s, dir),
        emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, candMult = 4)
    }),

    // ANN quality, REPORTED per round rather than only spec-asserted
    // (a parameter change that trades recall for speed must show up in
    // an artifact): recall@5 of the shipped IVF configuration
    // (nProbe=2) against the exact brute-force top-k, as an integer
    // ppm — and because both sides' oracles exist, the recall itself
    // is hash-verified, not rows-only.
    "ann_recall_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      val ivf = Similarity.ivfTopKStaged(
          graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
          graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
          q, "vec_id", "embedding", k = 5, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("ivf_nprobe2").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
    }),
    // MIPS recall-vs-nProbe (VERDICT r14 #6): the augmented-space IVF
    // (sim_mips_ivf_topk's index, staged fit shared across the three
    // probe configs) priced against the EXACT raw-dot MIPS truth
    // (sim_mips_topk) — the same artifact the cosine family ships via
    // ann_nprobe_tune_report, so the Bachrach reduction's recall/scan
    // dial is measured, not just rank-pinned at all-cells-probed.
    "ann_mips_recall_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val truth = Similarity.mipsTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val (n, msq) = graft.ext.PairStage.corpusCard(s, dir)
      val nc = Similarity.autoCentroids(n)
      val cents = graft.ext.PairStage.mipsIvfCentroids(s, dir, nc,
        iters = 2)
      val cells = graft.ext.PairStage.mipsIvfCorpusCells(s, dir, nc,
        iters = 2)
      val qAug = Similarity.normAugment(q, "embedding", lit(msq),
        isQuery = true, "av")
      Seq(1, 2, 4).map { np =>
        val ivf = Similarity.ivfTopKStaged(cents, cells, qAug,
            "vec_id", "av", k = 5, nProbe = np)
          .select(col("query_id"), col("neighbor_id"),
            lit(1).as("hit"))
        truth.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .agg(count(col("hit")).as("matched"),
            count(lit(1)).as("total"))
          .select(lit(s"mips_ivf_np$np").as("method"),
            lit(np.toLong).as("n_probe"), col("matched"), col("total"),
            expr("matched * 1000000L div total").as("recall_ppm"))
      }.reduce(_.unionAll(_))
    }),
    // same report for the shipped PQ configuration (m=4, ksub=16,
    // shortlist+exact-rerank): codebook or shortlist parameter changes
    // cannot silently trade recall for speed — the recall number
    // itself is hash-verified against the composed oracles.
    "pq_recall_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val (books, codes) = graft.ext.PairStage.pqIndex(s, dir,
        dim = 64, m = 4, ksub = 16, iters = 2)
      val pq = Similarity.pqTopKWith(books, codes, emb, q,
          "vec_id", "embedding", dim = 64, m = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(pq, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("pq_m4_ksub16").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
    }),
    // recall of the int8-quantize+rerank path vs exact top-k: the
    // quantization loses precision only in CANDIDATE selection (the
    // rerank is exact double math), so this reports how often the true
    // top-5 survives the k*4 int8 shortlist — and a candMult change
    // cannot silently trade recall for scan speed.
    "int8_recall_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val i8 = Similarity.int8RerankTopKWith(
          graft.ext.PairStage.int8Index(s, dir), q, "vec_id", "embedding",
          k = 5, candMult = 4)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(i8, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("int8_cand4x").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
    }),
    // incremental IVF index maintenance (the ANN twin of
    // dedup_incremental's corpus x batch contract): the standing
    // index's centroids stay FIXED between refits — the batch
    // (vec_id % 10 == 7, the daily-increment replay) is assigned with
    // the stale staged centroids at O(|batch| x nCentroids) cost,
    // never a corpus re-fit — and the output is the upsert report a
    // production index emits: per-cell membership before/after plus
    // the integer-ppm staleness counter and refit trigger
    "sim_ivf_incremental" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 10 === 7)
      val cents = graft.ext.PairStage.ivfCentroidsCorpus(s, dir,
        Similarity.autoCentroids(
          graft.ext.PairStage.corpusCard(s, dir, excludeMod = 7)._1),
        iters = 2, excludeMod = 7)
      Similarity.ivfUpsertReport(cents, corpus, batch,
        "vec_id", "embedding")
    }),
    // the upserted inverted LIST itself (r17 #6's incremental staging
    // variant): standing cells staged once under the stale fit, the
    // daily increment assigned at O(|batch| x nCentroids) and
    // appended — the artifact the index serves between refits, as a
    // first-class hash-verified output (the oracle replays the stale
    // fit and assigns every vector with it)
    "sim_ivf_upsert_cells" -> ((s, dir) => {
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir, excludeMod = 7)._1)
      graft.ext.PairStage.ivfCorpusCellsUpsert(s, dir, nc, iters = 2,
          excludeMod = 7)
        .select(col("vec_id"), col("centroid_id"))
    }),
    // recall of BOTH maintenance states against exact brute force
    // over the full corpus — the pair of numbers the refit policy
    // rests on: (a) the UPSERTED index (full corpus searched with the
    // STALE centroids, fit on the standing 90% only) quantifies what
    // staleness costs at the trigger threshold; (b) the POST-REFIT
    // index (centroids refit on the full corpus — what the fired
    // refit_due trigger produces) proves the refit restores the
    // staged-index recall floor. Probe-compensation is the measured
    // alternative and loses: the stale index needs ~3x nProbe to
    // reach the fresh floor (AnnIncrementalSpec sweep), a per-search
    // cost paid forever vs the refit's one-time cost. Hash-verified
    // like the other recall reports (all operand oracles composed).
    "ann_incremental_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 10 =!= 7)
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      def recallRow(ivf0: DataFrame, method: String) = {
        val ivf = ivf0
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
          .select(lit(method).as("method"), col("matched"), col("total"),
            expr("matched * 1000000L div total").as("recall_ppm"))
      }
      // the STALE row deliberately assigns the full corpus with the
      // stale standing-only fit inline: that configuration is the
      // audited anomaly, not a persisted serving index. The
      // POST-REFIT row reads the staged inverted list (it IS the
      // serving configuration).
      val ncFull = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      recallRow(Similarity.ivfTopKWith(
          graft.ext.PairStage.ivfCentroidsCorpus(s, dir,
            Similarity.autoCentroids(
              graft.ext.PairStage.corpusCard(s, dir, excludeMod = 7)._1),
            iters = 2, excludeMod = 7),
          emb, q, "vec_id", "embedding", k = 5, nProbe = 2),
          "ivf_stale_nprobe2")
        .unionByName(recallRow(Similarity.ivfTopKStaged(
          graft.ext.PairStage.ivfCentroids(s, dir, ncFull, iters = 2),
          graft.ext.PairStage.ivfCorpusCells(s, dir, ncFull, iters = 2),
          q, "vec_id", "embedding", k = 5, nProbe = 2),
          "ivf_postrefit_nprobe2"))
    }),
    // filtered ANN search — predicate + top-k ("nearest among docs
    // where lang='en'"), the shape real retrieval almost always
    // takes: the predicate is pushed below the cell assignment (the
    // probed cells scan only eligible vectors) and nProbe is
    // compensated for selectivity by the integer formula both engines
    // derive from the same two counts — corpus size off the staged
    // index's cell stats (nCentroids rows, never a corpus scan),
    // kept off the filtered sliver's own STAGED assignment: `label`
    // is a standing filter attribute, so the sliver is built once per
    // session (PairStage.ivfFilteredCells) and every retrieval batch
    // pays only stats-read + probe-join (r13; the ad-hoc path
    // re-assigned and re-materialized the sliver per call — the r12
    // bench priced that at +0.49s per call at sf0.1)
    "sim_ivf_filtered_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      val cents = graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2)
      val stats = graft.ext.PairStage.ivfCellStats(s, dir, nc, iters = 2)
      val sliver = graft.ext.PairStage.ivfFilteredCells(s, dir, nc,
        iters = 2, predTag = "label%4=1", pred = col("label") % 4 === 1)
      Similarity.ivfFilteredTopKStaged(cents, stats, sliver,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nProbe = 2, nCentroids = nc)
    }),
    // recall of the COMPOSED IVF-PQ search — the one operator whose
    // recall depends on two interacting approximations (nProbe cell
    // restriction x integer-ADC shortlist): reported at the shipped
    // shortlist AND at a saturated shortlist (65536 >= any corpus the
    // gate runs, where the composition provably reduces to flat IVF —
    // spec-pinned), so the report separates what the SHORTLIST costs
    // from what the CELL RESTRICTION costs. Same hash-verified
    // composition as the other recall reports: both operand oracles
    // are replayed, so the recall numbers themselves are exact.
    "ivfpq_recall_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      val (cents, books, cells) = graft.ext.PairStage.ivfPqIndex(
        s, dir, nc, dim = 64, m = 4, ksub = 16, iters = 2)
      val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
          "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      def recallRow(shortlist: Int, method: String) = {
        val pq = Similarity.ivfPqTopKWith(cents, books, cells, emb, q,
            "vec_id", "embedding", dim = 64, m = 4, k = 5, nProbe = 2,
            shortlist = shortlist)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
        brute.join(pq, Seq("query_id", "neighbor_id"), "left")
          .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
          .select(lit(method).as("method"), col("matched"), col("total"),
            expr("matched * 1000000L div total").as("recall_ppm"))
      }
      recallRow(50, "ivfpq_np2_sl50")
        .unionByName(recallRow(65536, "ivfpq_np2_slsat"))
    }),
    // recall of the MinHash-LSH candidate generator against exact
    // shingle jaccard over the SAME 3-shingle space — the dedup twin
    // of the ANN/PQ recall reports: a band/row or threshold change
    // can no longer silently trade dedup recall for speed, because
    // the recall number itself is hash-verified.
    "lsh_recall_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
      // candidate side reads the staged pair artifact (identical rows
      // to a live minhashLshPairs run); the exact-truth side stays a
      // deliberate spec-side cost
      val lsh = graft.ext.PairStage.lshPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(1).as("hit"))
      exact.join(lsh, Seq("doc_a", "doc_b"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("minhash_k32_b8").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
    }),

    // PQ quantization-health: per-subspace reconstruction error +
    // codebook utilization off the STAGED books/codes — the index
    // audit that decides whether m/ksub buy enough fidelity before
    // anyone trusts the ADC shortlist
    "pq_distortion_report" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (books, codes) = graft.ext.PairStage.pqIndex(s, dir,
        dim = 64, m = 4, ksub = 16, iters = 2)
      Similarity.pqDistortionReport(books, codes, emb, "vec_id",
        "embedding", dim = 64, m = 4)
    }),
    "mm_payload_stats" -> ((s, dir) =>
      Multimodal.payloadStats(t(s, dir, "documents"))),
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(t(s, dir, "documents"))).toDF()),
    // decode-or-quarantine over a deterministically hostile fixture
    // (1/11 truncated, 2/11 unparseable): corrupt payloads become
    // classified quarantine rows instead of task deaths, counted
    // loudly through GuardLog — the form a 100 TB decode job runs
    "mm_decode_quarantine" -> ((s, dir) =>
      Multimodal.decodeQuarantine(
        Multimodal.corruptFixture(
          Multimodal.mediaFromDocuments(t(s, dir, "documents"))))),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameScanlines(
        Multimodal.mediaFromDocuments(t(s, dir, "documents")),
        stride = 2).toDF()),
    // 56-bit dHash perceptual fingerprint from the REAL P6 decode:
    // 8 bytes/image replace the payload in every dedup comparison and
    // feed the SimHash-style hamming-band pair machinery
    "mm_image_phash" -> ((s, dir) =>
      Multimodal.dhash(
        Multimodal.mediaFromDocuments(t(s, dir, "documents"))).toDF()),
    // content-level image dedup over a duplicate-upload fixture
    // (seed = doc_id % 97; odd ids re-encoded with a header comment):
    // groups by the dHash of the DECODED raster, so re-encoded copies
    // — distinct payload bytes, identical pixels — collapse where
    // md5(payload) dedup misses them; n_distinct_payloads is that
    // catch made visible per group
    "mm_phash_dedup" -> ((s, dir) =>
      Multimodal.phashDedupReport(
        Multimodal.mediaDupFromDocuments(t(s, dir, "documents")))),
    // image NEAR-dup pairs: Hamming-banded dHash over the
    // edited-reupload fixture (one raster byte retouched on every
    // third copy — the edit content hashing misses); identical hashes
    // collapse to classes BEFORE banding (r16 — per-row banding was
    // Theta(k^2) per duplicate class, 97.9M rows at sf1), 4x14-bit
    // bands make the <=3-Hamming class-pair set lossless vs brute
    // force, which is exactly what the oracle replays
    "mm_phash_pairs" -> ((s, dir) =>
      Multimodal.phashHammingPairs(
        Multimodal.mediaEditedFromDocuments(t(s, dir, "documents")))),
    // resize-then-decode: proves the nearest-neighbor downscale emits
    // valid P6 whose pixels are exactly the stride-sampled source
    // pixels (the oracle replays the generator formula at 2x stride)
    "mm_resize_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.resize(
          Multimodal.mediaFromDocuments(t(s, dir, "documents")),
          factor = 2)).toDF()),
    // audio modality: the second REAL codec (RIFF/WAVE 16-bit PCM).
    // Fixture clips are generated from doc_id; every third clip
    // carries an odd-sized junk LIST chunk, so the decoder's chunk
    // walker (and its RIFF pad handling) is exercised by the corpus
    // itself, and the oracle replays every decoded sample statistic
    // in closed form — a wrong parse cannot hash-match
    "mm_audio_features" -> ((s, dir) =>
      Audio.decodeFeatures(
        Audio.audioFromDocuments(t(s, dir, "documents"))).toDF()),
    "mm_audio_frame_sample" -> ((s, dir) =>
      Audio.frameSample(
        Audio.audioFromDocuments(t(s, dir, "documents")),
        frameLen = 25, stride = 2).toDF()),
    // the THIRD real codec (video/AVI): nested-RIFF walker, avih
    // header, junk-chunk skipping inside movi, and DIB frame
    // conventions (bottom-up rows, BGR order, 4-byte row padding)
    // each pinned by a statistic the oracle replays in closed form —
    // sum_rowweighted flips on a top-down read, sum_r/sum_b swap on
    // an RGB read, everything drifts if pad bytes leak into sums
    "mm_video_features" -> ((s, dir) =>
      Video.decodeFeatures(
        Video.videoFromDocuments(t(s, dir, "documents"))).toDF()),
    "mm_video_frame_sample" -> ((s, dir) =>
      Video.frameSample(
        Video.videoFromDocuments(t(s, dir, "documents")),
        stride = 2).toDF()),
    // heterogeneous-corpus dispatch — the shape a real multimodal
    // 100 TB pipeline runs: each document routes to ITS modality's
    // codec (doc_id % 3: image/audio/video, the payload_stats
    // convention), decodes through the real parser, and lands in one
    // harmonized schema. Three filtered branches, one union — every
    // branch is narrow mapPartitions over its slice of the scan, so
    // the dispatch adds no shuffle to any codec path.
    "mm_modality_dispatch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val img = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(
          docs.filter(col("doc_id") % 3 === 0))).toDF()
        .select(col("media_id"), lit("image").as("modality"),
          col("n_bytes"), col("n_pixels").as("n_units"),
          (col("sum_r") + col("sum_g") + col("sum_b")).as("content_sum"))
      val aud = Audio.decodeFeatures(Audio.audioFromDocuments(
          docs.filter(col("doc_id") % 3 === 1))).toDF()
        .select(col("media_id"), lit("audio").as("modality"),
          col("n_bytes"), col("n_samples").as("n_units"),
          col("sum_abs").as("content_sum"))
      val vid = Video.decodeFeatures(Video.videoFromDocuments(
          docs.filter(col("doc_id") % 3 === 2))).toDF()
        .select(col("media_id"), lit("video").as("modality"),
          col("n_bytes"),
          (col("n_frames") * col("width") * col("height")).as("n_units"),
          (col("sum_r") + col("sum_g") + col("sum_b")).as("content_sum"))
      img.unionByName(aud).unionByName(vid)
    }),
    // the MULTIMODAL curation flagship (VERDICT r15 #4): the text
    // funnels' production shape applied to the image column —
    // modality dispatch routes the image slice (doc_id % 3, the
    // payload_stats convention) through the duplicate-upload fixture,
    // then ONE real decode pass emits every curation feature AND the
    // perceptual hash (decodeProfile — gates and dedup share the
    // decode, never re-run it per stage), followed by size gate ->
    // brightness gate -> phash keep-representative (content-level:
    // re-encoded copies collapse where byte dedup misses) ->
    // temperature source mixture. Funnel rows count items and decoded
    // pixel mass per stage prefix; each prefix materializes once (the
    // curation_funnel discipline). Every stage is an already-verified
    // operator; this registers the composition.
    "corpus_curation_mm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val imgDocs = docs.filter(col("doc_id") % 3 === 0)
      val profile = Multimodal.decodeProfile(
          Multimodal.mediaDupFromDocuments(imgDocs)).toDF()
        .join(imgDocs.select(col("doc_id").as("media_id"),
          col("source")), Seq("media_id"))
      val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
        "size_gate" -> ((in: DataFrame) =>
          in.filter(col("n_pixels") >= 24)),
        "brightness_gate" -> ((in: DataFrame) =>
          in.filter(col("brightness_ppm").between(300000L, 650000L))),
        "phash_dedup" -> ((in: DataFrame) => in.join(
          in.groupBy(col("phash")).agg(min(col("media_id"))
            .as("media_id")).select("media_id"), Seq("media_id"))),
        "temp_mixture" -> ((in: DataFrame) =>
          Corpus.temperatureSample(in, col("source"), col("media_id"))))
      val prefixes = stages.scanLeft("decode_profile" ->
        graft.ext.Materialize.eager(profile)) {
        case ((_, df), (name, stage)) =>
          name -> graft.ext.Materialize.eager(stage(df))
      }
      prefixes.zipWithIndex.map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("n_items"),
            coalesce(sum(col("n_pixels")), lit(0L)).as("n_pixels"))
          .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_items"), col("n_pixels"))
      }.reduce(_.unionAll(_))
    }),
    // per-label embedding centroids in stable micro-units: components
    // floor-quantized to int64 at 1e6 (float sums order-drift; long
    // sums don't), summed per (label, dim) with the fold in decimal128
    // (exact while a class total stays under 1e38), mean as exact
    // FLOOR division — (a - pmod(a, n)) div n, which equals DuckDB's
    // // on negative sums where plain div would truncate toward zero.
    // One posexplode + one hash-agg keyed by (label, dim): map-side
    // combine collapses to classes x dims rows before the shuffle
    "emb_label_centroids" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")))
        .select(col("label"), col("pos").cast("long").as("dim"),
          floor(col("col").cast("double") * 1000000).cast("long")
            .as("micro"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("micro").cast(dec)).cast("long").as("sum_micro"))
        .withColumn("mean_micro",
          expr("(sum_micro - pmod(sum_micro, n)) div n"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "emb_normalize" -> s"""
      WITH n AS (SELECT vec_id,
          sqrt(list_sum(list_transform(embedding,
            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS l2_norm,
          $NormSql AS unit
        FROM embeddings)
      SELECT vec_id, unnest(range(len(unit))) AS dim, l2_norm,
        unnest(unit) AS unit_val
      FROM n WHERE l2_norm > 0""",
    // same micro quantization; HUGEINT products; global sums derived
    // from the per-label sums exactly as the Spark plan does
    "emb_label_separation" -> """
      WITH ex AS (SELECT CAST(label AS BIGINT) AS label,
          unnest(range(len(embedding))) AS dim,
          unnest(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
            AS micro
        FROM embeddings),
      per AS (SELECT label, dim, count(*) AS n_l,
          sum(CAST(micro AS HUGEINT)) AS s_l,
          sum(CAST(micro AS HUGEINT) * CAST(micro AS HUGEINT)) AS ss_l
        FROM ex GROUP BY 1, 2),
      g AS (SELECT dim, sum(s_l) AS s_g, sum(n_l) AS n_g
            FROM per GROUP BY 1),
      j AS (SELECT label, n_l, n_g,
          (s_l * n_g - s_g * n_l) * (s_l * n_g - s_g * n_l) AS bn,
          (n_l * ss_l - s_l * s_l) AS vn
        FROM per JOIN g USING (dim)),
      a AS (SELECT label, max(n_l) AS n_vecs, max(n_g) AS ng,
          sum(bn) AS bns, sum(vn) AS vns FROM j GROUP BY 1),
      f AS (SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
          CAST(bns // (CAST(n_vecs AS HUGEINT) * ng * n_vecs * ng)
            AS BIGINT) AS between_micro2,
          CAST(vns // (CAST(n_vecs AS HUGEINT) * n_vecs)
            AS BIGINT) AS within_micro2
        FROM a)
      SELECT label, n_vecs, between_micro2, within_micro2,
             CAST(between_micro2 * 1000000
               // greatest(within_micro2, 1) AS BIGINT) AS separation_ppm
      FROM f""",
    // same quantize-once arithmetic: q = floor(x * 1e4), HUGEINT
    // products for the exact variance numerator (Spark side:
    // decimal128), integer floor-div by n^2
    "emb_dimension_health" -> """
      WITH e AS (SELECT unnest(range(len(embedding))) AS dim,
          CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
            AS BIGINT) AS q
        FROM embeddings),
      g AS (SELECT dim, count(*) AS n_vecs,
          min(q) AS min_q, max(q) AS max_q,
          CAST(sum(q) AS BIGINT) AS sum_q,
          sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS ssq
        FROM e GROUP BY 1),
      v AS (SELECT dim, n_vecs, min_q, max_q, sum_q,
          CAST((CAST(n_vecs AS HUGEINT) * ssq
                - CAST(sum_q AS HUGEINT) * CAST(sum_q AS HUGEINT))
            // (CAST(n_vecs AS HUGEINT) * n_vecs) AS BIGINT) AS var_q8
        FROM g)
      SELECT CAST(dim AS BIGINT) AS dim, CAST(n_vecs AS BIGINT) AS n_vecs,
             min_q, max_q, sum_q, var_q8, (var_q8 < 100) AS is_dead
      FROM v""",
    // plane weight (9000+j, d=i-1) replayed inline: hex60 of the
    // "p,d" key, reduced to [-1, 1] in exact millionths
    "emb_random_projection" -> s"""
      WITH r AS (SELECT vec_id, list_transform(range(16), j ->
          list_sum(list_transform(range(1, 65), i ->
            CAST(embedding[i] AS DOUBLE) *
            ((${hex60Sql("CAST(9000 + j AS VARCHAR) || ',' || CAST(i - 1 AS VARCHAR)")}
              % 2000001 - 1000000) / 1000000.0)))) AS rp
        FROM embeddings)
      SELECT vec_id, unnest(range(16)) AS rp_dim, unnest(rp) AS rp_val
      FROM r""",
    "sim_ivf_topk" -> ivfTopKSql(k = 5, nProbe = 2, iters = 2),
    // ONE shared Lloyd replay feeds all three probe configs. The
    // shared frames are pinned AS MATERIALIZED (the BPE-oracle
    // idiom): without the hint DuckDB INLINES each multi-referenced
    // CTE into every consumer, so the fit chain replayed 4x and the
    // sf1 gate hit the engine's memory ceiling; materialized, the
    // replay runs once (cam), the probe ranking once (qrm), the brute
    // truth once, and each config branch is a metadata-sized epilogue.
    "ann_nprobe_tune_report" -> {
      def cfg(n: Int) = s"""
      ivf$n AS (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM (SELECT qrm.query_id, cam.vec_id AS neighbor_id,
                   ${dotSql("qrm.qv", "cam.v")} AS cosine
                FROM qrm JOIN cam USING (centroid_id)
                WHERE qrm.rn <= $n AND qrm.query_id <> cam.vec_id)
          WHERE NOT isnan(cosine)) WHERE rank <= 5),
      r$n AS (SELECT CAST(count(i.neighbor_id) AS BIGINT) AS matched,
                  CAST(count(*) AS BIGINT) AS total
              FROM ivf$n i RIGHT JOIN brute b
                ON b.query_id = i.query_id
                AND b.neighbor_id = i.neighbor_id),
      s$n AS (SELECT COALESCE(CAST(sum(n_cell) AS BIGINT), 0)
                  AS scanned_rows
              FROM qrm JOIN cells USING (centroid_id)
              WHERE qrm.rn <= $n)"""
      def row(n: Int) = s"""
      SELECT 'ivf_np$n' AS method, matched, total,
             matched * 1000000 // total AS recall_ppm,
             scanned_rows,
             scanned_rows * 1000000 // denom AS scanned_ppm
      FROM r$n CROSS JOIN s$n CROSS JOIN consts"""
      s"""
      WITH ${ivfAssignCtes(2)},
      cam AS MATERIALIZED (SELECT vec_id, centroid_id, v FROM ca),
      cells AS MATERIALIZED (SELECT centroid_id,
                CAST(count(*) AS BIGINT) AS n_cell
              FROM cam GROUP BY 1),
      qx AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM nv
             WHERE vec_id < 10),
      qrm AS MATERIALIZED (SELECT query_id, centroid_id, qv, rn FROM (
          SELECT qx.query_id, c2.centroid_id, qx.qv,
                 row_number() OVER (PARTITION BY qx.query_id
                   ORDER BY ${dotSql("qx.qv", "c2.cv")} DESC,
                            c2.centroid_id) AS rn
          FROM qx CROSS JOIN c2)),
      brute AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM (SELECT qx.query_id, e.vec_id AS neighbor_id,
                   ${dotSql("qx.qv", "e.v")} AS cosine
                FROM qx CROSS JOIN nv e WHERE qx.query_id <> e.vec_id)
          WHERE NOT isnan(cosine)) WHERE rank <= 5),
      consts AS MATERIALIZED (SELECT
                   (SELECT CAST(count(*) AS BIGINT) FROM qx)
                   * (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
                   AS denom),
      ${cfg(1)},${cfg(2)},${cfg(4)}
      ${row(1)}
      UNION ALL${row(2)}
      UNION ALL${row(4)}"""
    },
    // MIPS recall-vs-nProbe: one shared AUGMENTED Lloyd replay (the
    // mipsIvfTopKSql fit, 65-dim) feeds all three probe configs —
    // same MATERIALIZED-CTE discipline as ann_nprobe_tune_report —
    // and the truth side is the exact RAW-DOT MIPS top-5 (the
    // sim_mips_topk twin), so the recall prices the whole Bachrach
    // reduction end-to-end, not just the augmented-space search.
    "ann_mips_recall_report" -> {
      val selfDot = "list_sum(list_transform(embedding," +
        " y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))"
      val aug = "list_append(list_transform(embedding," +
        s" x -> CAST(x AS DOUBLE)), sqrt(mx.msq - $selfDot))"
      val nvSelect =
        s"""SELECT vec_id, list_transform(av,
           |            x -> x / sqrt(list_sum(list_transform(av, y -> y*y)))) AS v
           |          FROM (SELECT vec_id, $aug AS av
           |                FROM embeddings CROSS JOIN mx)""".stripMargin
      val pre =
        s"mx AS (SELECT max($selfDot) AS msq FROM embeddings),\n      "
      def cfg(n: Int) = s"""
      ivf$n AS (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM (SELECT qrm.query_id, cam.vec_id AS neighbor_id,
                   ${dotSqlN("qrm.qv", "cam.v", 65)} AS cosine
                FROM qrm JOIN cam USING (centroid_id)
                WHERE qrm.rn <= $n AND qrm.query_id <> cam.vec_id)
          WHERE NOT isnan(cosine)) WHERE rank <= 5),
      r$n AS (SELECT CAST(count(i.neighbor_id) AS BIGINT) AS matched,
                  CAST(count(*) AS BIGINT) AS total
              FROM ivf$n i RIGHT JOIN truth b
                ON b.query_id = i.query_id
                AND b.neighbor_id = i.neighbor_id)"""
      def row(n: Int) = s"""
      SELECT 'mips_ivf_np$n' AS method, CAST($n AS BIGINT) AS n_probe,
             matched, total,
             matched * 1000000 // total AS recall_ppm
      FROM r$n"""
      s"""
      WITH ${ivfAssignCtes(2, nvSelect = nvSelect, preCtes = pre,
                           dim = 65)},
      cam AS MATERIALIZED (SELECT vec_id, centroid_id, v FROM ca),
      qx AS MATERIALIZED (SELECT vec_id AS query_id,
             list_append($NormSql, 0.0) AS qv
             FROM embeddings WHERE vec_id < 10),
      qrm AS MATERIALIZED (SELECT query_id, centroid_id, qv, rn FROM (
          SELECT qx.query_id, c2.centroid_id, qx.qv,
                 row_number() OVER (PARTITION BY qx.query_id
                   ORDER BY ${dotSqlN("qx.qv", "c2.cv", 65)} DESC,
                            c2.centroid_id) AS rn
          FROM qx CROSS JOIN c2)),
      truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id) AS rank
          FROM (SELECT q2.query_id, e.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1,65),
                     i -> CAST(q2.qraw[i] AS DOUBLE)
                        * CAST(e.embedding[i] AS DOUBLE))) AS dot
                FROM (SELECT vec_id AS query_id, embedding AS qraw
                      FROM embeddings WHERE vec_id < 10) q2
                CROSS JOIN embeddings e
                WHERE q2.query_id <> e.vec_id))
          WHERE rank <= 5),
      ${cfg(1)},${cfg(2)},${cfg(4)}
      ${row(1)}
      UNION ALL${row(2)}
      UNION ALL${row(4)}"""
    },
    // cell-population aggregates over the replayed assignment; nc_t
    // (the SQL twin of autoCentroids) supplies the trained cell count
    "ann_ivf_build_report" -> s"""
      WITH ${ivfAssignCtes(2)},
      cells AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_cell
                FROM ca GROUP BY 1),
      agg AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n_vectors,
                     CAST(count(*) AS BIGINT) AS n_nonempty,
                     CAST(max(n_cell) AS BIGINT) AS max_cell,
                     CAST(min(n_cell) AS BIGINT) AS min_cell FROM cells),
      ncl AS (SELECT CAST(nc AS BIGINT) AS n_cells FROM nc_t),
      top AS (SELECT CAST(sum(n_cell) AS BIGINT) AS top_mass FROM
              (SELECT n_cell, centroid_id FROM cells
               ORDER BY n_cell DESC, centroid_id LIMIT 2))
      SELECT n_cells, n_nonempty, n_cells - n_nonempty AS n_empty,
             n_vectors, max_cell, min_cell,
             max_cell * 1000000 // greatest(n_vectors // n_cells, 1)
               AS imbalance_ppm,
             top_mass * 1000000 // n_vectors AS top2_mass_ppm
      FROM ncl CROSS JOIN agg CROSS JOIN top""",
    // the shared Lloyd-fit CTEs, surfaced as a standalone assignment
    "emb_kmeans_assign" -> s"""
      WITH ${ivfAssignCtes(2)}
      SELECT vec_id, centroid_id FROM ca""",
    // kmeans cells as the balancing class: same keep rule as
    // balance_event_classes (exact BIGINT cross-multiplication on the
    // salted hash bucket), over the assignment CTEs
    "sample_coreset_kcenter" -> kCenterSql(8),
    "sample_cluster_balanced" -> s"""
      WITH ${ivfAssignCtes(2)},
      asg AS (SELECT vec_id, centroid_id FROM ca),
      cc AS (SELECT centroid_id AS cls, count(*) AS n
             FROM asg GROUP BY 1),
      mm AS (SELECT min(n) AS mn FROM cc)
      SELECT a.vec_id, a.centroid_id
      FROM asg a
      JOIN cc ON a.centroid_id IS NOT DISTINCT FROM cc.cls CROSS JOIN mm
      WHERE (${hex60Sql("'bal' || CAST(a.vec_id AS VARCHAR)")}
               % ${Sampling.Buckets}) * cc.n
            < mm.mn * ${Sampling.Buckets}""",
    "sim_pq_topk" -> pqTopKSql(dim = 64, m = 4, ksub = 16, k = 5,
      shortlist = 50, iters = 2),
    // the shared PQ fit/encode chain, then the same left-fold residual
    // energy floor-quantized at 1e9 per (vector, subspace) — integer
    // rollup per subspace
    "pq_distortion_report" -> {
      val dsub = 16
      val d = s"(s.xj[CAST(i AS INTEGER)] - b.scv[CAST(i AS INTEGER)])"
      s"""
      WITH nv AS (SELECT vec_id, $NormSql AS v FROM embeddings),
      ${pqCodesCtes(64, 4, 16, 2)},
      r AS (SELECT c.j, c.code_id,
              CAST(FLOOR(list_sum(list_transform(range(1, ${dsub + 1}),
                i -> $d * $d)) * 1000000000) AS BIGINT) AS sq_e9
            FROM codes c
            JOIN sub s ON s.vec_id = c.vec_id AND s.j = c.j
            JOIN b2 b ON b.j = c.j AND b.code_id = c.code_id)
      SELECT j, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(count(DISTINCT code_id) AS BIGINT) AS n_codes_used,
             CAST(sum(sq_e9) // count(*) AS BIGINT) AS avg_sq_e9,
             CAST(max(sq_e9) AS BIGINT) AS max_sq_e9
      FROM r GROUP BY j"""
    },
    "sim_ivfpq_topk" -> ivfPqTopKSql(dim = 64, m = 4, ksub = 16, k = 5,
      nProbe = 2, shortlist = 50, iters = 2),
    "sim_lsh_ann" -> lshPairsSql(tables = 1, threshold = 0.2),

    // raw dot product, same per-term double widening as DotProduct
    "sim_mips_topk" -> s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 10),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               list_sum(list_transform(range(1,65),
                 i -> CAST(qv[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE))) AS dot
        FROM q, embeddings e WHERE query_id <> e.vec_id)
      SELECT query_id, neighbor_id, dot, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",

    "sim_bruteforce_topk" -> s"""
      WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
      q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${dotSql("qv", "e.nv")} AS cosine
        FROM q, n e WHERE query_id <> e.vec_id)
      SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored WHERE NOT isnan(cosine))
      WHERE rank <= 5""",

    "sim_bruteforce_topk_agg" -> s"""
      WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
      q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${dotSql("qv", "e.nv")} AS cosine
        FROM q, n e WHERE query_id <> e.vec_id)
      SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored WHERE NOT isnan(cosine))
      WHERE rank <= 5""",

    "sim_int8_rerank_topk" -> int8RerankSql(k = 5, candMult = 4),

    // int8 shortlist recall vs exact top-k — same composition as
    // ann_recall_report, over the int8RerankSql twin
    "int8_recall_report" -> s"""
      SELECT 'int8_cand4x' AS method,
             CAST(count(i.neighbor_id) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(i.neighbor_id) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM (${int8RerankSql(k = 5, candMult = 4)}) i
      RIGHT JOIN (
        WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
        scored AS (
          SELECT query_id, e.vec_id AS neighbor_id,
                 ${dotSql("qv", "e.nv")} AS cosine
          FROM q, n e WHERE query_id <> e.vec_id)
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored WHERE NOT isnan(cosine))
        WHERE rank <= 5) b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id""",

    "sim_ivf_incremental" -> ivfUpsertReportSql(iters = 2,
      excludeMod = 7, refitPpm = 50000L),
    // the upserted inverted list == every vector assigned with the
    // stale standing-only fit (the staged standing half and the
    // appended batch share those centroids by construction)
    "sim_ivf_upsert_cells" -> s"""
      WITH ${QueryShared.ivfAssignCtes(2,
        fitWhere = "vec_id % 10 <> 7", assignFrom = "av")}
      SELECT vec_id, centroid_id FROM ca""",
    // stale-centroid fit (corpus only) + full-corpus assignment +
    // search, UNIONed with the post-refit (full-fit) state — the two
    // maintenance states' recall twins share the brute-force truth
    "ann_incremental_recall" -> {
      def recallSql(method: String, ivfSql: String) = s"""
      SELECT '$method' AS method,
             CAST(count(i.neighbor_id) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(i.neighbor_id) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM ($ivfSql) i
      RIGHT JOIN (
        WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
        scored AS (
          SELECT query_id, e.vec_id AS neighbor_id,
                 ${dotSql("qv", "e.nv")} AS cosine
          FROM q, n e WHERE query_id <> e.vec_id)
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored WHERE NOT isnan(cosine))
        WHERE rank <= 5) b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
      recallSql("ivf_stale_nprobe2", ivfTopKSql(k = 5, nProbe = 2,
        iters = 2, fitWhere = "vec_id % 10 <> 7", assignFrom = "av")) +
        "\n      UNION ALL\n" +
        recallSql("ivf_postrefit_nprobe2",
          ivfTopKSql(k = 5, nProbe = 2, iters = 2))
    },
    "sim_ivf_filtered_topk" -> ivfFilteredTopKSql(k = 5, nProbe = 2,
      iters = 2, predSql = "label % 4 = 1"),
    // recall of the shipped IVF config vs exact top-k: both operand
    // queries' oracles are reused as subqueries, so even the QUALITY
    // number is hash-verified
    "ann_recall_report" -> s"""
      SELECT 'ivf_nprobe2' AS method,
             CAST(count(i.neighbor_id) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(i.neighbor_id) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM (${ivfTopKSql(k = 5, nProbe = 2, iters = 2)}) i
      RIGHT JOIN (
        WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
        scored AS (
          SELECT query_id, e.vec_id AS neighbor_id,
                 ${dotSql("qv", "e.nv")} AS cosine
          FROM q, n e WHERE query_id <> e.vec_id)
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored WHERE NOT isnan(cosine))
        WHERE rank <= 5) b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id""",

    // the dedup-side recall composition: exact shingle-jaccard truth
    // set (DISTINCT hex60 shingle hashes — identical to shingleHex60's
    // per-doc set even under hash collisions) left-joined with the
    // minhash-LSH oracle's candidate pairs. NULLIF in the recall
    // divisor (here and in the ann/pq twins): an empty truth set (a
    // df-cap can leave zero 0.5-jaccard pairs) must report recall NULL
    // on both engines — Spark's integer `div` nulls on zero while
    // DuckDB's `//` raises, so without the guard the empty edge fails
    // the harness instead of reporting an empty recall row
    "lsh_recall_report" -> s"""
      SELECT 'minhash_k32_b8' AS method,
             CAST(count(l.doc_b) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(l.doc_b) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM (
        WITH $ShinglesCte,
        hsh AS (SELECT DISTINCT doc_id, ${hex60Sql("shingle")} AS h
                FROM sh),
        sizes AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY 1),
        hot AS (SELECT h FROM hsh GROUP BY h HAVING count(*) > 500),
        kept AS (SELECT doc_id, h FROM hsh
                 WHERE h NOT IN (SELECT h FROM hot)),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         count(*) AS n_inter
                  FROM kept a JOIN kept b
                    ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.5) e
      LEFT JOIN (
        WITH $ShinglesCte,
        bs AS (SELECT doc_id, ${hex60Sql("shingle")} % ${Dedup.MinhashP}
                 AS b FROM sh),
        sig AS (SELECT doc_id,
         $MinhashSigCols
         FROM bs GROUP BY doc_id),
        bands AS (SELECT doc_id, unnest([
           $MinhashBandStructs]) AS bk FROM sig),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.bk = y.bk AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b FROM (
          SELECT doc_a, doc_b,
                 ($MinhashMatchTerms) * 1.0 / 32 AS est_jaccard
          FROM cand
          JOIN sig sa ON sa.doc_id = cand.doc_a
          JOIN sig sb ON sb.doc_id = cand.doc_b)
        WHERE est_jaccard >= 0.5) l
        ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b""",

    // the composed-ANN recall twin: the ivfPqTopKSql chain replayed at
    // both shortlists, each RIGHT JOINed against the shared brute
    // truth — two hash-verified rows separating shortlist cost from
    // cell-restriction cost
    "ivfpq_recall_report" -> {
      def recallSql(method: String, shortlist: Int) = s"""
      SELECT '$method' AS method,
             CAST(count(i.neighbor_id) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(i.neighbor_id) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM (${ivfPqTopKSql(dim = 64, m = 4, ksub = 16, k = 5,
        nProbe = 2, shortlist = shortlist, iters = 2)}) i
      RIGHT JOIN (
        WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
        scored AS (
          SELECT query_id, e.vec_id AS neighbor_id,
                 ${dotSql("qv", "e.nv")} AS cosine
          FROM q, n e WHERE query_id <> e.vec_id)
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored WHERE NOT isnan(cosine))
        WHERE rank <= 5) b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
      recallSql("ivfpq_np2_sl50", 50) + "\n      UNION ALL\n" +
        recallSql("ivfpq_np2_slsat", 65536)
    },

    // same composition for the PQ configuration: both operand oracles
    // reused, so the PQ recall number is hash-verified too
    "pq_recall_report" -> s"""
      SELECT 'pq_m4_ksub16' AS method,
             CAST(count(i.neighbor_id) AS BIGINT) AS matched,
             CAST(count(*) AS BIGINT) AS total,
             CAST(count(i.neighbor_id) * 1000000 // NULLIF(count(*), 0)
               AS BIGINT) AS recall_ppm
      FROM (${pqTopKSql(dim = 64, m = 4, ksub = 16, k = 5,
        shortlist = 50, iters = 2)}) i
      RIGHT JOIN (
        WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
        scored AS (
          SELECT query_id, e.vec_id AS neighbor_id,
                 ${dotSql("qv", "e.nv")} AS cosine
          FROM q, n e WHERE query_id <> e.vec_id)
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored WHERE NOT isnan(cosine))
        WHERE rank <= 5) b
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id""",

    "mm_payload_stats" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
               CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        FROM documents""",

    // the decode is REAL (binary P6 parse over header+raster bytes);
    // the fixture raster is generated from doc_id so the oracle
    // replays every decoded statistic in closed form — a wrong parse
    // cannot hash-match. n_bytes replays the encoder's exact header
    // ("P6\n" + W + " " + H + "\n255\n" = 9 + digits(W) + digits(H))
    // plus the 3-byte-per-pixel raster.
    "mm_decode_features" -> s"""
      WITH dims AS (SELECT doc_id AS media_id,
              CAST(4 + doc_id % 13 AS BIGINT) AS width,
              CAST(3 + doc_id % 7 AS BIGINT) AS height
            FROM documents),
      sums AS (SELECT media_id, width, height,
              ${ppmChanSumSql(0)} AS sum_r,
              ${ppmChanSumSql(1)} AS sum_g,
              ${ppmChanSumSql(2)} AS sum_b
            FROM dims)
      SELECT media_id,
             CAST(width AS INTEGER) AS width,
             CAST(height AS INTEGER) AS height,
             CAST(9 + strlen(CAST(width AS VARCHAR))
                    + strlen(CAST(height AS VARCHAR))
                    + 3*width*height AS BIGINT) AS n_bytes,
             CAST(width*height AS BIGINT) AS n_pixels,
             sum_r, sum_g, sum_b,
             CAST((sum_r + sum_g + sum_b) * 1000000
                  // (width*height*3*255) AS BIGINT) AS brightness_ppm
      FROM sums""",
    // quarantine replay: the corruption fate is closed-form in the id
    // (0 mod 11 -> header survives but the raster is short; 1 and
    // 2 mod 11 -> the magic check fails), so the classification and
    // the surviving rows' generator stats replay without parsing a
    // byte — a decoder that dies, misclassifies, or half-decodes a
    // corrupt payload cannot hash-match
    "mm_decode_quarantine" -> s"""
      WITH cls AS (SELECT doc_id AS media_id,
              CAST(4 + doc_id % 13 AS BIGINT) AS width,
              CAST(3 + doc_id % 7 AS BIGINT) AS height,
              CASE WHEN doc_id % 11 = 0 THEN 'truncated_raster'
                   WHEN doc_id % 11 IN (1, 2) THEN 'bad_magic'
                   ELSE NULL END AS err_class
            FROM documents),
      oksum AS (SELECT media_id,
              ${ppmChanSumSql(0)} + ${ppmChanSumSql(1)}
                + ${ppmChanSumSql(2)} AS s
            FROM cls WHERE err_class IS NULL)
      SELECT c.media_id,
             CASE WHEN c.err_class IS NULL THEN 'ok'
                  ELSE 'quarantined' END AS status,
             c.err_class,
             CASE WHEN c.err_class IS NULL THEN c.width END AS width,
             CASE WHEN c.err_class IS NULL THEN c.height END AS height,
             CAST(o.s * 1000000 // (c.width*c.height*3*255) AS BIGINT)
               AS brightness_ppm
      FROM cls c LEFT JOIN oksum o USING (media_id)""",
    // dHash replay: 8x8 NN luma grid from the generator formula, 7
    // horizontal strict-> comparisons per row, bit y*7+x — 56 bits,
    // positive signed-64 by construction
    "mm_image_phash" -> s"""
      WITH dims AS (SELECT doc_id AS media_id,
              CAST(4 + doc_id % 13 AS BIGINT) AS width,
              CAST(3 + doc_id % 7 AS BIGINT) AS height
            FROM documents)
      SELECT media_id,
             CAST(list_sum(flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 7), x ->
                 CASE WHEN ${phashLumaSql("x+1", "y")}
                         > ${phashLumaSql("x", "y")}
                      THEN (CAST(1 AS BIGINT) << CAST(y*7 + x AS INTEGER))
                      ELSE 0 END)))) AS BIGINT) AS phash
      FROM dims""",

    // dedup replay: the dHash depends only on the raster, so it is
    // computed once per distinct SEED from the generator closed form
    // (the mm_image_phash expression with media_id := seed); payload
    // identity replays as a surrogate key — every odd doc_id's header
    // comment makes its byte stream unique, every even copy of a seed
    // shares the canonical encoding
    "mm_phash_dedup" -> s"""
      WITH m AS (SELECT doc_id, doc_id % 97 AS seed FROM documents),
      seeds AS (SELECT DISTINCT seed AS media_id,
              CAST(4 + seed % 13 AS BIGINT) AS width,
              CAST(3 + seed % 7 AS BIGINT) AS height
            FROM m),
      ph AS (SELECT media_id AS seed,
             CAST(list_sum(flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 7), x ->
                 CASE WHEN ${phashLumaSql("x+1", "y")}
                         > ${phashLumaSql("x", "y")}
                      THEN (CAST(1 AS BIGINT) << CAST(y*7 + x AS INTEGER))
                      ELSE 0 END)))) AS BIGINT) AS phash
            FROM seeds),
      pk AS (SELECT m.doc_id, m.seed,
               CASE WHEN m.doc_id % 2 = 1 THEN 'u' || m.doc_id
                    ELSE 'e' || m.seed END AS pay
             FROM m)
      SELECT ph.phash, CAST(count(*) AS BIGINT) AS n_copies,
             CAST(count(DISTINCT pay) AS BIGINT) AS n_distinct_payloads,
             min(doc_id) AS keeper_id
      FROM pk JOIN ph USING (seed) GROUP BY 1""",
    // pair replay: per-doc dHash from the generator closed form with
    // the one-byte edit folded in (channel 0 of pixel (0,0) bumped by
    // 64 mod 256 on edited docs — only grid samples reading that
    // pixel shift), grouped to DISTINCT-hash classes (r16: rep = min
    // doc_id, n = copies), then brute-force Hamming pairs over the
    // <= 2x97 classes plus one intra-class row per n >= 2 class —
    // banding at <=3 bits over 4 bands is lossless by pigeonhole, so
    // brute-over-classes == the engine's banded-class join
    "mm_phash_pairs" -> {
      def chan(c: Int, gx: String, gy: String): String = {
        val sx = s"((($gx))*width//8)"
        val sy = s"((($gy))*height//8)"
        val base = s"(seed*31 + $sx*7 + $sy*13 + ${c * 29}) % 256"
        if (c == 0)
          s"(CASE WHEN edited AND $sx = 0 AND $sy = 0 " +
            s"THEN ((seed*31) % 256 + 64) % 256 ELSE $base END)"
        else s"($base)"
      }
      def luma(gx: String, gy: String): String =
        s"(299*${chan(0, gx, gy)} + 587*${chan(1, gx, gy)}" +
          s" + 114*${chan(2, gx, gy)})"
      s"""
      WITH m AS (SELECT doc_id, doc_id % 97 AS seed,
              doc_id % 3 = 1 AS edited FROM documents),
      dims AS (SELECT doc_id, seed, edited,
              CAST(4 + seed % 13 AS BIGINT) AS width,
              CAST(3 + seed % 7 AS BIGINT) AS height
            FROM m),
      ph AS (SELECT doc_id,
             CAST(list_sum(flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 7), x ->
                 CASE WHEN ${luma("x+1", "y")} > ${luma("x", "y")}
                      THEN (CAST(1 AS BIGINT) << CAST(y*7 + x AS INTEGER))
                      ELSE 0 END)))) AS BIGINT) AS phash
            FROM dims),
      cls AS (SELECT phash, min(doc_id) AS rep, count(*) AS n
              FROM ph GROUP BY phash)
      SELECT a.rep AS doc_a, b.rep AS doc_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
             a.n AS n_a, b.n AS n_b, CAST(a.n * b.n AS BIGINT) AS n_pairs
      FROM cls a JOIN cls b ON a.rep < b.rep
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
      UNION ALL
      SELECT rep AS doc_a, rep AS doc_b, CAST(0 AS BIGINT) AS hamming,
             n AS n_a, n AS n_b, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
      FROM cls WHERE n >= 2"""
    },
    // the mm curation funnel replay: every stage is a closed-form
    // function of the seed (raster generator) plus the doc id (copy
    // structure, mixture bucket) — profile stats and the dHash from
    // the per-seed generator formulas (the mm_decode_features /
    // mm_phash_dedup forms), gates as plain predicates, the keeper as
    // min media_id per phash, and the v3 temperature-mixture CTE
    // chain (floor(sqrt) weights, anchor class, integer-ppm keep
    // rule over the salted hash bucket)
    "corpus_curation_mm" -> s"""
      WITH m AS (SELECT doc_id AS mid, doc_id % 97 AS seed, source
                 FROM documents WHERE doc_id % 3 = 0),
      dims AS (SELECT DISTINCT seed AS media_id,
              CAST(4 + seed % 13 AS BIGINT) AS width,
              CAST(3 + seed % 7 AS BIGINT) AS height
            FROM m),
      sp AS (SELECT media_id AS seed, width*height AS n_pixels,
              ${ppmChanSumSql(0)} + ${ppmChanSumSql(1)}
                + ${ppmChanSumSql(2)} AS csum,
              CAST(list_sum(flatten(list_transform(range(0, 8), y ->
                list_transform(range(0, 7), x ->
                  CASE WHEN ${phashLumaSql("x+1", "y")}
                          > ${phashLumaSql("x", "y")}
                       THEN (CAST(1 AS BIGINT) << CAST(y*7 + x AS INTEGER))
                       ELSE 0 END)))) AS BIGINT) AS phash
            FROM dims),
      prof AS (SELECT m.mid AS media_id, m.source, sp.n_pixels, sp.phash,
              CAST(sp.csum * 1000000 // (sp.n_pixels*3*255) AS BIGINT)
                AS brightness_ppm
            FROM m JOIN sp ON m.seed = sp.seed),
      s1 AS (SELECT * FROM prof WHERE n_pixels >= 24),
      s2 AS (SELECT * FROM s1
             WHERE brightness_ppm BETWEEN 300000 AND 650000),
      k3 AS (SELECT min(media_id) AS media_id FROM s2 GROUP BY phash),
      s3 AS (SELECT s2.* FROM s2 JOIN k3 USING (media_id)),
      tc AS (SELECT source AS cls, count(*) AS n FROM s3
             WHERE source IS NOT NULL GROUP BY 1),
      tw AS (SELECT cls, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
             FROM tc),
      anc AS (SELECT n AS n0, wt AS w0 FROM tw
              ORDER BY wt * 1000000 // n DESC, n, wt, cls LIMIT 1),
      kp AS (SELECT cls,
              CAST(CAST(wt AS HUGEINT) * n0 * 1000000
                   // (CAST(n AS HUGEINT) * w0) AS BIGINT) AS keep_ppm
              FROM tw CROSS JOIN anc),
      s4 AS (SELECT s3.* FROM s3 JOIN kp ON s3.source = kp.cls
             WHERE (${hex60Sql("'temp' || CAST(media_id AS VARCHAR)")}
                    % ${Sampling.Buckets}) < kp.keep_ppm)
      SELECT CAST(0 AS BIGINT) AS stage_idx, 'decode_profile' AS stage,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(COALESCE(sum(n_pixels), 0) AS BIGINT) AS n_pixels
      FROM prof
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'size_gate', CAST(count(*) AS BIGINT),
             CAST(COALESCE(sum(n_pixels), 0) AS BIGINT) FROM s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'brightness_gate',
             CAST(count(*) AS BIGINT),
             CAST(COALESCE(sum(n_pixels), 0) AS BIGINT) FROM s2
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'phash_dedup', CAST(count(*) AS BIGINT),
             CAST(COALESCE(sum(n_pixels), 0) AS BIGINT) FROM s3
      UNION ALL
      SELECT CAST(4 AS BIGINT), 'temp_mixture', CAST(count(*) AS BIGINT),
             CAST(COALESCE(sum(n_pixels), 0) AS BIGINT) FROM s4""",
    // decode after a factor-2 nearest-neighbor resize: kept pixel
    // (X, Y) is source pixel (2X, 2Y), new dims are ceil-halved, and
    // n_bytes replays the re-encoded header for the NEW dims
    "mm_resize_decode" -> s"""
      WITH dims AS (SELECT doc_id AS media_id,
              (4 + doc_id % 13 + 1) // 2 AS width,
              (3 + doc_id % 7 + 1) // 2 AS height
            FROM documents),
      sums AS (SELECT media_id, width, height,
              ${ppmResChanSumSql(0)} AS sum_r,
              ${ppmResChanSumSql(1)} AS sum_g,
              ${ppmResChanSumSql(2)} AS sum_b
            FROM dims)
      SELECT media_id,
             CAST(width AS INTEGER) AS width,
             CAST(height AS INTEGER) AS height,
             CAST(9 + strlen(CAST(width AS VARCHAR))
                    + strlen(CAST(height AS VARCHAR))
                    + 3*width*height AS BIGINT) AS n_bytes,
             CAST(width*height AS BIGINT) AS n_pixels,
             sum_r, sum_g, sum_b,
             CAST((sum_r + sum_g + sum_b) * 1000000
                  // (width*height*3*255) AS BIGINT) AS brightness_ppm
      FROM sums""",
    // every stride=2-th decoded scanline is a "frame"; the sampled
    // byte sum replays the raster formula over y in range(0,h,2)
    "mm_frame_sample" -> """
      WITH dims AS (SELECT doc_id AS media_id,
              CAST(4 + doc_id % 13 AS BIGINT) AS width,
              CAST(3 + doc_id % 7 AS BIGINT) AS height
            FROM documents)
      SELECT media_id,
             CAST(height AS BIGINT) AS n_frames,
             CAST(len(range(0, height, 2)) AS BIGINT) AS n_sampled,
             CAST(list_sum(flatten(list_transform(range(0, height, 2), y ->
                flatten(list_transform(range(0, width), x ->
                  [(media_id*31 + x*7 + y*13) % 256,
                   (media_id*31 + x*7 + y*13 + 29) % 256,
                   (media_id*31 + x*7 + y*13 + 58) % 256]))))) AS BIGINT)
               AS sampled_sum
      FROM dims""",
    // the audio decode is REAL (RIFF chunk walk + LE int16 PCM parse);
    // the fixture samples are generated from doc_id so the oracle
    // replays every statistic in closed form. n_bytes replays the
    // canonical 44-byte header+fmt+data framing plus the 12-byte
    // junk-LIST chunk every third clip carries; zero crossings are
    // strict sign products (DuckDB lists are 1-indexed: smp[i],
    // smp[i+1] for i in range(1, n) pair each sample with its
    // successor)
    "mm_audio_features" -> """
      WITH clips AS (SELECT doc_id AS media_id,
              CAST(50 + doc_id % 101 AS BIGINT) AS n
            FROM documents),
      s AS (SELECT media_id, n,
              list_transform(range(0, n),
                i -> (media_id*37 + i*17) % 4096 - 2048) AS smp
            FROM clips)
      SELECT media_id,
             n AS n_samples,
             CAST(8000 AS INTEGER) AS sample_rate,
             n * 1000 // 8000 AS duration_ms,
             CAST(44 + 2*n + CASE WHEN media_id % 3 = 0 THEN 12 ELSE 0 END
                  AS BIGINT) AS n_bytes,
             CAST(list_sum(list_transform(smp, v -> abs(v))) AS BIGINT)
               AS sum_abs,
             CAST(list_sum(list_transform(smp, v -> v*v)) AS BIGINT)
               AS sum_sq,
             CAST(list_max(list_transform(smp, v -> abs(v))) AS BIGINT)
               AS peak_abs,
             CAST(len(list_filter(range(1, n),
                  i -> smp[i] * smp[i+1] < 0)) AS BIGINT) AS n_zero_cross
      FROM s""",
    // every stride=2-th block of 25 samples is a "frame"; the sampled
    // abs-amplitude sum replays the generator over the kept blocks
    "mm_audio_frame_sample" -> """
      WITH clips AS (SELECT doc_id AS media_id,
              CAST(50 + doc_id % 101 AS BIGINT) AS n
            FROM documents)
      SELECT media_id,
             (n + 24) // 25 AS n_frames,
             CAST(len(range(0, (n + 24) // 25, 2)) AS BIGINT) AS n_sampled,
             CAST(list_sum(flatten(list_transform(range(0, (n + 24) // 25, 2),
                f -> list_transform(range(f*25, least((f+1)*25, n)),
                  i -> abs((media_id*37 + i*17) % 4096 - 2048)))))
               AS BIGINT) AS sampled_sum_abs
      FROM clips""",
    // AVI replay: geometry/frame count from the fixture formulas,
    // n_bytes from the exact container framing (12 RIFF hdr + 76 hdrl
    // LIST + 12 movi LIST hdr + per-frame 8+h*paddedRow + 12-byte
    // junk chunk every third clip = 100 + junk + nf*(8+h*rowb)),
    // channel sums over the closed-form pixel generator
    "mm_video_features" -> s"""
      WITH dims AS (SELECT doc_id AS media_id,
              8 + (doc_id % 5) * 2 AS width,
              6 + (doc_id % 4) AS height,
              3 + (doc_id % 4) AS n_frames,
              CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 0 END AS junk
            FROM documents),
      g AS (SELECT *, width*3 + (4 - (width*3) % 4) % 4 AS rowb FROM dims)
      SELECT media_id,
             CAST(width AS INTEGER) AS width,
             CAST(height AS INTEGER) AS height,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(n_frames * 40 AS BIGINT) AS duration_ms,
             CAST(100 + junk + n_frames * (8 + height * rowb) AS BIGINT)
               AS n_bytes,
             ${aviChanSumSql(0)} AS sum_r,
             ${aviChanSumSql(1)} AS sum_g,
             ${aviChanSumSql(2)} AS sum_b,
             $aviRowWeightedSql AS sum_rowweighted
      FROM g""",
    // every stride=2-th frame's total pixel sum over all channels
    "mm_video_frame_sample" -> s"""
      WITH dims AS (SELECT doc_id AS media_id,
              8 + (doc_id % 5) * 2 AS width,
              6 + (doc_id % 4) AS height,
              3 + (doc_id % 4) AS n_frames
            FROM documents)
      SELECT media_id,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(len(range(0, n_frames, 2)) AS BIGINT) AS n_sampled,
             CAST(list_sum(flatten(list_transform(range(0, n_frames, 2), f ->
                flatten(list_transform(range(0, height), y ->
                  list_transform(range(0, width), x ->
                    (${aviPixSql(0)}) + (${aviPixSql(1)})
                      + (${aviPixSql(2)}))))))) AS BIGINT) AS sampled_sum
      FROM dims""",
    // per-modality dispatch: each doc_id % 3 slice replays ITS codec's
    // closed form, harmonized into one schema
    "mm_modality_dispatch" -> s"""
      WITH img AS (SELECT doc_id AS media_id,
              CAST(4 + doc_id % 13 AS BIGINT) AS width,
              CAST(3 + doc_id % 7 AS BIGINT) AS height
            FROM documents WHERE doc_id % 3 = 0),
      imgf AS (SELECT media_id, 'image' AS modality,
              CAST(9 + strlen(CAST(width AS VARCHAR))
                     + strlen(CAST(height AS VARCHAR))
                     + 3*width*height AS BIGINT) AS n_bytes,
              CAST(width*height AS BIGINT) AS n_units,
              ${ppmChanSumSql(0)} + ${ppmChanSumSql(1)}
                + ${ppmChanSumSql(2)} AS content_sum
            FROM img),
      aud AS (SELECT doc_id AS media_id,
              CAST(50 + doc_id % 101 AS BIGINT) AS n
            FROM documents WHERE doc_id % 3 = 1),
      audf AS (SELECT media_id, 'audio' AS modality,
              CAST(44 + 2*n + CASE WHEN media_id % 3 = 0 THEN 12 ELSE 0 END
                   AS BIGINT) AS n_bytes,
              n AS n_units,
              CAST(list_sum(list_transform(range(0, n),
                i -> abs((media_id*37 + i*17) % 4096 - 2048))) AS BIGINT)
                AS content_sum
            FROM aud),
      vid AS (SELECT doc_id AS media_id,
              8 + (doc_id % 5) * 2 AS width,
              6 + (doc_id % 4) AS height,
              3 + (doc_id % 4) AS n_frames,
              CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 0 END AS junk
            FROM documents WHERE doc_id % 3 = 2),
      vidg AS (SELECT *, width*3 + (4 - (width*3) % 4) % 4 AS rowb FROM vid),
      vidf AS (SELECT media_id, 'video' AS modality,
              CAST(100 + junk + n_frames * (8 + height * rowb) AS BIGINT)
                AS n_bytes,
              CAST(n_frames * width * height AS BIGINT) AS n_units,
              ${aviChanSumSql(0)} + ${aviChanSumSql(1)}
                + ${aviChanSumSql(2)} AS content_sum
            FROM vidg)
      SELECT * FROM imgf UNION ALL SELECT * FROM audf
      UNION ALL SELECT * FROM vidf""",
    // zipped unnests replay posexplode; DuckDB's BIGINT // truncates
    // toward zero on negatives, so the oracle carries the SAME
    // positive-remainder rewrite as the Spark side — the numerator is
    // exactly divisible, making the division convention irrelevant
    "sim_mips_ivf_topk" -> mipsIvfTopKSql(k = 5, nProbe = 2, iters = 2),
    // rollup over the shared SemDeDup replay (the r CTE chain is
    // MATERIALIZED inside SemDedupSql, so the report pays the fit once)
    "emb_semdedup_cell_report" -> s"""
      SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_cell,
             CAST(sum(is_removed) AS BIGINT) AS n_removed,
             CAST(sum(is_removed) AS BIGINT) * 1000000
               // CAST(count(*) AS BIGINT) AS removal_ppm
      FROM ($SemDedupSql) GROUP BY 1""",
    // centroid = the emb_label_centroids truncated-mean integers,
    // cast to DOUBLE inside the list so the cosine promotes exactly
    // like the Spark side's cast("double") centroid vector
    "emb_outlier_report" -> s"""
      WITH ex AS (SELECT CAST(label AS BIGINT) AS label,
          unnest(range(len(embedding))) AS dim,
          unnest(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
            AS micro
        FROM embeddings),
      ag AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(micro) AS BIGINT) AS sm
        FROM ex GROUP BY 1, 2),
      cm AS (SELECT label,
          list(CAST((sm - ((sm % n) + n) % n) // n AS DOUBLE)
               ORDER BY dim) AS cvec
        FROM ag GROUP BY 1),
      ev AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      sc AS (SELECT ev.label, ev.vec_id,
          ${dotSql("ev.v", "cm.cvec")}
            / (sqrt(${dotSql("ev.v", "ev.v")})
               * sqrt(${dotSql("cm.cvec", "cm.cvec")})) AS cosine
        FROM ev JOIN cm USING (label))
      SELECT label, vec_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY label
              ORDER BY cosine ASC, vec_id) AS rank
            FROM sc WHERE NOT isnan(cosine))
      WHERE rank <= 5""",
    "emb_label_centroids" -> """
      WITH ex AS (SELECT CAST(label AS BIGINT) AS label,
          unnest(range(len(embedding))) AS dim,
          unnest(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
            AS micro
        FROM embeddings),
      ag AS (SELECT label, CAST(dim AS BIGINT) AS dim,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(micro) AS BIGINT) AS sum_micro
        FROM ex GROUP BY 1, 2)
      SELECT label, dim, n, sum_micro,
             (sum_micro - ((sum_micro % n) + n) % n) // n AS mean_micro
      FROM ag""",
  )
}
