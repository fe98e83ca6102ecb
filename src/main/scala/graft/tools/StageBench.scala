package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Staged-artifact REBUILD pricing (VERDICT r16 #6): every PairStage
  * artifact is build-once per corpus snapshot — correct for the
  * bench, but the 100 TB operator refreshes snapshots, so this tool
  * measures what a refresh BILLS: the from-scratch build wall of each
  * artifact (the session pins a FRESH artifact-store root, so every
  * call here is a genuine first-touch build — since r18 the store
  * persists across JVMs and a fresh JVM over the default root would
  * ATTACH, timing a manifest read), and next to it the INCREMENTAL
  * batch cost for the artifacts that have an append contract
  * (assign/code the 10% batch slice against the standing fit — the
  * dedup_incremental / ivf-upsert discipline), which is what a daily
  * increment actually pays instead of the rebuild.
  *
  * Build order matters and is deliberate: dependent artifacts
  * (cells -> stats, fit -> cells) are timed AFTER their inputs, so
  * each number is that artifact's OWN work.
  *
  * Usage: runMain graft.tools.StageBench [sfDir] [family]
  *
  * `family` = `all` (default) or `docs`: the docs-only mode prices
  * just the text-dedup rebuild/incremental rows, for corpora derived
  * with `DeriveCorpus ... docsOnly=true` (the sf10-scale crossover
  * measurement, VERDICT r18 #4 — no embeddings table there).
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val docsOnly = args.length > 1 && args(1) == "docs"
    val freshRoot = java.nio.file.Files
      .createTempDirectory("graft_stagebench_root").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.artifactRoot", freshRoot)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.Scratch.reclaimOnExit(freshRoot)
    import graft.ext.{Dedup, PairStage, Similarity}

    // warm the session (scheduler, codegen, parquet reader) so the
    // first timed build is not billed the JVM cold start
    graft.Tables.load(spark, dir, "documents").count()
    if (!docsOnly) graft.Tables.load(spark, dir, "embeddings").count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val rows = f match {
        case d: org.apache.spark.sql.DataFrame => d.count()
        case _ => -1L
      }
      // rows printed alongside wall: for contract comparisons (full
      // table vs delta) the OUTPUT VOLUME is the scale argument a
      // local .count() wall cannot show — a write is priced per row
      val r = if (rows >= 0) f"$rows%12d rows" else ""
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $r")
    }

    // text family
    time("shingle_sets") { PairStage.shingleSets(spark, dir) }
    time("minhash_corpus_sigs") { PairStage.minhashCorpusSigs(spark, dir, 7) }
    time("lsh_pairs") { PairStage.lshPairs(spark, dir) }
    time("jaccard_pairs") { PairStage.jaccardPairs(spark, dir) }
    time("simhash_class_pairs") { PairStage.simhashClassPairs(spark, dir) }
    time("doc_token_sets") { PairStage.docTokenSets(spark, dir, 7) }
    time("simhash_classes") { PairStage.simhashClasses(spark, dir, 7) }
    time("simhash_class_pairs_std") {
      PairStage.simhashClassPairs(spark, dir, 3, excludeMod = 7) }

    if (docsOnly) {
      docIncrements(spark, dir, (n, f) => time(n)(f()))
      spark.stop()
      return
    }

    time("bpe_trained") { PairStage.bpeTrained(spark, dir, 30)._2 }

    val (n, _) = { val t0 = System.nanoTime()
      val c = PairStage.corpusCard(spark, dir)
      println(f"[stage] corpus_card                  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      c }
    val nc = Similarity.autoCentroids(n)
    val ncStanding = Similarity.autoCentroids(
      PairStage.corpusCard(spark, dir, excludeMod = 7)._1)

    // ANN family
    time("ivf_centroids") { PairStage.ivfCentroids(spark, dir, nc, 2) }
    time("ivf_corpus_cells") { PairStage.ivfCorpusCells(spark, dir, nc, 2) }
    time("ivf_cell_stats") { PairStage.ivfCellStats(spark, dir, nc, 2) }
    time("ivf_filtered_cells") { PairStage.ivfFilteredCells(spark, dir,
      nc, 2, "label%4=1", col("label") % 4 === 1) }
    time("mips_ivf_centroids") { PairStage.mipsIvfCentroids(spark, dir, nc, 2) }
    time("mips_ivf_corpus_cells") { PairStage.mipsIvfCorpusCells(spark, dir, nc, 2) }
    time("pq_index") { PairStage.pqIndex(spark, dir, 64, 4, 16, 2)._2 }
    time("ivfpq_index") { PairStage.ivfPqIndex(spark, dir, nc, 64, 4, 16, 2)._3 }
    time("int8_index") { PairStage.int8Index(spark, dir) }
    time("ivf_centroids_standing") { PairStage.ivfCentroidsCorpus(spark,
      dir, ncStanding, 2, 7) }
    time("semantic_corpus_index") { PairStage.semanticCorpusIndex(spark,
      dir, ncStanding, 2, 7) }

    // incremental batch paths: what a 10% daily increment pays
    // INSTEAD of the rebuild (assign/code the batch against the
    // standing artifacts — the upsert contract)
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val stale = PairStage.ivfCentroidsCorpus(spark, dir, ncStanding, 2, 7)
    time("inc_ivf_batch_assign") {
      Similarity.ivfAssignWith(stale, batch, "vec_id", "embedding")
        .select("vec_id", "centroid_id") }
    time("inc_int8_batch_code") {
      Similarity.int8Coded(batch, "vec_id", "embedding",
        "neighbor_id", "cv", "cq") }
    time("inc_card_merge") {
      // the card is mergeable (n adds, max-norm maxes): the batch
      // contribution is one slice aggregation
      batch.agg(count(lit(1)), max(Similarity.dot(col("embedding"),
        col("embedding")))) }
    docIncrements(spark, dir, (n, f) => time(n)(f()))

    spark.stop()
  }

  /** The document-side incremental rows (VERDICT r17 #5 forms plus
    * the minhash batch sigs) — shared by the full run and the
    * docs-only sf10 crossover mode. */
  private def docIncrements(spark: SparkSession, dir: String,
      time: (String, () => Any) => Unit): Unit = {
    import graft.ext.{Dedup, PairStage}
    val docsBatch = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 7)
    time("inc_minhash_batch_sigs", () =>
      Dedup.minhashSignatures(docsBatch, col("doc_id"), col("text"), 3, 32))
    // the r18 incremental forms (VERDICT r17 #5): what re-verifying
    // the exact-truth pair set / the simhash class-pair table costs
    // after an append, INSTEAD of the jaccard_pairs /
    // simhash_class_pairs rebuild rows above
    time("token_df", () => PairStage.tokenDf(spark, dir, 7))
    time("doc_token_sizes", () => PairStage.docTokenSizes(spark, dir, 7))
    time("inc_jaccard_batch_pairs", () =>
      Dedup.jaccardIncrementalFrom(
        PairStage.docTokenSets(spark, dir, 7),
        Dedup.docTokens(docsBatch, col("doc_id"), col("text")),
        threshold = 0.8,
        standingDf = Some(PairStage.tokenDf(spark, dir, 7)),
        standingSizes = Some(PairStage.docTokenSizes(spark, dir, 7))))
    time("inc_simhash_class_merge", () =>
      Dedup.simhashPairsIncremental(
        PairStage.simhashClasses(spark, dir, 7),
        PairStage.simhashClassPairs(spark, dir, 3, excludeMod = 7),
        docsBatch, "doc_id", "text"))
    // the r19 delta contract: same merge, change-set output — the
    // full-table write the class-merge row above still pays (its
    // ~1.06x plateau, SCALE.md r19) is the term this one deletes
    time("inc_simhash_delta", () =>
      Dedup.simhashPairsDelta(
        PairStage.simhashClasses(spark, dir, 7),
        PairStage.simhashClassPairs(spark, dir, 3, excludeMod = 7),
        docsBatch, "doc_id", "text"))
    // identity-only change set (normalized artifact): the row count
    // here vs the full-row delta above IS the size-churn measurement
    time("inc_simhash_identity_delta", () =>
      Dedup.simhashPairsIdentityDelta(
        PairStage.simhashClasses(spark, dir, 7),
        PairStage.simhashClassPairs(spark, dir, 3, excludeMod = 7),
        docsBatch, "doc_id", "text"))
  }
}
