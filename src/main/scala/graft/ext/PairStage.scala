package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Snapshot-scoped staging for the derived-artifact family — the
  * build-once/analyze-many contract of a production dedup/ANN
  * deployment, persisted ACROSS sessions since r18.
  *
  * MinHash-LSH pair generation, Lloyd fits, inverted lists, PQ codes,
  * BPE merge tables: each is the dominant cost of every analysis that
  * consumes it (clustering, PageRank canonical ranking, recall
  * audits, retrieval). At 100 TB each is built ONCE per corpus
  * snapshot and then read by every downstream consumer — including
  * consumers in LATER sessions: pre-r18 the artifacts were keyed by
  * `applicationId` and reclaimed at JVM exit, so every new session
  * re-paid the full rebuild column of the SCALE.md pricing table
  * (VERDICT r17 #1). Staging now routes through [[ArtifactStore]]:
  * keyed by (builder version, input-table snapshot fingerprint, every
  * generator parameter), persisted under the store root with a
  * manifest, validated-on-attach. Two scales, two parameterizations,
  * or two snapshots of one path never share an artifact; a fresh
  * session attaches with ZERO Spark jobs (schemas and card scalars
  * ride the manifest).
  *
  * Every artifact here is an exact parquet round-trip (int64 ids,
  * IEEE doubles), so staged and inline computations stay
  * value-identical — the property the DuckDB oracles verify.
  */
object PairStage {

  import ArtifactStore.{read => readPart, staged, Attached}

  private def docs(dir: String) = s"$dir/documents.parquet"
  private def embs(dir: String) = s"$dir/embeddings.parquet"

  /** The staged near-dup pair table (doc_a, doc_b), building it on
    * first use per snapshot. The value is identical to
    * `Dedup.minhashLshPairs(...).select(doc_a, doc_b)` by
    * construction. */
  def lshPairs(spark: SparkSession, dir: String,
               idCol: String = "doc_id", textCol: String = "text",
               shingleN: Int = 3, k: Int = 32, bands: Int = 8,
               threshold: Double = 0.5): DataFrame = {
    val a = staged(spark, "lsh_pairs", Seq(docs(dir)),
      Seq(idCol, textCol, shingleN, k, bands, threshold)) { p =>
      Dedup.minhashLshPairs(
          graft.Tables.load(spark, dir, "documents"),
          idCol, textCol, shingleN, k, bands, threshold)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged SimHash CLASS-PAIR table — [[Dedup.simhashPairs]]'s
    * class-collapsed near-dup output (doc_a, doc_b, hamming, n_a,
    * n_b, n_pairs), built once per (snapshot, maxHamming) key and
    * read by dedup_simhash and the agreement matrix. The hot-bucket
    * guard fires at staging (the observe rides the write job) — once
    * per corpus snapshot, the production cadence. */
  def simhashClassPairs(spark: SparkSession, dir: String,
                        maxHamming: Int = 3,
                        excludeMod: Int = -1): DataFrame = {
    val a = staged(spark, "shcls", Seq(docs(dir)),
      Seq(maxHamming, excludeMod)) { p =>
      val d0 = graft.Tables.load(spark, dir, "documents")
      val d = if (excludeMod < 0) d0
        else d0.filter(col("doc_id") % 10 =!= excludeMod)
      Dedup.simhashPairs(d, "doc_id", "text", maxHamming)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged distinct-simhash CLASS TABLE (h, rep, n) of the
    * standing corpus — the other half of the simhash incremental
    * contract (VERDICT r17 #5b): appends merge into this table
    * (count bump / min-rep / mint) instead of re-hashing the corpus.
    * Same modular standing split as [[minhashCorpusSigs]]. */
  def simhashClasses(spark: SparkSession, dir: String,
                     excludeMod: Int): DataFrame = {
    val a = staged(spark, "shclstbl", Seq(docs(dir)), Seq(excludeMod)) { p =>
      Dedup.simhashClassTable(
          graft.Tables.load(spark, dir, "documents")
            .filter(col("doc_id") % 10 =!= excludeMod),
          "doc_id", "text")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged (doc_id, distinct token) table of the standing corpus
    * — the exact-truth sibling of [[minhashCorpusSigs]] (VERDICT r17
    * #5a): a deployed pipeline persists it and appends per accepted
    * batch, so the incremental exact-Jaccard re-verification
    * ([[Dedup.jaccardIncrementalFrom]]) never re-tokenizes the
    * standing corpus. */
  def docTokenSets(spark: SparkSession, dir: String,
                   excludeMod: Int = -1): DataFrame = {
    val a = staged(spark, "doctok", Seq(docs(dir)), Seq(excludeMod)) { p =>
      val d0 = graft.Tables.load(spark, dir, "documents")
      val d = if (excludeMod < 0) d0
        else d0.filter(col("doc_id") % 10 =!= excludeMod)
      Dedup.docTokens(d, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged one-row CORPUS CARD — (n, max_norm_sq) of the
    * embeddings table (optionally the `vec_id % 10 != excludeMod`
    * standing slice) — the metadata sidecar a deployed ANN index
    * persists next to its centroids (VERDICT r16 #1). Serving-path
    * consumers read the corpus size (for [[Similarity.autoCentroids]]
    * / [[Similarity.autoPlanes]]) and the MIPS augmentation bound M²
    * from this card instead of running a per-call `count()` +
    * max-norm scan; the scalars ride the artifact MANIFEST, so even a
    * FRESH session's first retrieval call triggers zero card jobs.
    * One corpus pass per (snapshot, excludeMod) key, ever. An empty
    * corpus fails loudly at build (ADVICE r17) instead of NPE-ing on
    * the NULL max. */
  def corpusCard(spark: SparkSession, dir: String,
                 excludeMod: Int = -1): (Long, Double) = {
    import org.apache.spark.sql.functions.{count, lit, max}
    val a = staged(spark, "card", Seq(embs(dir)), Seq(excludeMod),
      scalarsOf = { p =>
        val r = spark.read.parquet(p).head()
        if (r.getLong(0) == 0L || r.isNullAt(1))
          throw new IllegalStateException(
            s"corpus card over an empty embeddings slice: $dir " +
              s"(excludeMod=$excludeMod) — no vectors, no max norm")
        Map("n" -> r.getLong(0).toString,
            "max_norm_sq" -> java.lang.Double.toString(r.getDouble(1)))
      }) { p =>
      val emb0 = graft.Tables.load(spark, dir, "embeddings")
      val emb = if (excludeMod < 0) emb0
        else emb0.filter(col("vec_id") % 10 =!= excludeMod)
      emb.agg(count(lit(1)).as("n"),
          max(Similarity.dot(col("embedding"), col("embedding")))
            .as("max_norm_sq"))
        .write.mode("overwrite").parquet(p)
    }
    (a.scalars("n").toLong,
      java.lang.Double.parseDouble(a.scalars("max_norm_sq")))
  }

  /** The staged IVF coarse-quantizer index — one Lloyd fit per
    * (snapshot, nCentroids, iters) key, persisted as (centroid_id,
    * cv) parquet (an exact IEEE round-trip, so staged and inline fits
    * are value-identical), read by every consumer (top-k search,
    * k-means assignment, cluster-balanced sampling, recall reports). */
  def ivfCentroids(spark: SparkSession, dir: String, nCentroids: Int,
                   iters: Int): DataFrame = {
    val a = staged(spark, "ivf", Seq(embs(dir)), Seq(nCentroids, iters)) { p =>
      Similarity.ivfCentroids(
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged norm-augmented IVF index for MIPS retrieval — the
    * [[ivfCentroids]] contract applied after the Bachrach
    * norm-augmentation reduction ([[Similarity.normAugment]]): corpus
    * vectors gain the sqrt(M^2 - |x|^2) coordinate (M² from the
    * staged [[corpusCard]] — one corpus scan serves the fit, the
    * inverted list, and every serving call), so the fitted coarse
    * quantizer partitions the CONSTANT-NORM augmented space where
    * cosine order == inner-product order. */
  def mipsIvfCentroids(spark: SparkSession, dir: String,
                       nCentroids: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = staged(spark, "mipsivf", Seq(embs(dir)),
      Seq(nCentroids, iters)) { p =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val (_, msq) = corpusCard(spark, dir)
      Similarity.ivfCentroids(
          Similarity.normAugment(emb, "embedding", lit(msq),
            isQuery = false, "av"),
          "vec_id", "av", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged IVF INVERTED LIST — every corpus vector's cell
    * assignment (vec_id, centroid_id, v; v unit-normalized) under the
    * staged Lloyd fit: the artifact a production IVF deployment
    * persists so a retrieval call is a probe join against staged
    * cells, never a corpus re-assignment (VERDICT r16 #1). Built from
    * the SAME staged centroids its consumers probe, so list and fit
    * can never disagree. Read by [[Similarity.ivfTopKStaged]], the
    * probe-tune/recall reports, the k-means assignment consumers, and
    * [[Similarity.semDedupFrom]]. */
  def ivfCorpusCells(spark: SparkSession, dir: String, nCentroids: Int,
                     iters: Int): DataFrame = {
    val a = staged(spark, "ivfcells", Seq(embs(dir)),
      Seq(nCentroids, iters)) { p =>
      Similarity.ivfAssignWith(
          ivfCentroids(spark, dir, nCentroids, iters),
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged inverted list of the MIPS (norm-augmented) index —
    * [[ivfCorpusCells]] in the Bachrach augmented space: corpus
    * vectors gain sqrt(M² - |x|²) (M² from the staged [[corpusCard]],
    * the same scalar the augmented fit used) and are assigned with
    * the staged [[mipsIvfCentroids]]. */
  def mipsIvfCorpusCells(spark: SparkSession, dir: String,
                         nCentroids: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = staged(spark, "mipscells", Seq(embs(dir)),
      Seq(nCentroids, iters)) { p =>
      val (_, msq) = corpusCard(spark, dir)
      Similarity.ivfAssignWith(
          mipsIvfCentroids(spark, dir, nCentroids, iters),
          Similarity.normAugment(
            graft.Tables.load(spark, dir, "embeddings"),
            "embedding", lit(msq), isQuery = false, "av"),
          "vec_id", "av")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The UPSERTED inverted list — the incremental staging variant the
    * r17 rebuild pricing justifies: the STANDING corpus's cells are
    * staged once under the stale standing-only fit
    * ([[ivfCentroidsCorpus]] — the artifact a deployed index carries
    * between refits), and each call appends the current increment
    * (`vec_id % 10 == excludeMod`) assigned with the SAME stale
    * centroids at O(|batch| x nCentroids) cost — never a corpus
    * re-scan or re-fit. The union equals ALL vectors assigned with
    * the stale fit (exactly what the upserted index serves until
    * [[Similarity.ivfUpsertReport]]'s refit trigger fires), so the
    * whole artifact stays hash-verifiable. */
  def ivfCorpusCellsUpsert(spark: SparkSession, dir: String,
                           nCentroids: Int, iters: Int,
                           excludeMod: Int): DataFrame = {
    val a = staged(spark, "ivfup", Seq(embs(dir)),
      Seq(nCentroids, iters, excludeMod)) { p =>
      Similarity.ivfAssignWith(
          ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
          graft.Tables.load(spark, dir, "embeddings")
            .filter(col("vec_id") % 10 =!= excludeMod),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a).unionByName(
      Similarity.ivfAssignWith(
        ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
        graft.Tables.load(spark, dir, "embeddings")
          .filter(col("vec_id") % 10 === excludeMod),
        "vec_id", "embedding"))
  }

  /** The staged per-cell membership stats (centroid_id, n_cell) of
    * the IVF index over the full corpus — the inverted-list sizes a
    * deployed index persists next to its centroids. The filtered ANN
    * search reads the corpus size as sum(n_cell) from these nCentroids
    * rows instead of running a full-corpus count job per retrieval
    * batch (VERDICT r11 #3). Derived from the staged inverted list —
    * stats, list, and fit are one artifact family and can never
    * disagree. */
  def ivfCellStats(spark: SparkSession, dir: String, nCentroids: Int,
                   iters: Int): DataFrame = {
    val a = staged(spark, "ivfstats", Seq(embs(dir)),
      Seq(nCentroids, iters)) { p =>
      import org.apache.spark.sql.functions.{count, lit}
      ivfCorpusCells(spark, dir, nCentroids, iters)
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_cell"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged PREDICATE-SLIVER assignment for filtered ANN over a
    * standing filter attribute (vec_id, centroid_id, v): the per-value
    * inverted-list membership a deployed index persists next to its
    * centroids when retrieval routinely filters on a declared column.
    * `predTag` is the caller's stable name for `pred` and is the only
    * part of the predicate in the staging key — callers own
    * tag<->predicate consistency ACROSS SESSIONS now (a tag reused
    * for a different predicate over the same snapshot would serve the
    * first predicate's sliver). */
  def ivfFilteredCells(spark: SparkSession, dir: String, nCentroids: Int,
                       iters: Int, predTag: String,
                       pred: org.apache.spark.sql.Column): DataFrame = {
    val a = staged(spark, "ivffilt", Seq(embs(dir)),
      Seq(nCentroids, iters, predTag)) { p =>
      Similarity.ivfAssignWith(
          ivfCentroids(spark, dir, nCentroids, iters),
          graft.Tables.load(spark, dir, "embeddings").filter(pred),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged minhash SIGNATURE INDEX of the standing corpus
    * (`doc_id % 10 != excludeMod` — the modular daily-increment split
    * the incremental dedup family uses): (doc_id, mh_0..mh_{k-1}),
    * the artifact a deployed ingest-time near-dup gate persists and
    * appends per accepted batch. */
  def minhashCorpusSigs(spark: SparkSession, dir: String,
                        excludeMod: Int, shingleN: Int = 3,
                        k: Int = 32): DataFrame = {
    val a = staged(spark, "mhsig", Seq(docs(dir)),
      Seq(excludeMod, shingleN, k)) { p =>
      Dedup.minhashSignatures(
          graft.Tables.load(spark, dir, "documents")
            .filter(col("doc_id") % 10 =!= excludeMod),
          col("doc_id"), col("text"), shingleN, k)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged STALE-index fit for the incremental-ANN family: Lloyd
    * centroids fit on the STANDING corpus only (`vec_id % 10 !=
    * excludeMod`), never on the incoming batch. This is the artifact
    * a production index carries between refits; the upsert report and
    * the stale-index recall audit both read it, so the batch is
    * assigned with exactly the centroids the standing index
    * persisted. */
  def ivfCentroidsCorpus(spark: SparkSession, dir: String,
                         nCentroids: Int, iters: Int,
                         excludeMod: Int): DataFrame = {
    val a = staged(spark, "ivfc", Seq(embs(dir)),
      Seq(nCentroids, iters, excludeMod)) { p =>
      Similarity.ivfCentroids(
          graft.Tables.load(spark, dir, "embeddings")
            .filter(col("vec_id") % 10 =!= excludeMod),
          "vec_id", "embedding", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged SEMANTIC corpus index for the streaming admission
    * gate: the standing corpus (`vec_id % 10 != excludeMod`) assigned
    * with the STALE fit ([[ivfCentroidsCorpus]]) — (vec_id,
    * centroid_id, v) with v unit-normalized, the inverted-list
    * membership a deployed semantic dedup gate persists next to its
    * centroids.
    *
    * The mega-cell cap is applied HERE, at staging (ADVICE r16): a
    * standing cell above `maxCell` members would cost |cell|
    * candidates per matching arrival on EVERY trigger, so its rows
    * are dropped from the persisted artifact loudly
    * ([[Similarity.capCells]] — the observe fires once, on the
    * staging write) and the gate reads the bounded leaf directly.
    * Keyed by maxCell AND guardName (ADVICE r17): two cap
    * configurations or two guard names never share an artifact, so a
    * caller's guard name always rode its own staging write. */
  def semanticCorpusIndex(spark: SparkSession, dir: String,
                          nCentroids: Int, iters: Int,
                          excludeMod: Int,
                          maxCell: Long = Similarity.DefaultMaxCell,
                          guardName: String = "stream_semgate_mega_cell")
      : DataFrame = {
    val a = staged(spark, "semidx", Seq(embs(dir)),
      Seq(nCentroids, iters, excludeMod, maxCell, guardName)) { p =>
      Similarity.capCells(
          Similarity.ivfAssignWith(
            ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
            graft.Tables.load(spark, dir, "embeddings")
              .filter(col("vec_id") % 10 =!= excludeMod),
            "vec_id", "embedding"),
          maxCell, guardName)
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged PQ index — (codebooks, encoded corpus): the two
    * artifacts a production PQ deployment persists (re-encoding the
    * corpus per search would defeat the compression). One
    * per-subspace k-means fit + one encoding pass per (snapshot, dim,
    * m, ksub, iters) key; both parquet round-trips are exact. */
  def pqIndex(spark: SparkSession, dir: String, dim: Int, m: Int,
              ksub: Int, iters: Int): (DataFrame, DataFrame) = {
    val a = staged(spark, "pq", Seq(embs(dir)), Seq(dim, m, ksub, iters),
      parts = Seq("books", "codes")) { p =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dim, m, ksub, iters)
      books.write.mode("overwrite").parquet(s"$p/books")
      Similarity.pqEncodeWith(books, emb, "vec_id", "embedding", dim, m)
        .write.mode("overwrite").parquet(s"$p/codes")
    }
    (readPart(spark, a, "books"), readPart(spark, a, "codes"))
  }

  /** The staged IVF-PQ inverted lists — every corpus vector's PQ code
    * rows tagged with its IVF cell id (vec_id, centroid_id, j,
    * code_id): search-time cell restriction is a join on
    * `centroid_id`, never a corpus re-assignment. Built FROM the
    * staged IVF centroids and the staged PQ index (same keys its
    * consumers search with), so the composed index can never disagree
    * with either component's fit. */
  def ivfPqIndex(spark: SparkSession, dir: String, nCentroids: Int,
                 dim: Int, m: Int, ksub: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = ivfCentroids(spark, dir, nCentroids, iters)
    val (books, codes) = pqIndex(spark, dir, dim, m, ksub, iters)
    val a = staged(spark, "ivfpq", Seq(embs(dir)),
      Seq(nCentroids, dim, m, ksub, iters)) { p =>
      val assigned = Similarity.ivfAssignWith(cents,
          graft.Tables.load(spark, dir, "embeddings"), "vec_id",
          "embedding")
        .select(col("vec_id").cast("long").as("vec_id"),
          col("centroid_id"))
      codes.join(assigned, Seq("vec_id"))
        .select(col("vec_id"), col("centroid_id"), col("j"),
          col("code_id"))
        .write.mode("overwrite").parquet(p)
    }
    (cents, books, readPart(spark, a))
  }

  /** The staged int8 index: the normalized + symmetric-int8-coded
    * corpus frame (id, unit vector, codes) a deployed int8 scan
    * persists — quantizing per query batch would defeat the 4x
    * bandwidth saving. */
  def int8Index(spark: SparkSession, dir: String): DataFrame = {
    val a = staged(spark, "int8", Seq(embs(dir)), Seq.empty) { p =>
      Similarity.int8Coded(
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding", "neighbor_id", "cv", "cq")
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged trained-BPE artifacts — (mergeTable, state): the
    * train-once/tokenize-many contract. The trainer's driver loop
    * runs ONCE per (snapshot, rounds) key; the merge table (metadata-
    * sized) and the post-merge vocabulary state (word, wn, syms) land
    * as parquet, and every consumer reads the artifacts. */
  def bpeTrained(spark: SparkSession, dir: String,
                 rounds: Int): (DataFrame, DataFrame) = {
    val a = staged(spark, "bpe", Seq(docs(dir)), Seq(rounds),
      parts = Seq("merges", "state")) { p =>
      val (merges, state) = Corpus.bpeTrain(
        graft.Tables.load(spark, dir, "documents"),
        col("text"), rounds)
      merges.write.mode("overwrite").parquet(s"$p/merges")
      state.write.mode("overwrite").parquet(s"$p/state")
    }
    (readPart(spark, a, "merges"), readPart(spark, a, "state"))
  }

  /** The staged DISTINCT (doc_id, word-n-shingle) occurrence frame of
    * the RAW documents corpus — the base artifact of the
    * novelty/Heaps vocabulary-growth family. The explode + distinct
    * is the dominant cost of every consumer (two shuffles of a
    * corpus x shingles frame); computed once per corpus snapshot and
    * read by each growth report. */
  def shingleSets(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val a = staged(spark, "shingle_sets", Seq(docs(dir)), Seq(n)) { p =>
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          org.apache.spark.sql.functions.explode(
            TextOps.wordShingles(col("text"), n)).as("shingle"))
        .distinct()
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged (token, df_count) document-frequency table of the
    * standing corpus — derived from [[docTokenSets]], so table and
    * token sets can never disagree. A deployed pipeline maintains
    * this per append (df counts are mergeable); the incremental
    * exact-Jaccard path merges the batch's counts in instead of
    * re-aggregating the corpus token table. */
  def tokenDf(spark: SparkSession, dir: String,
              excludeMod: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    val a = staged(spark, "tokdf", Seq(docs(dir)), Seq(excludeMod)) { p =>
      docTokenSets(spark, dir, excludeMod)
        .groupBy(col("token")).agg(count(lit(1)).as("df_count"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged (doc_id, n_tokens) size table of the standing corpus
    * — the pre-cap Jaccard denominators, derived from
    * [[docTokenSets]]. Append-safe (one row per doc, forever). */
  def docTokenSizes(spark: SparkSession, dir: String,
                    excludeMod: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    val a = staged(spark, "toksz", Seq(docs(dir)), Seq(excludeMod)) { p =>
      docTokenSets(spark, dir, excludeMod)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }

  /** The staged exact n-gram-jaccard pair table over the RAW documents
    * corpus — shared by the clustering consumers (components +
    * representative selection) and the recall reports' exact-truth
    * side. Callers over FILTERED inputs (the curation chain) keep
    * computing live, their input is not the staged corpus. */
  def jaccardPairs(spark: SparkSession, dir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   threshold: Double = 0.8): DataFrame = {
    val a = staged(spark, "jacc_pairs", Seq(docs(dir)),
      Seq(idCol, textCol, threshold)) { p =>
      Dedup.jaccardPairs(
          graft.Tables.load(spark, dir, "documents"),
          idCol, textCol, threshold)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(p)
    }
    readPart(spark, a)
  }
}
