package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Session-scoped staging for the near-duplicate PAIR TABLE — the
  * build-once/analyze-many contract of a production dedup graph.
  *
  * MinHash-LSH pair generation is the dominant cost of every analysis
  * that runs over the near-dup graph (clustering, PageRank canonical
  * ranking, triangle census, recall audits): at 100 TB the pair table
  * is built ONCE per corpus snapshot and then read by every downstream
  * consumer, exactly like the bucketed layouts
  * [[graft.ops.Bucketing.colocatedJoin]] stages. Re-deriving it inside
  * each consumer triple-pays the shingle/signature/banding work — the
  * round-9 bench paid ~60% of the PageRank wall in redundant pair-gen.
  *
  * First call for a given (corpus dir, LSH parameter) key computes
  * [[Dedup.minhashLshPairs]] and persists the (doc_a, doc_b) edge list
  * as parquet under the session scratch root; every later call —
  * including from a DIFFERENT registered query in the same session —
  * returns a scan of that artifact. Keyed by Spark application id +
  * corpus dir + every LSH parameter, so two scales (spec fixtures vs
  * the bench corpus) or two parameterizations never share an artifact;
  * input tables under a dir are immutable for a session's lifetime by
  * the testdata contract. Scratch is reclaimed at JVM exit through the
  * shared [[Scratch]] hook.
  */
object PairStage {

  private val staged = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.CompletableFuture[String]]

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString


  // Staged artifacts are written once per key and immutable after —
  // memoize their schemas so repeated serving-path reads trigger no
  // schema-inference job (same contract as graft.Tables.load).
  private val schemas = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]

  private def readStaged(spark: SparkSession, path: String)
      : DataFrame = {
    val sch = schemas.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** Resolve (building at most once) the scratch path for `key`.
    * The directory name embeds an md5 of the FULL key: a 32-bit
    * `hashCode` suffix (pre-r11) lets two distinct (dir, params) keys
    * collide at birthday scale, silently overwriting one artifact
    * while both map entries point at it — consumers of the first key
    * would read the second key's rows with no error. Builds are
    * serialized per key through a lazily-completed future installed
    * with `putIfAbsent` (exactly one caller runs `build`; concurrent
    * first-touch callers block on the future instead of racing two
    * overwrite writes onto one path); a failed build is evicted so a
    * later call can retry rather than joining a poisoned future. */
  private def stagedPath(spark: SparkSession, tag: String, key: String)
                        (build: String => Unit): String = {
    val fresh = new java.util.concurrent.CompletableFuture[String]
    staged.putIfAbsent(key, fresh) match {
      case Some(existing) => existing.join()
      case None =>
        try {
          val p = s"${sys.props("java.io.tmpdir")}/graft_${tag}_" +
            s"${spark.sparkContext.applicationId}_${md5hex(key)}"
          Scratch.reclaimOnExitHadoop(p, spark.sessionState.newHadoopConf())
          build(p)
          fresh.complete(p)
          p
        } catch { case e: Throwable =>
          staged.remove(key, fresh)
          fresh.completeExceptionally(e)
          throw e
        }
    }
  }

  /** The staged near-dup pair table (doc_a, doc_b), building it on
    * first use. Thread-safe per key; the value is identical to
    * `Dedup.minhashLshPairs(...).select(doc_a, doc_b)` by
    * construction (a parquet round-trip of two int64 columns). */
  def lshPairs(spark: SparkSession, dir: String,
               idCol: String = "doc_id", textCol: String = "text",
               shingleN: Int = 3, k: Int = 32, bands: Int = 8,
               threshold: Double = 0.5): DataFrame = {
    val key = Seq(spark.sparkContext.applicationId, dir, idCol, textCol,
      shingleN, k, bands, threshold).mkString("|")
    val path = stagedPath(spark, "lsh_pairs", key) { p =>
      Dedup.minhashLshPairs(
          graft.Tables.load(spark, dir, "documents"),
          idCol, textCol, shingleN, k, bands, threshold)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged SimHash CLASS-PAIR table — [[Dedup.simhashPairs]]'s
    * class-collapsed near-dup output (doc_a, doc_b, hamming, n_a,
    * n_b, n_pairs), built once per (corpus dir, maxHamming) key and
    * read by dedup_simhash and the agreement matrix. The hot-bucket
    * guard fires at staging (the observe rides the write job), same
    * contract as [[semanticCorpusIndex]]. */
  def simhashClassPairs(spark: SparkSession, dir: String,
                        maxHamming: Int = 3): DataFrame = {
    val key = Seq("shcls", spark.sparkContext.applicationId, dir,
      maxHamming).mkString("|")
    val path = stagedPath(spark, "shcls", key) { p =>
      Dedup.simhashPairs(
          graft.Tables.load(spark, dir, "documents"),
          "doc_id", "text", maxHamming)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  private val cards = scala.collection.concurrent.TrieMap
    .empty[String, (Long, Double)]

  /** The staged one-row CORPUS CARD — (n, max_norm_sq) of the
    * embeddings table (optionally the `vec_id % 10 != excludeMod`
    * standing slice) — the metadata sidecar a deployed ANN index
    * persists next to its centroids (VERDICT r16 #1). Serving-path
    * consumers read the corpus size (for [[Similarity.autoCentroids]]
    * / [[Similarity.autoPlanes]]) and the MIPS augmentation bound M²
    * from this card instead of running a per-call `count()` +
    * max-norm scan over the corpus; the scalars are additionally
    * memo-cached per key, so a retrieval call after first touch
    * triggers ZERO driver jobs at construction. One corpus pass per
    * (dir, excludeMod) key, ever. */
  def corpusCard(spark: SparkSession, dir: String,
                 excludeMod: Int = -1): (Long, Double) = {
    import org.apache.spark.sql.functions.{count, lit, max}
    val key = Seq("card", spark.sparkContext.applicationId, dir,
      excludeMod).mkString("|")
    cards.getOrElseUpdate(key, {
      val path = stagedPath(spark, "card", key) { p =>
        val emb0 = graft.Tables.load(spark, dir, "embeddings")
        val emb = if (excludeMod < 0) emb0
          else emb0.filter(col("vec_id") % 10 =!= excludeMod)
        emb.agg(count(lit(1)).as("n"),
            max(Similarity.dot(col("embedding"), col("embedding")))
              .as("max_norm_sq"))
          .write.mode("overwrite").parquet(p)
      }
      val r = readStaged(spark, path).head()
      (r.getLong(0), r.getDouble(1))
    })
  }

  /** The staged IVF coarse-quantizer index — the build-once/search-
    * many contract for the ANN family: one Lloyd fit per (corpus dir,
    * nCentroids, iters) key, persisted as (centroid_id, cv) parquet
    * (nCentroids x dim doubles — an exact IEEE round-trip, so staged
    * and inline fits are value-identical), read by every consumer
    * (top-k search, k-means assignment, cluster-balanced sampling,
    * the recall report). */
  def ivfCentroids(spark: SparkSession, dir: String, nCentroids: Int,
                   iters: Int): DataFrame = {
    val key = Seq("ivf", spark.sparkContext.applicationId, dir,
      nCentroids, iters).mkString("|")
    val path = stagedPath(spark, "ivf", key) { p =>
      Similarity.ivfCentroids(
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged norm-augmented IVF index for MIPS retrieval — the
    * [[ivfCentroids]] contract applied after the Bachrach
    * norm-augmentation reduction ([[Similarity.normAugment]]): corpus
    * vectors gain the sqrt(M^2 - |x|^2) coordinate (M = max corpus
    * norm, computed here once), so the fitted coarse quantizer
    * partitions the CONSTANT-NORM augmented space where cosine order
    * == inner-product order. Persisted as (centroid_id, cv) with
    * 65-dim unit centroids; an exact IEEE round-trip like the cosine
    * index. */
  def mipsIvfCentroids(spark: SparkSession, dir: String,
                       nCentroids: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val key = Seq("mipsivf", spark.sparkContext.applicationId, dir,
      nCentroids, iters).mkString("|")
    val path = stagedPath(spark, "mipsivf", key) { p =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      // M² comes from the staged corpus card (same agg expression) —
      // one corpus scan serves the fit, the inverted list, and every
      // serving call
      val (_, msq) = corpusCard(spark, dir)
      Similarity.ivfCentroids(
          Similarity.normAugment(emb, "embedding", lit(msq),
            isQuery = false, "av"),
          "vec_id", "av", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged IVF INVERTED LIST — every corpus vector's cell
    * assignment (vec_id, centroid_id, v; v unit-normalized) under the
    * staged Lloyd fit: the artifact a production IVF deployment
    * persists so a retrieval call is a probe join against staged
    * cells, never a corpus re-assignment (VERDICT r16 #1 — the
    * serving path's last per-call full-corpus job). Built from the
    * SAME staged centroids its consumers probe, so list and fit can
    * never disagree; exact parquet round-trip (int64 ids +
    * IEEE-double unit vectors), so staged and inline search are
    * value-identical. Read by [[Similarity.ivfTopKStaged]], the
    * probe-tune/recall reports, the k-means assignment consumers,
    * and [[Similarity.semDedupFrom]]. */
  def ivfCorpusCells(spark: SparkSession, dir: String, nCentroids: Int,
                     iters: Int): DataFrame = {
    val key = Seq("ivfcells", spark.sparkContext.applicationId, dir,
      nCentroids, iters).mkString("|")
    val path = stagedPath(spark, "ivfcells", key) { p =>
      Similarity.ivfAssignWith(
          ivfCentroids(spark, dir, nCentroids, iters),
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged inverted list of the MIPS (norm-augmented) index —
    * [[ivfCorpusCells]] in the Bachrach augmented space: corpus
    * vectors gain sqrt(M² - |x|²) (M² from the staged [[corpusCard]],
    * the same scalar the augmented fit used) and are assigned with
    * the staged [[mipsIvfCentroids]]. The MIPS serving path probes
    * these cells; pre-r17 it re-augmented and re-assigned the corpus
    * per retrieval call AND re-scanned for M². */
  def mipsIvfCorpusCells(spark: SparkSession, dir: String,
                         nCentroids: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val key = Seq("mipscells", spark.sparkContext.applicationId, dir,
      nCentroids, iters).mkString("|")
    val path = stagedPath(spark, "mipscells", key) { p =>
      val (_, msq) = corpusCard(spark, dir)
      Similarity.ivfAssignWith(
          mipsIvfCentroids(spark, dir, nCentroids, iters),
          Similarity.normAugment(
            graft.Tables.load(spark, dir, "embeddings"),
            "embedding", lit(msq), isQuery = false, "av"),
          "vec_id", "av")
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The UPSERTED inverted list — the incremental staging variant the
    * r17 rebuild pricing justifies (SCALE.md: at sf1 the batch assign
    * costs 0.67 s vs the 8.3 s fit+assign rebuild): the STANDING
    * corpus's cells are staged once under the stale standing-only fit
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
    val key = Seq("ivfup", spark.sparkContext.applicationId, dir,
      nCentroids, iters, excludeMod).mkString("|")
    val path = stagedPath(spark, "ivfup", key) { p =>
      Similarity.ivfAssignWith(
          ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
          graft.Tables.load(spark, dir, "embeddings")
            .filter(col("vec_id") % 10 =!= excludeMod),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path).unionByName(
      Similarity.ivfAssignWith(
        ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
        graft.Tables.load(spark, dir, "embeddings")
          .filter(col("vec_id") % 10 === excludeMod),
        "vec_id", "embedding"))
  }

  /** The staged per-cell membership stats (centroid_id, n_cell) of
    * the IVF index over the full corpus — the inverted-list sizes a
    * deployed index persists next to its centroids. The filtered ANN
    * search reads the corpus size as sum(n_cell) from these
    * nCentroids rows instead of running a full-corpus count job per
    * retrieval batch (VERDICT r11 #3). Derived from the staged
    * inverted list ([[ivfCorpusCells]]) with one cell-keyed count —
    * stats, list, and fit are one artifact family and can never
    * disagree. */
  def ivfCellStats(spark: SparkSession, dir: String, nCentroids: Int,
                   iters: Int): DataFrame = {
    val key = Seq("ivfstats", spark.sparkContext.applicationId, dir,
      nCentroids, iters).mkString("|")
    val path = stagedPath(spark, "ivfstats", key) { p =>
      import org.apache.spark.sql.functions.{count, lit}
      ivfCorpusCells(spark, dir, nCentroids, iters)
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_cell"))
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged PREDICATE-SLIVER assignment for filtered ANN over a
    * standing filter attribute (vec_id, centroid_id, v): the per-value
    * inverted-list membership a deployed index persists next to its
    * centroids when retrieval routinely filters on a declared column
    * (language, license, source). Built from the SAME staged centroids
    * its consumers probe, so sliver and index can never disagree on
    * the fit; the round-trip is exact (int64 ids + IEEE-double unit
    * vectors). `predTag` is the caller's stable name for `pred` and is
    * the only part of the predicate in the staging key — callers own
    * tag<->predicate consistency (a tag reused for a different
    * predicate would serve the first predicate's sliver).
    *
    * This is what turns [[Similarity.ivfFilteredTopKStaged]]'s
    * per-batch cost into stats-read + probe-join: the r12 ad-hoc path
    * re-assigned (and persisted — a per-call cache leak, ADVICE r12)
    * the sliver on every retrieval batch, which the r12 bench priced
    * at +0.49s per call at sf0.1 on top of the staged-stats read. */
  def ivfFilteredCells(spark: SparkSession, dir: String, nCentroids: Int,
                       iters: Int, predTag: String,
                       pred: org.apache.spark.sql.Column): DataFrame = {
    val key = Seq("ivffilt", spark.sparkContext.applicationId, dir,
      nCentroids, iters, predTag).mkString("|")
    val path = stagedPath(spark, "ivffilt", key) { p =>
      Similarity.ivfAssignWith(
          ivfCentroids(spark, dir, nCentroids, iters),
          graft.Tables.load(spark, dir, "embeddings").filter(pred),
          "vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged minhash SIGNATURE INDEX of the standing corpus
    * (`doc_id % 10 != excludeMod` — the modular daily-increment split
    * the incremental dedup family uses): (doc_id, mh_0..mh_{k-1}),
    * the artifact a deployed ingest-time near-dup gate persists and
    * appends per accepted batch. The gate's stream side joins its
    * bands against this index every micro-batch; rebuilding corpus
    * signatures per batch would re-pay the corpus-wide shingle/
    * signature work the index exists to amortize. Exact parquet
    * round-trip (int64 columns). */
  def minhashCorpusSigs(spark: SparkSession, dir: String,
                        excludeMod: Int, shingleN: Int = 3,
                        k: Int = 32): DataFrame = {
    val key = Seq("mhsig", spark.sparkContext.applicationId, dir,
      excludeMod, shingleN, k).mkString("|")
    val path = stagedPath(spark, "mhsig", key) { p =>
      Dedup.minhashSignatures(
          graft.Tables.load(spark, dir, "documents")
            .filter(col("doc_id") % 10 =!= excludeMod),
          col("doc_id"), col("text"), shingleN, k)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged STALE-index fit for the incremental-ANN family: Lloyd
    * centroids fit on the STANDING corpus only (`vec_id % 10 !=
    * excludeMod` — the same modular split [[Dedup.minhashLshIncremental]]'s
    * registry entry uses for its daily-increment replay), never on the
    * incoming batch. This is the artifact a production index carries
    * between refits; the upsert report and the stale-index recall
    * audit both read it, so the batch is assigned with exactly the
    * centroids the standing index persisted. */
  def ivfCentroidsCorpus(spark: SparkSession, dir: String,
                         nCentroids: Int, iters: Int,
                         excludeMod: Int): DataFrame = {
    val key = Seq("ivfc", spark.sparkContext.applicationId, dir,
      nCentroids, iters, excludeMod).mkString("|")
    val path = stagedPath(spark, "ivfc", key) { p =>
      Similarity.ivfCentroids(
          graft.Tables.load(spark, dir, "embeddings")
            .filter(col("vec_id") % 10 =!= excludeMod),
          "vec_id", "embedding", nCentroids, iters)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged SEMANTIC corpus index for the streaming admission
    * gate: the standing corpus (`vec_id % 10 != excludeMod`) assigned
    * with the STALE fit ([[ivfCentroidsCorpus]]) — (vec_id,
    * centroid_id, v) with v unit-normalized, the inverted-list
    * membership a deployed semantic dedup gate persists next to its
    * centroids. The gate's stream side probes cells every
    * micro-batch; re-assigning the corpus per batch would re-pay the
    * corpus-wide normalize/argmax work the index amortizes. Exact
    * parquet round-trip (int64 ids + IEEE-double unit vectors).
    *
    * The mega-cell cap is applied HERE, at staging (ADVICE r16): a
    * standing cell above `maxCell` members would cost |cell|
    * candidates per matching arrival on EVERY trigger, so its rows
    * are dropped from the persisted artifact loudly
    * ([[Similarity.capCells]] — the observe metric fires once, on
    * the staging write) and the gate reads the bounded leaf
    * directly. Keyed by maxCell so two cap configurations never
    * share an artifact. */
  def semanticCorpusIndex(spark: SparkSession, dir: String,
                          nCentroids: Int, iters: Int,
                          excludeMod: Int, maxCell: Long = 4096L,
                          guardName: String = "stream_semgate_mega_cell")
      : DataFrame = {
    val key = Seq("semidx", spark.sparkContext.applicationId, dir,
      nCentroids, iters, excludeMod, maxCell).mkString("|")
    val path = stagedPath(spark, "semidx", key) { p =>
      Similarity.capCells(
          Similarity.ivfAssignWith(
            ivfCentroidsCorpus(spark, dir, nCentroids, iters, excludeMod),
            graft.Tables.load(spark, dir, "embeddings")
              .filter(col("vec_id") % 10 =!= excludeMod),
            "vec_id", "embedding"),
          maxCell, guardName)
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged PQ index — (codebooks, encoded corpus): the two
    * artifacts a production PQ deployment persists (re-encoding the
    * corpus per search would defeat the compression). One per-subspace
    * k-means fit + one encoding pass per (corpus dir, dim, m, ksub,
    * iters) key; both parquet round-trips are exact (double arrays /
    * int codes). */
  def pqIndex(spark: SparkSession, dir: String, dim: Int, m: Int,
              ksub: Int, iters: Int): (DataFrame, DataFrame) = {
    val key = Seq("pq", spark.sparkContext.applicationId, dir, dim, m,
      ksub, iters).mkString("|")
    val path = stagedPath(spark, "pq", key) { p =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dim, m, ksub, iters)
      books.write.mode("overwrite").parquet(s"$p/books")
      Similarity.pqEncodeWith(books, emb, "vec_id", "embedding", dim, m)
        .write.mode("overwrite").parquet(s"$p/codes")
    }
    (readStaged(spark, s"$path/books"), readStaged(spark, s"$path/codes"))
  }

  /** The staged IVF-PQ inverted lists — every corpus vector's PQ code
    * rows tagged with its IVF cell id (vec_id, centroid_id, j,
    * code_id): the artifact a production IVF-PQ deployment persists so
    * search-time cell restriction is a join on `centroid_id`, never a
    * corpus re-assignment. Built FROM the staged IVF centroids and the
    * staged PQ index (same keys its consumers search with), so the
    * composed index can never disagree with either component's fit.
    * Exact parquet round-trip (int64 columns only). */
  def ivfPqIndex(spark: SparkSession, dir: String, nCentroids: Int,
                 dim: Int, m: Int, ksub: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val key = Seq("ivfpq", spark.sparkContext.applicationId, dir,
      nCentroids, dim, m, ksub, iters).mkString("|")
    val cents = ivfCentroids(spark, dir, nCentroids, iters)
    val (books, codes) = pqIndex(spark, dir, dim, m, ksub, iters)
    val path = stagedPath(spark, "ivfpq", key) { p =>
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
    (cents, books, readStaged(spark, path))
  }

  /** The staged int8 index: the normalized + symmetric-int8-coded
    * corpus frame (id, unit vector, codes) a deployed int8 scan
    * persists — quantizing per query batch would defeat the 4x
    * bandwidth saving. Exact parquet round-trip (doubles + longs). */
  def int8Index(spark: SparkSession, dir: String): DataFrame = {
    val key = Seq("int8", spark.sparkContext.applicationId, dir)
      .mkString("|")
    val path = stagedPath(spark, "int8", key) { p =>
      Similarity.int8Coded(
          graft.Tables.load(spark, dir, "embeddings"),
          "vec_id", "embedding", "neighbor_id", "cv", "cq")
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged trained-BPE artifacts — (mergeTable, state): the
    * train-once/tokenize-many contract. The trainer's driver loop runs
    * ONCE per (corpus dir, rounds) key; the merge table (metadata-
    * sized) and the post-merge vocabulary state (word, wn, syms) land
    * as parquet, and every consumer — merge-table audit, symbol
    * inventory, the corpus tokenization pass — reads the artifacts. */
  def bpeTrained(spark: SparkSession, dir: String,
                 rounds: Int): (DataFrame, DataFrame) = {
    val key = Seq("bpe", spark.sparkContext.applicationId, dir, rounds)
      .mkString("|")
    val path = stagedPath(spark, "bpe", key) { p =>
      val (merges, state) = Corpus.bpeTrain(
        graft.Tables.load(spark, dir, "documents"),
        col("text"), rounds)
      merges.write.mode("overwrite").parquet(s"$p/merges")
      state.write.mode("overwrite").parquet(s"$p/state")
    }
    (readStaged(spark, s"$path/merges"), readStaged(spark, s"$path/state"))
  }

  /** The staged DISTINCT (doc_id, word-n-shingle) occurrence frame of
    * the RAW documents corpus — the base artifact of the
    * novelty/Heaps vocabulary-growth family. The explode + distinct
    * is the dominant cost of every consumer (two shuffles of a
    * corpus x shingles frame); at 100 TB it is computed once per
    * corpus snapshot and read by each growth report, exactly like the
    * pair tables above. Same build-once contract and keying as
    * [[lshPairs]]. */
  def shingleSets(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val key = Seq("shset", spark.sparkContext.applicationId, dir, n)
      .mkString("|")
    val path = stagedPath(spark, "shingle_sets", key) { p =>
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          org.apache.spark.sql.functions.explode(
            TextOps.wordShingles(col("text"), n)).as("shingle"))
        .distinct()
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }

  /** The staged exact n-gram-jaccard pair table over the RAW documents
    * corpus — shared by the clustering consumers (components +
    * representative selection). Same build-once contract and keying as
    * [[lshPairs]]; callers over FILTERED inputs (the curation chain)
    * keep computing live, their input is not the staged corpus. */
  def jaccardPairs(spark: SparkSession, dir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   threshold: Double = 0.8): DataFrame = {
    val key = Seq("jacc", spark.sparkContext.applicationId, dir, idCol,
      textCol, threshold).mkString("|")
    val path = stagedPath(spark, "jacc_pairs", key) { p =>
      Dedup.jaccardPairs(
          graft.Tables.load(spark, dir, "documents"),
          idCol, textCol, threshold)
        .select(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").parquet(p)
    }
    readStaged(spark, path)
  }
}
