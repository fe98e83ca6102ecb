package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{AsOfJoin, Audio, Corpus, Dedup, Graph, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, TextOps, Video, Windows}

/** The LLM-data-pipeline extension surface: dedup, similarity search,
  * text analysis, multimodal plumbing, event-time windowing. Oracle SQL
  * is provided wherever DuckDB can express the operator with provably
  * identical arithmetic (probed: in-order float folds, `md5`, and
  * integer hex parsing are bit-identical across engines). The hash-
  * based candidate generators (minhash banding, simhash, hyperplane
  * LSH) use engine-portable md5-derived hashes precisely so their
  * full output is oracle-checkable — only the internal bucket keys
  * stay engine-specific (bucket-key equality is tuple equality either
  * way).
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def reclaimOnExit(path: String): Unit =
    graft.ext.Scratch.reclaimOnExit(path)

  /** Merge rounds for the registered BPE-trainer queries: enough that
    * later rounds merge MERGED symbols (the part round-0 pair counts
    * cannot see), small enough that the unrolled-CTE oracle stays
    * readable. */
  private val BpeRounds = 8

  // ---- curation v2: the composed flagship's stage chain ----
  // Exposed as (name, stage-transform) pairs so the SAME chain serves
  // two consumers: the registered query folds the stages into one
  // fused plan (what the oracle hash-checks), and the bench stage
  // probe materializes between stages to attribute wall time — the
  // salesStageSeconds pattern for the LLM side.

  /** Stage-0 input of the v2 curation chain. */
  private[graft] def curationV2Docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))

  /** The v2 chain: C4 filter -> exact dedup -> near-dup
    * keep-representative -> benchmark decontamination -> per-source
    * token-budget selection. Every stage is an already-verified
    * operator; this registers their composition. */
  private[graft] def curationV2Stages(s: SparkSession, dir: String)
      : Seq[(String, DataFrame => DataFrame)] = Seq(
    "c4_filter" -> ((in: DataFrame) => in.join(
      Corpus.c4QualityFlags(in, col("doc_id"), col("text"))
        .filter(col("keep")).select("doc_id"), Seq("doc_id"))),
    "exact_dedup" -> ((in: DataFrame) => in.join(
      in.groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id"),
      Seq("doc_id"))),
    "neardup_reps" -> ((in: DataFrame) => {
      val pairs = Dedup.jaccardPairs(in, "doc_id", "text", threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val reps = Dedup.connectedComponents(in.select(col("doc_id")), pairs)
        .filter(col("doc_id") === col("component")).select("doc_id")
      in.join(reps, Seq("doc_id"))
    }),
    "decontam" -> ((in: DataFrame) => {
      // held-out set: every 20th doc of the RAW corpus — the curated
      // train split must not share 13-gram shingles with it
      val train = in.filter(col("doc_id") % 20 =!= 0)
      val test = curationV2Docs(s, dir).filter(col("doc_id") % 20 === 0)
      val bad = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
          shingleN = 13)
        .filter(col("n_shared_shingles") >= 5)
        .select(col("train_id").as("doc_id")).distinct()
      train.join(bad, Seq("doc_id"), "left_anti")
    }),
    "budget_select" -> ((in: DataFrame) => {
      val scored = TextOps.withQualityScore(
        in.select(col("doc_id"), col("source"), col("text")), col("text"))
        .filter(!isnan(col("quality_score")))
      Corpus.tokenBudgetSelect(scored, col("source"),
          Seq(col("quality_score").desc, col("doc_id")),
          col("n_tokens"), budget = 500L)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"))
    }))

  /** Per-stage wall seconds for the v2 curation chain: each stage runs
    * against the MATERIALIZED previous output, so a stage's number is
    * its own work, not a recompute of everything before it. */
  def curationV2StageSeconds(s: SparkSession, dir: String)
      : Seq[(String, Double)] = {
    var cur = curationV2Docs(s, dir)
    curationV2Stages(s, dir).map { case (name, f) =>
      val t0 = System.nanoTime()
      cur = graft.ext.Materialize.eager(f(cur))
      name -> (System.nanoTime() - t0) / 1e9
    }
  }

  // ---- shared SQL fragments ----

  /** DuckDB in-order dot product over 64-dim double lists (probed
    * bit-identical to Spark's strict left-fold). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> $a[i]*$b[i]))"
  /** Unit-normalized double vector (norm = sqrt of in-order self-dot,
    * matching Similarity.withNormalized exactly). */
  private val NormSql =
    """list_transform(embedding, x -> CAST(x AS DOUBLE)
      | / sqrt(list_sum(list_transform(embedding,
      |     y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))))""".stripMargin

  /** Engine-portable stable sum (see Windows.stableSum). */
  private def stableSumSql(c: String): String =
    s"(SUM(CAST(FLOOR($c*1000000) AS BIGINT)) / 1000000.0)"

  /** ppm-quantized squared distance from the scanned `embedding` to a
    * center (in-order fold of double diffs — the dist twin of
    * [[dotSql]], matching Sampling.kCenterCoreset's DotProduct(diff,
    * diff) shape exactly). */
  private def kcDistPpmSql(centerCol: String): String = {
    val d = s"(CAST(embedding[i] AS DOUBLE) - CAST($centerCol[i] AS DOUBLE))"
    s"CAST(FLOOR(list_sum(list_transform(range(1,65), i -> $d * $d)) " +
      "* 1000000) AS BIGINT)"
  }

  /** The unrolled k-center selection-trace oracle: d_j = min distance
    * to centers 0..j-1, c_j = its (mind DESC, vec_id) argmax. The
    * center embedding rides in as a CROSS JOIN of its 1-row relation
    * (DuckDB forbids subqueries inside list lambdas). */
  private def kCenterSql(k: Int): String = {
    def ctrOf(c: String): String =
      s"(SELECT embedding AS cemb FROM embeddings WHERE vec_id = " +
        s"(SELECT vec_id FROM $c)) ctr"
    val ctes = new StringBuilder(
      "c0 AS (SELECT min(vec_id) AS vec_id FROM embeddings),\n")
    ctes ++= s"""d1 AS (SELECT vec_id,
      ${kcDistPpmSql("cemb")} AS mind
      FROM embeddings CROSS JOIN ${ctrOf("c0")}),
      c1 AS (SELECT vec_id, mind FROM d1 ORDER BY mind DESC, vec_id LIMIT 1)"""
    for (j <- 2 until k) {
      ctes ++= s""",
      d$j AS (SELECT e.vec_id,
        least(p.mind, ${kcDistPpmSql("cemb")}) AS mind
        FROM embeddings e JOIN d${j - 1} p ON p.vec_id = e.vec_id
        CROSS JOIN ${ctrOf(s"c${j - 1}")}),
      c$j AS (SELECT vec_id, mind FROM d$j
              ORDER BY mind DESC, vec_id LIMIT 1)"""
    }
    val rows = (s"SELECT CAST(0 AS BIGINT) AS sel_idx, " +
      "(SELECT vec_id FROM c0) AS vec_id, " +
      "CAST(NULL AS BIGINT) AS dist_ppm") +:
      (1 until k).map(j =>
        s"SELECT $j, (SELECT vec_id FROM c$j), (SELECT mind FROM c$j)")
    s"WITH $ctes\n${rows.mkString("\nUNION ALL ")}"
  }

  private def hitsSql(w: String): String =
    s"CAST((length(p)-length(replace(p,' $w ','')))/${w.length + 2} AS BIGINT)"

  /** Closed-form replay of the PPM fixture raster's channel-`c` sum
    * (Multimodal.Ppm.pixelValue over every pixel): the Spark side must
    * parse real header+raster bytes to reproduce these sums, which is
    * exactly the real-decode contract. */
  private def ppmChanSumSql(c: Int): String =
    s"""CAST(list_sum(flatten(list_transform(range(0, height), y ->
       |  list_transform(range(0, width), x ->
       |    (media_id*31 + x*7 + y*13 + ${c * 29}) % 256)))) AS BIGINT)"""
      .stripMargin

  /** Integer BT.601 luma (x1000) of the fixture pixel at dHash grid
    * cell (`gx`, `gy`) — 8x8 nearest-neighbor resample, floor-div
    * index math mirroring Multimodal.dhash exactly. */
  private def phashLumaSql(gx: String, gy: String): String = {
    def chan(c: Int): String =
      s"((media_id*31 + ((($gx))*width//8)*7 + " +
        s"((($gy))*height//8)*13 + ${c * 29}) % 256)"
    s"(299*${chan(0)} + 587*${chan(1)} + 114*${chan(2)})"
  }

  /** Same channel sum AFTER a factor-2 nearest-neighbor resize: kept
    * pixel (X, Y) is source pixel (2X, 2Y). */
  private def ppmResChanSumSql(c: Int): String =
    s"""CAST(list_sum(flatten(list_transform(range(0, height), y ->
       |  list_transform(range(0, width), x ->
       |    (media_id*31 + (2*x)*7 + (2*y)*13 + ${c * 29}) % 256))))
       | AS BIGINT)""".stripMargin

  /** AVI fixture channel value, the closed form of
    * `Video.Avi.channelValue` (c: 0=R, 1=G, 2=B). */
  private def aviPixSql(c: Int): String =
    s"(media_id*31 + f*7919 + y*101 + x*13 + ${c * 29}) % 256"

  /** Per-clip channel sum over every (frame, row, column). */
  private def aviChanSumSql(c: Int): String =
    s"""CAST(list_sum(flatten(list_transform(range(0, n_frames), f ->
       |  flatten(list_transform(range(0, height), y ->
       |    list_transform(range(0, width), x ->
       |      ${aviPixSql(c)})))))) AS BIGINT)""".stripMargin

  /** Flip-sensitive row-weighted sum: (y+1) * (r+g+b) in IMAGE row
    * space — a decoder that reads the bottom-up DIB rows top-down
    * cannot match this. */
  private val aviRowWeightedSql: String =
    s"""CAST(list_sum(flatten(list_transform(range(0, n_frames), f ->
       |  flatten(list_transform(range(0, height), y ->
       |    list_transform(range(0, width), x ->
       |      (y+1) * ((${aviPixSql(0)}) + (${aviPixSql(1)})
       |        + (${aviPixSql(2)})))))))) AS BIGINT)""".stripMargin
  private def scoreSql(lang: String): String =
    TextOps.LangStopwords.toMap.apply(lang).map(hitsSql)
      .mkString("(", " + ", ")")

  private val DocsNormCte =
    """WITH t AS (SELECT doc_id, text,
      |  ' ' || lower(text) || ' ' AS p FROM documents)""".stripMargin

  /** Stratified sampling rates for the registered query (dominant
    * event types downsampled, purchases kept whole). */
  private val SampleRates =
    Map("view" -> 0.1, "click" -> 0.2, "purchase" -> 1.0)

  // =====================================================================
  // Queries
  // =====================================================================

  val queries: Map[String, Q] = Map(
    // ---- text analysis ----
    "text_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeCount(col("text")).as("n_bpe_tokens"))),
    "text_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred"))),
    "text_quality_score" -> ((s, dir) =>
      TextOps.withQualityScore(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("text")).drop("text")),
    "text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.contentFingerprint(col("text")).as("content_md5"),
        TextOps.shingleFingerprint(col("text"), 3).as("shingle_md5_min"))),
    "text_redact_pii" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        md5(TextOps.redactPii(col("text"))).as("redacted_md5"))),
    "text_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(t(s, dir, "documents"), col("doc_id"),
        col("text"))),
    // true rolling-hash (winnowing) fingerprint over character windows;
    // the native codegen'd RollingMinHash computes the identical value
    // in O(n) (asserted equal in specs)
    "text_rolling_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.rollingFingerprint(col("text")).as("roll_min"))),

    // ---- dedup ----
    "dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
      Dedup.exactGroups(docs.union(copies), col("doc_id"), col("text"))
    }),
    // the whole near-dup family runs over the FULL documents table —
    // no row caps: these are the queries whose scale behavior the
    // bench is meant to measure
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.8)),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"),
        "doc_id", "text", shingleN = 3, k = 32, bands = 8,
        threshold = 0.5)),
    // the PRODUCTION dedup shape: a new ingest batch (doc_id % 10 = 3
    // plays the daily increment) deduped against the standing corpus
    // at |corpus| x |batch| bucket cost — never corpus x corpus. The
    // oracle is the full-LSH pair set filtered to batch-touching
    // pairs, which the incremental plan must reproduce exactly.
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minhashLshIncremental(
        docs.filter(col("doc_id") % 10 =!= 3),
        docs.filter(col("doc_id") % 10 === 3),
        "doc_id", "text", shingleN = 3, k = 32, bands = 8,
        threshold = 0.5)
    }),
    // incremental EXACT dedup with a bloom split: a fixed-size Bloom
    // filter over the standing corpus's 60-bit content hashes routes
    // each new-batch doc either straight to "kept" (bloom-negative =>
    // PROVABLY new, no join at all) or into an exact md5 anti-join
    // confirm (bloom-positive candidates only). At 100 TB the corpus
    // side of the confirm join is read once to build a 16 MiB filter,
    // and the per-batch confirm join processes only the candidate
    // sliver — never batch x corpus. False positives cost a confirm
    // row; false drops are impossible (the confirm is exact md5).
    "dedup_bloom_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 3)
        .select(TextOps.hex60(md5(col("text"))).as("hkey"),
          md5(col("text")).as("corpus_md5"))
      val batch = docs.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"), col("source"),
          TextOps.hex60(md5(col("text"))).as("hkey"),
          md5(col("text")).as("batch_md5"))
      val bloom = graft.functions.Bloom.buildLongKeyFilter(
        corpus, "hkey", expectedItems = corpus.count())
      val might = graft.functions.Bloom.mightContain(bloom, col("hkey"))
      val definiteNew = batch.filter(!might)
      // exact confirm on the FULL md5, so a 60-bit hkey collision can
      // cost a confirm-join row but never a wrong drop
      val confirmed = batch.filter(might)
        .join(corpus.select(col("corpus_md5")),
          col("batch_md5") === col("corpus_md5"), "left_anti")
      definiteNew.unionByName(confirmed)
        .select(col("doc_id"), col("source"))
    }),
    // asymmetric containment dedup: a small doc whose 3-shingle set is
    // >=90% inside another doc's (quotes, boilerplate, subset pages) —
    // the case symmetric Jaccard dilutes away. Integer test only
    // (100*n_inter >= 90*min), so the pair set is cross-engine exact.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", shingleN = 3, pct = 90)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3)),
    "dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // staged corpus-level pair table (build-once contract; shared
      // with dedup_keep_representative)
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
    }),
    // the dedup OUTPUT, not just the clustering: one representative
    // (the min-doc_id component label) per near-dup cluster with its
    // cluster size — what a curation pipeline actually keeps. Unique
    // docs are their own singleton cluster.
    "dedup_keep_representative" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("cluster_size"))
        .select(col("component").as("doc_id"), col("cluster_size"))
    }),
    // the LLM-side flagship: the full curation chain a training-data
    // pipeline runs end-to-end — C4 quality filter -> exact dedup
    // (keep-first by content hash) -> near-dup keep-representative
    // (0.8-Jaccard clusters) -> context-window chunking. Every stage
    // is an already-verified operator; this registers their
    // COMPOSITION with one composed oracle, the way
    // pipeline_sales_e2e does for the retail side.
    "corpus_curation_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val kept = docs.join(
        Corpus.c4QualityFlags(docs, col("doc_id"), col("text"))
          .filter(col("keep")).select("doc_id"),
        Seq("doc_id"))
      // exact dedup: min doc_id per content hash (hash-agg, no window)
      val exact = kept.join(
        kept.groupBy(md5(col("text")).as("_h"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id"),
        Seq("doc_id"))
      val pairs = Dedup.jaccardPairs(exact, "doc_id", "text",
          threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      val reps = Dedup
        .connectedComponents(exact.select(col("doc_id")), pairs)
        .filter(col("doc_id") === col("component")).select("doc_id")
      Corpus.chunkDocuments(exact.join(reps, Seq("doc_id")),
        col("doc_id"), col("text"), chunkTokens = 64)
    }),
    // multi-table LSH candidates -> exact cosine verify: the scale-safe
    // registered shape (bucket-keyed shuffle, NO nested-loop join; the
    // all-pairs brute form survives only as the spec-side recall
    // baseline). Plane count grows with the corpus via autoPlanes.
    "dedup_embedding_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", dim = 64,
        planes = Similarity.autoPlanes(emb.count()), tables = 4,
        threshold = 0.3)
    }),

    // ---- deterministic sampling / split assignment ----
    // hash-bucket decisions: the same row samples identically on any
    // partitioning, any run, any engine (df.sample's per-partition RNG
    // does not survive a re-read — poison for train/val hygiene)
    "sample_deterministic" -> ((s, dir) =>
      Sampling.deterministicSample(t(s, dir, "documents"), col("doc_id"),
        fraction = 0.1).select(col("doc_id"))),
    "sample_train_val_split" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), valPct = 0.1, testPct = 0.1)
          .as("split"))),
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.events(s, dir), col("event_type"),
        col("event_id"), rates = SampleRates, default = 0.05)
        .select(col("event_id"), col("event_type"))),
    // length-weighted sampling: keep probability n_chars/max(n_chars),
    // decided by integer cross-multiplication on the row's hash bucket
    "sample_weighted_length" -> ((s, dir) =>
      Corpus.weightedSample(t(s, dir, "documents"), col("doc_id"),
        col("n_chars")).select(col("doc_id"), col("n_chars"))),
    // exactly-k PER GROUP: the hash bucket plays the random key and
    // the bounded-heap aggregate keeps the k smallest per source —
    // each task forwards <= k rows per group, no per-group window
    // sort (the curate_topk_per_source shape with a hash as the
    // score). The per-source twin of sample_fixed_size.
    "sample_fixed_per_group" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), col("source"),
          Sampling.bucket(col("doc_id"), "grpk").as("bk"))
        .groupBy(col("source"))
        .agg(graft.functions.TopK.topkByScore(
          -col("bk").cast("double"), col("doc_id"), 10).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("rank"))
    }),
    // exactly-k uniform draw (TakeOrdered on the hash bucket)
    "sample_fixed_size" -> ((s, dir) =>
      Sampling.fixedSizeSample(t(s, dir, "documents"), col("doc_id"),
        k = 100).select(col("doc_id"))),
    // leakage-aware split: the split key is the GROUP (source), so
    // near-duplicate documents from one source can never straddle
    // train/val/test — the group-holdout hygiene near-dup corpora need
    "sample_group_split" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("source"),
        Sampling.splitColumn(col("source"), valPct = 0.1, testPct = 0.1,
          salt = "grp").as("split"))),
    // class rebalancing: every event_type deterministically
    // downsampled to the minority class's count (in expectation)
    "balance_event_classes" -> ((s, dir) =>
      Corpus.balanceClasses(Tables.events(s, dir), col("event_type"),
        col("event_id")).select(col("event_id"), col("event_type"))),
    // domain mixing to explicit ratios (5 click : 3 view : 2 purchase)
    // by deterministic downsampling; untargeted classes drop
    "sample_domain_mixture" -> ((s, dir) =>
      Corpus.mixToTargets(Tables.events(s, dir), col("event_type"),
        col("event_id"), Map("click" -> 5, "view" -> 3, "purchase" -> 2))
        .select(col("event_id"), col("event_type"))),
    // temperature (alpha=1/2) mixing: kept volume per class scales
    // with sqrt(n) — heads tamed, tails surfaced, no explicit targets
    "sample_temperature_mixture" -> ((s, dir) =>
      Corpus.temperatureSample(Tables.events(s, dir), col("event_type"),
        col("event_id"))
        .select(col("event_id"), col("event_type"))),

    // ---- corpus curation: segment dedup, quality rules, vocabulary ----
    // ExactSubstr-lite: drop exact 8-word chunks already seen earlier
    // in the corpus, reassemble the survivors per document
    "dedup_repeated_segments" -> ((s, dir) =>
      Corpus.segmentDedup(t(s, dir, "documents"), col("doc_id"),
        col("text"), segWords = 8)),
    // C4-style rule filter, one audit flag per rule + the conjunction
    "text_c4_filter" -> ((s, dir) =>
      Corpus.c4QualityFlags(t(s, dir, "documents"), col("doc_id"),
        col("text"))),
    // Gopher-style shape rules (word-count/word-length/alpha/symbol/
    // bullet/ellipsis/stopword), one audit flag per rule
    "text_gopher_filter" -> ((s, dir) =>
      Corpus.gopherQualityFlags(t(s, dir, "documents"), col("doc_id"),
        col("text"))),
    // corpus-wide top-50 word bigrams (vocabulary induction seed)
    "vocab_top_bigrams" -> ((s, dir) =>
      Corpus.topBigrams(t(s, dir, "documents"), col("text"), k = 50)),
    // one BPE merge-selection round: adjacent char-pair counts
    // weighted by word frequency, computed over the VOCABULARY (the
    // corpus collapses to distinct words first — the 1000x reduction
    // that makes tokenizer training affordable at corpus scale)
    "vocab_bpe_pairs" -> ((s, dir) =>
      Corpus.bpePairCounts(t(s, dir, "documents"), col("text"), k = 30)),
    // the full iterative BPE trainer: 8 merge rounds (apply top pair,
    // re-tokenize, re-count) over the vocabulary; each round's chosen
    // merge hash-verified against an unrolled-CTE DuckDB replay
    "vocab_bpe_merges" -> ((s, dir) =>
      Corpus.bpeMerges(t(s, dir, "documents"), col("text"),
        rounds = BpeRounds)._1),
    // the symbol inventory AFTER those merges (weighted by word
    // frequency) — the induced tokenizer vocabulary itself
    "vocab_bpe_vocab" -> ((s, dir) =>
      Corpus.bpeMerges(t(s, dir, "documents"), col("text"),
        rounds = BpeRounds)._2),
    // hashing-trick featurization: fixed-dim sparse bag-of-words with
    // no fitted vocabulary — split-invariant and streaming-safe, the
    // deterministic md5 dim index makes the sparse matrix hash-verify
    "features_hashed_bow" -> ((s, dir) =>
      Corpus.hashedBow(t(s, dir, "documents"), col("doc_id"),
        col("text"), dims = 64)),
    // context-window chunking: docs -> 64-token pieces with provenance
    "chunk_documents" -> ((s, dir) =>
      Corpus.chunkDocuments(t(s, dir, "documents"), col("doc_id"),
        col("text"), chunkTokens = 64)),
    // Zipf audit: term-count histogram in power-of-two bins
    "vocab_freq_histogram" -> ((s, dir) =>
      Corpus.freqHistogram(t(s, dir, "documents"), col("text"))),
    // no-model perplexity proxy: fraction of a doc's bigrams seen
    // >= 5 times corpus-wide (integer ppm, hash-joined on hex60)
    "text_bigram_familiarity" -> ((s, dir) =>
      Corpus.bigramFamiliarity(t(s, dir, "documents"), col("doc_id"),
        col("text"), minCount = 5)),
    // per-domain curriculum selection: best 5 docs per source by
    // quality score, through the bounded-heap aggregate (each task
    // forwards <= 5 rows per source — no per-domain window sort)
    "curate_topk_per_source" -> ((s, dir) => {
      val scored = TextOps.withQualityScore(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("text")), col("text"))
        // empty text -> 0/0 = NaN score; the heap agg skips NaN rows,
        // so exclude them explicitly to keep the oracle's rank frame
        // identical (the SQL twin filters NOT isnan likewise)
        .filter(!isnan(col("quality_score")))
      scored.groupBy(col("source"))
        .agg(graft.functions.TopK.topkByScore(col("quality_score"),
          col("doc_id"), 5).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          col("col.score").as("quality_score"),
          (col("pos") + 1).cast("long").as("rank"))
    }),

    // token-budget curation: per source, best-quality docs greedily
    // until a 500-token budget — the selection step between scoring
    // and training-set assembly. Strict prefix semantics (cumsum
    // window), so the kept set is order-replayable cross-engine.
    "curate_token_budget" -> ((s, dir) => {
      val scored = TextOps.withQualityScore(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("text")), col("text"))
        .filter(!isnan(col("quality_score")))
      Corpus.tokenBudgetSelect(scored, col("source"),
          Seq(col("quality_score").desc, col("doc_id")),
          col("n_tokens"), budget = 500L)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"))
    }),
    // curriculum-ordered training shards: docs hash-assigned to
    // shards, ordered best-quality-first WITHIN each shard with their
    // position, written hive-partitioned by shard and read back —
    // the write layout a curriculum loader streams in order (parquet
    // preserves row order within files). Per-shard windows only;
    // shard count scales with the corpus.
    "sink_curriculum_shards" -> ((s, dir) => {
      val scored = TextOps.withQualityScore(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("text"))
        .filter(!isnan(col("quality_score")))
        .withColumn("shard", Sampling.bucket(col("doc_id"), "shard") % 8)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("quality_score").desc, col("doc_id"))
      val ordered = scored
        .withColumn("position", row_number().over(w).cast("long"))
        .select(col("shard"), col("position"), col("doc_id"))
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_curr/shards"
      reclaimOnExit(tmp)
      ordered.write.mode("overwrite").partitionBy("shard").parquet(tmp)
      s.read.parquet(tmp)
        .select(col("shard").cast("long").as("shard"), col("position"),
          col("doc_id"))
    }),
    // conditional bigram table (n-gram-LM building block): top-3
    // continuations per first word with integer-ppm conditional
    // probabilities
    "vocab_bigram_conditionals" -> ((s, dir) =>
      Corpus.bigramConditionals(t(s, dir, "documents"), col("text"),
        k = 3, minFirst = 10L)),
    // the REMOVAL step contamination_check motivates: train docs
    // sharing >= 5 test 13-gram shingles are dropped, and the cleaned
    // corpus is summarized per source — composes the verified overlap
    // operator, like corpus_curation_e2e composes its stages
    "decontaminate_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 20 =!= 0)
      val test = docs.filter(col("doc_id") % 20 === 0)
      val bad = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
          shingleN = 13)
        .filter(col("n_shared_shingles") >= 5)
        .select(col("train_id").as("doc_id")).distinct()
      train.join(bad, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"))
    }),
    // the v2 composed flagship: quality filter -> exact dedup ->
    // near-dup keep-representative -> benchmark decontamination ->
    // per-source token-budget selection, fused into ONE plan under one
    // composed oracle — the full selection path from raw corpus to
    // budgeted training set. Per-stage wall attribution comes from
    // curationV2StageSeconds in the bench.
    "corpus_curation_v2" -> ((s, dir) =>
      curationV2Stages(s, dir).foldLeft(curationV2Docs(s, dir)) {
        case (df, (_, stage)) => stage(df)
      }),

    // ---- embedding transforms ----
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
    // JL random projection 64 -> 16 dims with md5-derived plane
    // weights, exploded to scalar rows like emb_normalize
    "emb_random_projection" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
        posexplode(Similarity.randomProjection(col("embedding"),
          dim = 64, outDim = 16)))
        .select(col("vec_id"), col("pos").cast("long").as("rp_dim"),
          col("col").as("rp_val"))),

    // ---- corpus preparation: packing + decontamination ----
    // group count grows with the corpus via autoGroups (~64 docs per
    // group, power of two; SQL twin derives the same count from
    // count(*)), so per-group fold memory stays constant at any scale
    "pack_sequences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Packing.packSequences(docs, col("doc_id"), col("text"),
        budgetTokens = 512, nGroups = Packing.autoGroups(docs.count()))
    }),
    // packing WITH the per-document bin offset — the (bin, offset)
    // position map a training loader consumes to derive attention
    // boundaries without re-tokenizing; same fold, one more running
    // value, replayed by the same recursive-walk oracle
    "pack_with_positions" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Packing.packWithPositions(docs, col("doc_id"), col("text"),
        budgetTokens = 512, nGroups = Packing.autoGroups(docs.count()))
    }),
    // contamination: training docs sharing a 13-gram with the held-out
    // slice (doc_id % 20 == 0 plays the benchmark set)
    "contamination_check" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusOverlap(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 13)
    }),

    // ---- similarity search ----
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
        planes = Similarity.autoPlanes(emb.count()), threshold = 0.2)
    }),
    // centroid count grows ~sqrt(n) with the corpus via autoCentroids
    // (the SQL twin derives the identical count from count(*)) — a
    // fixed count would leave n/const vectors per cell and the
    // within-cell scan linear again at 100x
    "sim_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding",
        nCentroids = Similarity.autoCentroids(emb.count()), k = 5,
        nProbe = 2)
    }),
    // k-means cluster assignment as a first-class OUTPUT (corpus
    // partitioning for diversity balancing / per-cluster sampling),
    // not just the internal step of IVF search: the Lloyd-refined
    // coarse quantizer's final per-vector cell, hash-verified
    // INCLUDING the iterative fit (the oracle replays every Lloyd
    // round in SQL)
    "emb_kmeans_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfAssign(emb, "vec_id", "embedding",
          nCentroids = Similarity.autoCentroids(emb.count()), iters = 2)
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
      val emb = t(s, dir, "embeddings")
      val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
          nCentroids = Similarity.autoCentroids(emb.count()), iters = 2)
        .select(col("vec_id"), col("centroid_id"))
      Corpus.balanceClasses(assigned, col("centroid_id"), col("vec_id"))
        .select(col("vec_id"), col("centroid_id"))
    }),
    // product quantization: corpus compressed to 4 codeword ids per
    // vector, search by integer ADC lookup-table sums — like the IVF
    // fit, the ITERATIVE per-subspace k-means is hash-verified in SQL
    "sim_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, m = 4, ksub = 16, k = 5)
    }),
    // int8 symmetric quantization + exact rerank: the corpus-wide scan
    // reads 8-bit codes (4x fewer bytes than float32, integer ALU
    // scoring), full-precision vectors fetched only for the k*4
    // candidate sliver — the memory-bandwidth ANN shape at 100 TB
    "sim_int8_rerank_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.int8RerankTopK(emb, emb.filter(col("vec_id") < 10),
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
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          nCentroids = Similarity.autoCentroids(emb.count()), k = 5,
          nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("ivf_nprobe2").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
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
      val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding",
          dim = 64, m = 4, ksub = 16, k = 5)
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
      val i8 = Similarity.int8RerankTopK(emb, q, "vec_id", "embedding",
          k = 5, candMult = 4)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(i8, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit")).as("matched"), count(lit(1)).as("total"))
        .select(lit("int8_cand4x").as("method"), col("matched"),
          col("total"),
          expr("matched * 1000000L div total").as("recall_ppm"))
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

    // ---- multimodal plumbing ----
    "mm_payload_stats" -> ((s, dir) =>
      Multimodal.payloadStats(t(s, dir, "documents"))),
    "mm_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(t(s, dir, "documents"))).toDF()),
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

    // ---- bucketed (co-located) joins ----
    // both fact tables staged ONCE bucketed+sorted by their join key,
    // then joined exchange-free (PlanShapeSpec pins the no-shuffle
    // plan) — the curated-layout shape that turns every repeated
    // fact-to-fact join at 100 TB from two shuffles into zero
    "sink_bucketed_join" -> ((s, dir) => {
      val joined = graft.ops.Bucketing.colocatedJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount")),
        "o_orderkey", "l_orderkey", nBuckets = 8,
        graft.ops.Bucketing.scratchRoot(s))
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Windows.stableSum(col("l_extendedprice")
            * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // ---- event-time windows (batch) ----
    "window_tumbling" -> ((s, dir) =>
      Windows.tumbling(Tables.events(s, dir), col("ts"), 3600,
        Seq(col("event_type")))
        .withColumn("window_epoch", col("window_start").cast("long"))
        .drop("window_start")),
    "window_sliding" -> ((s, dir) =>
      Windows.sliding(Tables.events(s, dir), col("ts"), 3600, 1800)
        .withColumn("window_epoch", col("window_start").cast("long"))
        .drop("window_start")),
    "window_session" -> ((s, dir) =>
      Windows.sessionize(Tables.events(s, dir), col("user_id"), col("ts"),
        1800)),
    // gap-filled hourly series: every (event_type, hour) cell of the
    // global time range, zero-filled where no events landed — the
    // resample step between raw events and any time-series consumer
    // (a model can't learn from silently missing rows). The grid is
    // hours x types: both sides are bounded (8760 cells/year x a
    // class-capped type set), so the unconditioned broadcast join IS
    // the scale shape, and the deliverable is the grid itself.
    "window_gapfill" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        (floor(col("ts").cast("long") / 3600) * 3600).cast("long")
          .as("window_epoch"))
      val counts = ev.groupBy(col("event_type"), col("window_epoch"))
        .agg(count(lit(1)).as("n_events"))
      val hours = ev.agg(min(col("window_epoch")).as("lo"),
          max(col("window_epoch")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(3600L)))
          .as("window_epoch"))
      val types = ev.select(col("event_type")).distinct()
      hours.join(broadcast(types))
        .join(counts, Seq("event_type", "window_epoch"), "left")
        .select(col("event_type"), col("window_epoch"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),
    // built-in session_window in BATCH mode — same semantics as the
    // lag+cumsum sessionization and the streaming twin
    "window_session_builtin" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("session_window.start"),
          "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("user_id"), col("n_events"))),
    "events_json_extract" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"))),

    // ---- analytics over the fact table ----
    "analytics_q1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Windows.stableSum(col("l_quantity")).as("sum_qty"),
          Windows.stableSum(col("l_extendedprice")).as("sum_base_price"),
          Windows.stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("n_rows"))),
    "analytics_running_total" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum(floor(col("l_extendedprice") * 1000000).cast("long")).over(w)
            / 1000000.0).as("running_revenue"))
    }),
    // RFM customer scoring: recency/frequency/monetary quintiles
    // WITHIN each market segment (per-segment windows — scoring is
    // relative to the peer group, and the window never goes global).
    // Recency anchors on the corpus max order date (one scalar probe);
    // monetary is the order-proof micro-unit sum; every score is an
    // ntile under a fully tiebroken total order.
    "analytics_rfm_scores" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("customer_id"),
        col("o_orderdate").cast("date").as("d"),
        col("o_totalprice"))
      val maxD = o.agg(max(col("d"))).head().getDate(0)
      val cust = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("customer_id"),
        col("c_mktsegment"))
      val rfm = o.groupBy(col("customer_id")).agg(
          datediff(lit(maxD), max(col("d"))).cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          Windows.stableSum(col("o_totalprice")).as("monetary"))
        .join(cust, Seq("customer_id"))
      def w(order: org.apache.spark.sql.Column*) =
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_mktsegment")).orderBy(order: _*)
      rfm
        .withColumn("r_score", ntile(5)
          .over(w(col("recency_days"), col("customer_id"))).cast("long"))
        .withColumn("f_score", ntile(5)
          .over(w(col("frequency").desc, col("customer_id"))).cast("long"))
        .withColumn("m_score", ntile(5)
          .over(w(col("monetary").desc, col("customer_id"))).cast("long"))
    }),
    "analytics_topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rank").cast("long").as("rank"))
    }),
    // fact x dim join-aggregate: revenue by order priority. The orders
    // side is the smaller input -> broadcast by the planner (verified
    // in plans); one shuffle for the final group-by.
    "analytics_priority_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Windows.stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))),
    // star join through three broadcast dims: revenue per region
    "analytics_region_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(Windows.stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))),
    // rollup subtotals (counts only -- engine-portable)
    "analytics_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"))),
    "analytics_distinct_counts" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))),
    "events_from_json_struct" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k_num"))),
    // pivot: event counts per user, one column per event type
    "analytics_pivot" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),
    // cube: subtotals over both grouping dimensions
    "analytics_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"))),
    // moving 7-day revenue per supplier: RANGE frame over event-time
    "analytics_moving_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-604800L, 0L)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("timestamp").cast("long").as("epoch_s"),
          floor(col("l_extendedprice") * 1000000).cast("long").as("micros"))
        .withColumn("moving_7d_revenue",
          (sum(col("micros")).over(w) / 1000000.0))
        .drop("micros")
    }),
    // lead/lag/ntile/first_value over an event-time order — the
    // remaining window-function family in one pass (single shuffle on
    // the partition key, all four functions share the frame)
    "analytics_lead_lag_ntile" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          lag(col("l_extendedprice"), 1).over(w).as("prev_price"),
          lead(col("l_extendedprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("l_extendedprice")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .as("first_price"))
    }),
    // except all (multiset difference)
    "setop_except_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").select(col("l_orderkey"))
      val b = t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1).select(col("l_orderkey"))
      a.exceptAll(b)
    }),
    // funnel: per user, did signup -> click -> purchase happen in order
    "analytics_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val firstOf = (t: String) => min(when(col("event_type") === t,
        col("ts").cast("double"))).as(s"first_$t")
      ev.groupBy(col("user_id"))
        .agg(firstOf("signup"), firstOf("click"), firstOf("purchase"))
        .select(col("user_id"),
          col("first_signup").isNotNull.as("did_signup"),
          (col("first_click") > col("first_signup")).as("clicked_after_signup"),
          (col("first_purchase") > col("first_click")
            && col("first_click") > col("first_signup"))
            .as("purchased_after_click"))
    }),
    // top entry paths: each user's first three events in (ts,
    // event_id) order joined into a path string, counted, top-20 —
    // ORDERED-sequence aggregation (sort_array over collected
    // (rn, type) structs), the one aggregate family rank/window
    // queries don't exercise. Per-user window + hash agg on the path
    // string; the top-20 is a TakeOrdered, never a global sort.
    "analytics_event_paths" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val first3 = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      first3.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_steps"),
          array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .filter(col("n_steps") === 3)
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(20)
    }),
    // weekly cohort retention: users by first-activity week x active week
    "analytics_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val week = (c: org.apache.spark.sql.Column) =>
        floor(c.cast("double") / 604800).cast("long")
      val firstWeek = ev.groupBy(col("user_id"))
        .agg(min(week(col("ts"))).as("cohort_week"))
      ev.select(col("user_id"), week(col("ts")).as("active_week"))
        .distinct()
        .join(firstWeek, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("active_week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),
    // tf-idf-ish top terms per doc: score = tf * N / df, rational (no
    // log -- cross-engine exact), top 3 by (score desc, term). Runs the
    // FULL corpus: two shuffles (tf group-by, df group-by + term join)
    // plus the per-doc window — the cost the bench measures
    "text_top_terms" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(dfreq, Seq("term"))
        .withColumn("score", col("tf") * lit(n * 1.0) / col("df"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("score"),
          col("rank").cast("long").as("rank"))
    }),
    // salted equi-join for known-hot keys: identical semantics to the
    // plain join (same oracle as analytics_priority_revenue)
    "join_salted_skew" -> ((s, dir) =>
      graft.ext.Skew.saltedJoin(
          t(s, dir, "lineitem"), t(s, dir, "orders"),
          "l_orderkey", "o_orderkey", saltFactor = 8,
          spread = col("l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(Windows.stableSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_items"))),
    // exact interpolated percentiles (probed bit-identical to DuckDB's
    // quantile_cont)
    "analytics_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.99)").as("p99"))),
    // incremental watermark load (the strategy the reference's metadata
    // reserves): initial batch to a cutoff, then append past the high
    // watermark; the final table must equal the full source
    "incremental_watermark_load" -> ((s, dir) => {
      // per-SESSION scratch path (keyed by applicationId), cleared
      // up-front: repeated invocations in one session (bench reps)
      // reuse ONE directory instead of leaking an orphaned copy of the
      // orders table per run, and two concurrent sessions sharing
      // /tmp can no longer clobber each other's table mid-run
      val scratch = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_incr_scratch_${s.sparkContext.applicationId}").toString
      reclaimOnExit(scratch)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val tmp = scratch + "/orders"
      val src = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      val batch1 = src.filter(col("o_orderdate") <= lit("1998-01-01")
        .cast("timestamp"))
      val wm1 = graft.ops.Load.incrementalAppend(batch1, tmp,
        "o_orderdate", None)
      // re-run with unchanged watermark: must append nothing
      graft.ops.Load.incrementalAppend(batch1, tmp, "o_orderdate", wm1)
      // second batch: everything past the watermark
      graft.ops.Load.incrementalAppend(src, tmp, "o_orderdate", wm1)
      s.read.parquet(tmp).select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_iso"),
        col("o_totalprice"))
    }),
    // keyed MERGE (upsert + delete) over immutable storage — the
    // copy-on-write plan every lakehouse table format executes: one
    // broadcast anti-join of base against the update keys plus a
    // union; the base never shuffles. Update/new/delete sets are
    // derived deterministically from the customer table (disjoint
    // custkey residues) so the oracle replays the full MERGE.
    "merge_upsert_customers" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"), col("c_mktsegment"))
      val mods = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_mktsegment", lit("SEGMENT_UPDATED"))
        .withColumn("is_delete", lit(false))
      val news = base.filter(col("c_custkey") % 10 === 2)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(lit("NEW_"), col("c_name")).as("c_name"),
          lit("SEGMENT_NEW").as("c_mktsegment"))
        .withColumn("is_delete", lit(false))
      val dels = base.filter(col("c_custkey") % 10 === 1)
        .withColumn("is_delete", lit(true))
      graft.ops.Merge.mergeUpsert(base,
        mods.unionByName(news).unionByName(dels),
        Seq("c_custkey"), deleteFlag = Some("is_delete"))
    }),
    // SCD TYPE 2 dimension history from a change log: each customer's
    // order-priority history as validity intervals. The change order
    // is the BIGINT (epoch_day * 1e10 + orderkey) encoding — a total
    // order both engines compute identically (same-day orders break
    // ties on orderkey). Consecutive no-op replays collapse.
    "scd2_customer_priority" -> ((s, dir) => {
      val ord = datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01"))).cast("long") * 10000000000L +
        col("o_orderkey").cast("long")
      val changes = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("customer_id"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate"), col("o_orderkey"))
      graft.ops.Merge.scd2(changes, Seq("customer_id"),
          Seq("priority"), ord)
        .select(col("customer_id"), col("priority"), col("valid_from"),
          col("valid_to"), col("is_current"), col("version"))
    }),
    // first-touch attribution: each purchase credited to the user's
    // EARLIEST click in the preceding 30 minutes, with the candidate
    // count. Equi-key (user) hash join + bounded range filter + min
    // aggregate — the batch twin of the interval join's shape, and
    // the other half of attribution beside asof (last-touch).
    "attribution_first_touch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") <= col("ts") &&
            col("c_ts") >= col("ts") - expr("interval 30 minutes"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks_window"),
          date_format(min(col("c_ts")), "yyyy-MM-dd HH:mm:ss")
            .as("first_click_s"))
    }),
    // linear multi-touch attribution — the credit-splitting complement
    // of attribution_first_touch: every click in the purchase's 30-min
    // lookback gets 1e6/n ppm credit (INTEGER division, so the split
    // is cross-engine exact), accumulated per click. Same bounded
    // equi-user range join; the per-purchase click count is a per-key
    // window, never global.
    "attribution_linear" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
      val j = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") <= col("ts") &&
            col("c_ts") >= col("ts") - expr("interval 30 minutes"))
        .select(col("p_id"), col("click_id"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_id"))
      j.withColumn("n_clicks", count(lit(1)).over(w))
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(expr("1000000 div n_clicks")).as("credit_ppm"))
    }),
    // per-source equi-depth length quartiles: ntile under a TOTAL
    // order (n_tokens, doc_id) — standard-SQL distribution semantics
    // both engines share; per-source windows only, nothing global
    "stats_length_quartiles" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_tokens"), col("doc_id"))
      d.withColumn("quartile", ntile(4).over(w).cast("long"))
    }),
    // as-of join: every event enriched with its user's most recent
    // (<= ts) purchase — union+window implementation, one shuffle
    "asof_join_last_purchase" -> ((s, dir) => {
      val events = Tables.events(s, dir)
      val purchases = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
        .withColumn("purchase_epoch", col("ts").cast("double"))
      AsOfJoin.asofLe(events, purchases, "user_id", "ts",
          Seq("purchase_value", "purchase_epoch"))
        .select(col("event_id"), col("purchase_value"), col("purchase_epoch"))
    }),
    // snapshot diff / CDC derivation: classify every PK as added /
    // removed / changed between two table versions via ONE full-outer
    // join (a hash exchange per side on the PK — co-partitioned and
    // exchange-free if both snapshots are bucketed by PK, the
    // sink_bucketed_join layout). Attribute comparison is null-safe
    // (<=>) so NULL-valued columns diff correctly. v2 is the
    // merge_upsert mutation pattern, so the expected diff is
    // closed-form: %10==0 changed, %10==1 removed, %10==2 added twin.
    "diff_snapshots" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"), col("c_mktsegment"))
      val v2 = base.filter(col("c_custkey") % 10 =!= 1)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 10 === 0, lit("SEGMENT_V2"))
            .otherwise(col("c_mktsegment")))
        .unionByName(base.filter(col("c_custkey") % 10 === 2).select(
          (col("c_custkey") + 10000000L).as("c_custkey"),
          concat(lit("NEW_"), col("c_name")).as("c_name"),
          lit("SEGMENT_NEW").as("c_mktsegment")))
      val a = base.select(col("c_custkey").as("k_old"),
        col("c_name").as("name_old"), col("c_mktsegment").as("seg_old"))
      val b = v2.select(col("c_custkey").as("k_new"),
        col("c_name").as("name_new"), col("c_mktsegment").as("seg_new"))
      a.join(b, col("k_old") === col("k_new"), "full_outer")
        .withColumn("change_type",
          when(col("k_old").isNull, lit("added"))
            .when(col("k_new").isNull, lit("removed"))
            .when(!(col("seg_old") <=> col("seg_new")) ||
              !(col("name_old") <=> col("name_new")), lit("changed"))
            .otherwise(lit("unchanged")))
        .filter(col("change_type") =!= "unchanged")
        .select(coalesce(col("k_old"), col("k_new")).as("c_custkey"),
          col("change_type"), col("seg_old").as("old_segment"),
          col("seg_new").as("new_segment"))
    }),
    // compaction planner: greedy next-fit packing of shard sizes into
    // ~target-byte groups via a running-sum window. The input is the
    // FILE MANIFEST (one row per shard/file), not the data — at 100 TB
    // that is ~1e5 rows, so the single global-order window is a
    // metadata computation, not a data-scale sort. Pure integer
    // arithmetic end to end.
    "sink_compaction_plan" -> ((s, dir) => {
      val target = 8192L
      val shards = t(s, dir, "documents")
        .groupBy((col("doc_id") % 64).as("shard"))
        .agg(sum(col("n_chars")).as("size_bytes"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("size_bytes").desc, col("shard"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      shards
        .withColumn("cum_before",
          coalesce(sum(col("size_bytes")).over(w), lit(0L)))
        .select(col("shard"), col("size_bytes"),
          (col("cum_before") / target).cast("long").as("compact_group"))
    }),
    // exact-integer outlier detection: flag docs whose token count sits
    // more than 1.5 sd from the per-source mean, with the z-test
    // rewritten as 4(nx-S)^2 > 9(n*SS - S^2) — no float mean/variance
    // anywhere, so the answer is bit-identical across engines. The
    // predicate arithmetic runs in DecimalType(38,0): int64 wraps
    // silently (non-ANSI) once n*SS or the squared term passes 2^63 —
    // reachable at ~1e6 docs/source with ~30k-token docs — while
    // decimal128 keeps every product exact to 1e38 (n~1e9 docs/source
    // at 3e4 tokens peaks near 1e27; DuckDB's HUGEINT covers the same
    // domain, so the cross-engine exactness claim survives scale).
    // Per-source stats are a tiny aggregate broadcast back onto the
    // doc stream: one shuffle for the stats, none for the scan.
    "quality_outlier_zscore" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      val st = d.groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(col("n_tokens")).as("s"),
        sum(col("n_tokens").cast(dec) * col("n_tokens").cast(dec)).as("ss"))
      val nD = col("n").cast(dec)
      val sD = col("s").cast(dec)
      val dx = nD * col("n_tokens").cast(dec) - sD
      d.join(broadcast(st), Seq("source"))
        .filter(col("n") > 1 &&
          lit(4).cast(dec) * dx * dx >
            lit(9).cast(dec) * (nD * col("ss") - sD * sD))
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),
    // ER-style fuzzy dedup: collapse exact-duplicate names FIRST (the
    // quadratic killer — identical names form Θ(k²) pairs for free),
    // then block the DISTINCT names on (first token, length band) and
    // pair block-mates at edit distance 1..3. Pair generation is
    // block-local: the join key is the block, never a cross join, and
    // the distinct-name relation is vocabulary-sized, not corpus-sized.
    "dedup_fuzzy_names" -> ((s, dir) => {
      val names = t(s, dir, "part").groupBy(col("p_name"))
        .agg(min(col("p_partkey")).cast("long").as("rep_key"),
          count(lit(1)).as("n_parts"))
      val blocked = names
        .withColumn("w1", split(col("p_name"), " ").getItem(0))
        .withColumn("lb", (length(col("p_name")) / lit(3)).cast("long"))
      val a = blocked.select(col("p_name").as("name_a"),
        col("n_parts").as("parts_a"), col("w1"), col("lb"))
      val b = blocked.select(col("p_name").as("name_b"),
        col("n_parts").as("parts_b"), col("w1"), col("lb"))
      a.join(b, Seq("w1", "lb"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("distance",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("distance").between(1L, 3L))
        .select(col("name_a"), col("name_b"), col("distance"),
          col("parts_a"), col("parts_b"))
    }),
    // PageRank centrality over the MinHash-LSH near-dup graph (the
    // production candidate generator — its shingle-space pairs survive
    // the df-cap at corpus scale where unigram-token pairs don't):
    // which docs are central in their dup neighborhood
    // (canonical-candidate ranking). ppb fixed point so three unrolled
    // power iterations replay exactly in SQL — see
    // ext/Graph.pageRankPpb for the arithmetic contract.
    "graph_pagerank" -> ((s, dir) => {
      // the near-dup pair table is STAGED (built once per session by
      // whichever graph consumer runs first, read by the rest) — the
      // production build-once contract; no cache/unpersist dance, the
      // parquet artifact IS the materialization
      val pairs = graft.ext.PairStage.lshPairs(s, dir)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val nodes = edges.select(col("src").as("id")).distinct()
      Graph.pageRankPpb(nodes, edges, iters = 3)
    }),
    // exact triangle count + oriented-wedge (probe work) count over
    // the near-dup graph: degree-ordered orientation caps the oriented
    // out-degree at O(sqrt(m)), so wedge generation survives hub keys
    // that would make the naive neighbor self-join quadratic
    "graph_triangles" -> ((s, dir) => {
      val pairs = graft.ext.PairStage.lshPairs(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      Graph.triangleStats(pairs)
    }),
    // explicit runtime-filter join: a Bloom filter built over the
    // dimension side's keys prunes the FACT SCAN before any shuffle;
    // the exact join afterwards absorbs false positives, so the output
    // is exactly the plain join's (what the oracle checks). At 100 TB
    // this is the difference between shuffling every fact row and
    // shuffling only the ~segment-share that can join — the filter is
    // a fixed-size (<=16 MiB) codegen constant, not a collected key
    // set. See functions/Bloom.scala.
    "join_bloom_prefilter" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").cast("long").as("c_custkey"))
      val orders = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("o_custkey"), col("o_totalprice"))
      // two bounded jobs on the SMALL side (count + sketch agg): the
      // build side is dimension-sized by contract
      val bloom = graft.functions.Bloom.buildLongKeyFilter(
        cust, "c_custkey", expectedItems = cust.count())
      orders
        .filter(graft.functions.Bloom.mightContain(bloom, col("o_custkey")))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Windows.stableSum(col("o_totalprice")).as("total_price"))
    }),

    // ---- r9 additions ----
    // bucketed point-in-interval join: the equi-join rewrite of a
    // BETWEEN join Spark would otherwise plan broadcast-nested-loop
    // (see ext/RangeJoin). Overlapping synthetic key bands over the
    // part keyspace; intervals explode to ~4 buckets each at width
    // 256, the exact BETWEEN re-applies post-join. Oracle: the naive
    // range join, because the rewrite is semantically transparent.
    "join_range_bucketed" -> ((s, dir) => {
      val pts = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("p_partkey"))
      val iv = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("interval_id"),
        (col("n_nationkey").cast("long") * 600 + 1).as("lo"),
        (col("n_nationkey").cast("long") * 600 + 1000).as("hi"))
      RangeJoin.bucketedRangeJoin(pts, iv, "p_partkey", "lo", "hi",
          bucketWidth = 256)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"),
          min(col("p_partkey")).as("key_lo"),
          max(col("p_partkey")).as("key_hi"))
    }),
    // count-min sketch accuracy report: exact top-20 token counts vs
    // the 4x1024 CMS estimate — the sketch itself is hash-verified,
    // so a width/depth change that degrades accuracy fails the gate
    // (the frequency twin of the ANN/LSH recall reports)
    "sketch_cms_error" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val exact = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(20)
      Sketches.cmsEstimate(Sketches.cmsBuild(toks, "token"),
          exact.select(col("token").as("term")))
        .join(exact.withColumnRenamed("token", "term"), Seq("term"))
        .select(col("term"), col("exact_cnt"), col("cms_est"))
    }),
    // HLL distinct-count report: per-source exact distinct tokens vs
    // the 256-register integer-exact HLL estimate (ext/Sketches —
    // scaled harmonic mean, no float accumulation anywhere)
    "sketch_hll_distinct" -> ((s, dir) => {
      val tok = t(s, dir, "documents").select(col("source"),
        explode(TextOps.tokens(col("text"))).as("token"))
      val exact = tok.groupBy(col("source"))
        .agg(countDistinct(col("token")).as("exact_distinct"))
      exact.join(Sketches.hllEstimate(tok, col("token"),
          Seq(col("source"))), Seq("source"))
        .select(col("source"), col("exact_distinct"), col("hll_est"))
    }),
    // equi-width histogram quantile estimate WITH its error vs the
    // exact nearest-rank quantile — the quantile member of the sketch
    // family (128 mergeable cells vs every distinct value); like the
    // CMS/HLL/recall reports, the error column is itself hash-verified
    "sketch_quantile_error" -> ((s, dir) =>
      Sketches.histQuantileError(t(s, dir, "orders"),
        col("o_totalprice"), buckets = 128, qs = Seq(50, 90, 99))),
    // incremental aggregate maintenance: per-month aggregate STATE
    // (count / micro-unit sum / min / max) computed separately over a
    // 90% base and a 10% delta, then merged state-to-state — the
    // pre-aggregation contract at 100 TB (aggregate only the new
    // partition, fold states); the oracle aggregates the FULL table
    // directly, so merge == recompute is the hash-checked claim
    "agg_partial_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      def state(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Merge.aggState(d, Seq("month"), col("o_totalprice"))
      graft.ops.Merge.mergeAggStates(
          Seq(state(o.filter(col("o_orderkey") % 10 =!= 0)),
            state(o.filter(col("o_orderkey") % 10 === 0))), Seq("month"))
        .select(col("month"), col("n"),
          (col("sum_micro") / 1000000.0).as("total_price"),
          col("vmin"), col("vmax"))
    }),
    // priority sampling (Duffield-Lund-Thorup): token-weighted
    // fixed-size doc draw — longer docs proportionally likelier,
    // sample size exactly k, deterministic and engine-replayable
    "sample_weighted_priority" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      Sampling.prioritySample(docs, col("doc_id"), col("n_tokens"),
        k = 100)
    }),
    // corpus-hot stopword strip: tokens in >= half of all docs are
    // removed from every doc, order/multiplicity of the rest kept —
    // the transform twin of the stopword-density quality scores
    "corpus_stopword_strip" -> ((s, dir) =>
      Corpus.stripHotTokens(t(s, dir, "documents"), col("doc_id"),
        col("text"), dfNum = 1, dfDen = 2)),
    // integer-exact TF-IDF: idf as (n*1e6) div df — the monotone
    // integer proxy for ln(n/df); libm's ln is NOT guaranteed
    // bit-identical across engines, integer division is. Top-3 terms
    // per doc with a (score desc, token) total order. The window
    // partitions by doc_id (high-cardinality key: hash-spread, no
    // global sort); the df side joins on token
    "text_tfidf_top_terms" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val tf = docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      // tf * idf_ppm runs in decimal128 (HUGEINT in the oracle): at
      // n ~ 1e9 docs idf_ppm reaches ~1e15, so a rare high-tf term
      // (tf >~ 9e3) would overflow an int64 product and corrupt the
      // RANKING. Ranking therefore orders on the decimal; the emitted
      // score column casts back to int64 (exact while tf*n*1e6 < 2^63,
      // i.e. every realistic top-3 row; the pmi/gini discipline)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score_dec").desc, col("token"))
      tf.join(dfr, Seq("token"))
        .withColumn("idf_ppm", expr(s"(${n}L * 1000000L) div df"))
        .withColumn("score_dec",
          col("tf").cast(dec) * col("idf_ppm").cast(dec))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"),
          col("score_dec").cast("long").as("score"), col("rnk"))
    }),
    // per-user 7-day rolling features at every event — the classic
    // feature-engineering shape (one shuffle on the user key, a
    // range-frame window sorted within partition; RANGE includes
    // ts-second peers identically in any engine). The value sum rides
    // the stable micro-unit integer fold
    "window_rolling_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"),
        col("user_id"), col("ts").cast("long").as("ts_sec"), col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-7L * 86400, 0)
      ev.select(col("event_id"), col("user_id"), col("ts_sec"),
        count(lit(1)).over(w).as("n_7d"),
        (sum(floor(col("value") * 1000000).cast("long")).over(w)
          / 1000000.0).as("val_7d"))
    }),
    // ordered conversion funnel: first view, first click AFTER that
    // view, first purchase AFTER that click; stage credited only
    // within 7 days of the view. Three user-keyed aggregates + joins
    // (co-partitioned on user_id end to end), never a window over
    // the whole event stream
    "events_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), col("ts").cast("long").as("ts_sec"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts_sec") >= col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts_sec") >= col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("p_ts"))
      ev.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("p_ts").isNotNull &&
            col("p_ts") <= col("v_ts") + 604800L, "purchase")
          .when(col("c_ts").isNotNull &&
            col("c_ts") <= col("v_ts") + 604800L, "click")
          .when(col("v_ts").isNotNull, "view")
          .otherwise("none"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    }),
    // integer-exact PMI collocations: pointwise mutual information as
    // the monotone ratio proxy (N * n12 * 1e6) div (n1 * n2) — log is
    // monotone, so thresholding/ranking the ratio equals PMI without
    // libm. Products run in DecimalType(38,0): N*n12 and n1*n2 pass
    // 2^63 near ~1e13 corpus bigrams, decimal128 keeps them exact
    // (DuckDB HUGEINT covers the same domain); the final ppm stays
    // int64 while N*1e6/minCount < 2^63, i.e. N < ~4.6e13 bigrams at
    // minCount 5. Margin counts fold the already-grouped bigram table
    // (vocabulary-sized), never the raw explode — two tiny hash-aggs
    // joined back on the word keys
    "vocab_pmi_collocations" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val cnt = t(s, dir, "documents").select(explode(
          graft.functions.VectorFunctions.wordShingleStrings(
            col("text"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n12"))
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1))
      val total = cnt.agg(sum(col("n12"))).first().getLong(0)
      val m1 = cnt.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
      val m2 = cnt.groupBy(col("w2")).agg(sum(col("n12")).as("n2"))
      cnt.join(m1, Seq("w1")).join(m2, Seq("w2"))
        .filter(col("n12") >= 5)
        .withColumn("num", lit(total).cast(dec) * col("n12").cast(dec)
          * lit(1000000).cast(dec))
        .withColumn("den", col("n1").cast(dec) * col("n2").cast(dec))
        .select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
          expr("num div den").as("pmi_ppm"))
    }),
    // canonical text normalization: lowercase, collapse whitespace
    // runs to one space, trim — the first pass of every dedup /
    // tokenize chain. Pure per-row narrow map: no shuffle, fully
    // codegen'd, only (doc_id, text) reaches the scan
    "text_normalize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(lower(trim(col("text"))), "\\s+", " ")
            .as("norm_text"),
          length(col("text")).cast("long").as("n_chars_raw"))
        .withColumn("n_chars_norm",
          length(col("norm_text")).cast("long"))),
    // per-event local context: previous/next event type and gap
    // seconds within the same user — the sequence-model windowing
    // primitive. One shuffle on user_id; lag and lead share a single
    // window sort on the deterministic (ts_sec, event_id) total order
    // peak simultaneous activity per event type (each event holds its
    // slot for 30 min): the sweep-line in split-merge form — per-day
    // local sweeps + a metadata-sized per-day rollup walk, never one
    // serial pass over a key's whole timeline
    "events_concurrency_peak" -> ((s, dir) =>
      Windows.peakConcurrency(Tables.events(s, dir), col("event_type"),
          col("ts").cast("long"), holdSec = 1800L)
        .select(col("k").as("event_type"), col("peak_concurrency"))),
    "events_context_window" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"),
        col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_sec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      ev.select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_sec"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (col("ts_sec") - lag(col("ts_sec"), 1).over(w))
          .as("prev_gap_sec"),
        (lead(col("ts_sec"), 1).over(w) - col("ts_sec"))
          .as("next_gap_sec"))
    }),
    // per-source winsorization: clamp token counts into the nearest-
    // rank [p05, p95] band — the outlier-robust length normalizer
    // before source mixing. Nearest-rank (value at rank ceil(q*n),
    // integer (q*n+99) div 100) is exactly replayable cross-engine
    // where interpolated percentiles are not. The rank walk runs on a
    // per-source (n_tokens, count) HISTOGRAM — vocabulary-sized, so
    // the window sort never touches the doc stream and a hot source
    // cannot skew it; bounds broadcast back onto the scan
    "quality_winsorize_per_source" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("source"), TextOps.tokenCount(col("text")).as("n_tokens"))
      val hist = d.groupBy(col("source"), col("n_tokens"))
        .agg(count(lit(1)).as("c"))
      val bySrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          bySrc.orderBy(col("n_tokens"))))
        .withColumn("n", sum(col("c")).over(bySrc))
      val bounds = cum
        .withColumn("lo_rank", expr("(5 * n + 99) div 100"))
        .withColumn("hi_rank", expr("(95 * n + 99) div 100"))
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= col("lo_rank"), col("n_tokens")))
            .as("lo"),
          min(when(col("cum") >= col("hi_rank"), col("n_tokens")))
            .as("hi"))
      d.join(broadcast(bounds), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("n_tokens")))
            .as("n_tokens_w"))
    }),
    // integer-exact MAD outliers: flag docs whose token count sits
    // more than 3 median-absolute-deviations from the per-source
    // median — the robust sibling of quality_outlier_zscore (one wild
    // doc cannot drag the center the way it drags a mean). Both
    // medians are nearest-rank (value at rank ceil(n/2)) walked over
    // per-source HISTOGRAMS — first of n_tokens, then of |dev| —
    // so nothing ever sorts the doc stream and the arithmetic is
    // int64 end-to-end (no squares: |dev| and 3*MAD stay below the
    // token-count bound). A source with MAD 0 (constant lengths)
    // flags every non-median doc; documented, intended
    "quality_outlier_mad" -> ((s, dir) => {
      val bySrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      def medianOf(df: DataFrame, v: String, out: String): DataFrame =
        df.groupBy(col("source"), col(v)).agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(bySrc.orderBy(col(v))))
          .withColumn("n", sum(col("c")).over(bySrc))
          .groupBy(col("source"))
          .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col(v)))
            .as(out))
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("source"), TextOps.tokenCount(col("text")).as("n_tokens"))
      val med = medianOf(d, "n_tokens", "med")
      val dev = d.join(broadcast(med), Seq("source"))
        .withColumn("dev", abs(col("n_tokens") - col("med")))
      val mad = medianOf(dev, "dev", "mad")
      dev.join(broadcast(mad), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("med"), col("mad"),
          (col("dev") > lit(3L) * col("mad")).as("is_outlier"))
    }),
    // skip-gram co-occurrence pairs (word2vec training-data prep):
    // directed (center, context) counts within a +-2 token window.
    // No self-join, and ONE corpus scan/explode: bigram and trigram
    // shingles concatenate into one array (pair extraction first-
    // token/last-token reads identically off both — a trigram's
    // middle word is exactly the distance-2 skip), the reverse
    // direction appends the swapped pair strings INSIDE the same
    // array expression, and one hash-agg with map-side combine
    // finishes. Plan: Scan -> Generate -> partial agg -> one shuffle
    "vocab_skipgram_pairs" -> ((s, dir) => {
      val fwd = concat(
        graft.functions.VectorFunctions.wordShingleStrings(
          col("text"), 2),
        graft.functions.VectorFunctions.wordShingleStrings(
          col("text"), 3))
      val both = concat(fwd, transform(fwd, g => concat_ws(" ",
        substring_index(g, " ", -1), substring_index(g, " ", 1))))
      t(s, dir, "documents").select(explode(both).as("g"))
        .select(substring_index(col("g"), " ", 1).as("center"),
          substring_index(col("g"), " ", -1).as("context"))
        .groupBy(col("center"), col("context"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
    }),
    // hourly OHLC bars over the event value stream — the time-series
    // downsample every feature store ships. Open/close ride a single
    // struct min/max ordered by the deterministic (ts_sec, event_id)
    // total order (the unique tiebreak decides before the value field
    // can); money math in stable micro-units. One agg keyed by hour
    // with map-side combine — struct-min buffers aren't UnsafeRow-
    // mutable, so Spark plans partial SortAggregate rather than hash;
    // the partial sort is on the GROUPING key only, and event streams
    // arrive near time-ordered, so it's a near-linear run-merge, while
    // the shuffle still carries one row per (partition, hour). Volume
    // sums in decimal128 and lands back in int64 (exact while a bar's
    // total stays under 2^63 micro-units ~ 9.2e12 value units)
    "window_ohlc_hourly" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("ts").cast("long").as("ts_sec"),
        floor(col("value") * 1000000).cast("long").as("micro"))
        .withColumn("hour", expr("ts_sec div 3600"))
      ev.groupBy(col("hour"))
        .agg(
          min(struct(col("ts_sec"), col("event_id"), col("micro")))
            .getField("micro").as("open_micro"),
          max(col("micro")).as("high_micro"),
          min(col("micro")).as("low_micro"),
          max(struct(col("ts_sec"), col("event_id"), col("micro")))
            .getField("micro").as("close_micro"),
          count(lit(1)).as("n_events"),
          sum(col("micro").cast(dec)).cast("long").as("vol_micro"))
    }),
    // first-order Markov transition matrix over per-user event
    // sequences: directed (event_type -> next_type) counts with
    // integer-ppm row-normalized probabilities — the sequence prior
    // behind next-event prediction and anomaly scoring. One shuffle
    // on user_id for the lead(), then a tiny type-x-type hash-agg;
    // row totals ride a window over that matrix (NULL-type rows form
    // their own partition in both engines, so no join can drop them)
    "events_markov_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      val ev = Tables.events(s, dir).select(col("event_id"),
        col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_sec"))
      // gate on lead(ts_sec) — never NULL — so a real next event with
      // NULL type still counts as a transition into the NULL state
      val trans = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("next_ts", lead(col("ts_sec"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      trans
        .withColumn("total", sum(col("n")).over(byFrom))
        .select(col("event_type"), col("next_type"), col("n"),
          col("total"), expr("n * 1000000L div total").as("prob_ppm"))
    }),
    // per-source token-distribution diversity as integer-exact Gini
    // impurity: 1e6 - sum(n_i^2)*1e6 div N^2 — the mode-collapse /
    // template-spam audit (a source whose mass sits on few tokens
    // scores near 0). No float probabilities: squares and the N^2
    // denominator run in decimal128 (exact to 1e38; sum(n_i^2) passes
    // 2^63 once a source holds ~3e9 copies of one token), the final
    // ppm is int64. One explode + two vocabulary-keyed hash-aggs
    "vocab_gini_diversity" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val cnt = t(s, dir, "documents").select(col("source"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("n"))
      cnt.groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("n")).as("n_tokens"),
          sum(col("n").cast(dec) * col("n").cast(dec)).as("ss"))
        .withColumn("den",
          col("n_tokens").cast(dec) * col("n_tokens").cast(dec))
        .select(col("source"), col("n_types"), col("n_tokens"),
          (lit(1000000L) - expr("(ss * 1000000) div den"))
            .as("gini_ppm"))
    }),
    // language-ID confusion matrix: the n-gram heuristic's prediction
    // vs the labeled lang column, with integer-ppm row shares — the
    // eval-harness operator that turns a classifier into a gated
    // metric (a heuristic regression shifts a cell and fails the
    // hash). Tiny lang x lang hash-agg; shares ride a window over the
    // matrix so no join can drop a row
    "text_langid_confusion" -> ((s, dir) => {
      val m = t(s, dir, "documents").select(col("lang"),
          TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val byTrue = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
      m.withColumn("total", sum(col("n")).over(byTrue))
        .select(col("lang"), col("lang_pred"), col("n"), col("total"),
          expr("n * 1000000L div total").as("share_ppm"))
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
    })
  )

  // =====================================================================
  // Oracle SQL
  // =====================================================================

  /** Unrolled-CTE DuckDB replay of the iterative BPE trainer
    * ([[graft.ext.Corpus.bpeMerges]]), `rounds` rounds deep — the
    * dedup_clusters/kCenterCoreset oracle idiom: the loop the Spark
    * side runs on the driver is unrolled into static SQL so DuckDB
    * recomputes every round's pair counts, merge choice and
    * re-tokenization from scratch.
    *
    * Vocabulary state rides as a DOUBLE-SPACE-joined symbol string
    * ("  lo  w  e  r  "), so applying a merge is one plain
    * `replace(s, ' l  o ', ' lo ')`: each occurrence keeps one outer
    * space on each side, left-to-right non-overlapping replace = the
    * greedy BPE scan, and RE2's missing lookarounds never enter the
    * picture. Deliberately a DIFFERENT mechanism than the Spark
    * side's array fold — two independent derivations hash-matching is
    * the point of the oracle. Ends with vN (the final vocabulary
    * state) plus one tR CTE per round (that round's chosen merge);
    * the caller appends the final SELECT. */
  private def bpeCteSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """
      WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                   AS word FROM documents),
      v0 AS (SELECT CAST(count(*) AS BIGINT) AS wn,
               '  ' || array_to_string(list_transform(range(strlen(word)),
                   i -> substr(word, CAST(i + 1 AS INTEGER), 1)), '  ')
               || '  ' AS s
             FROM w GROUP BY word)"""
    for (r <- 1 to rounds) sb ++= s""",
      p$r AS (SELECT l[i+1] AS lft, l[i+2] AS rgt,
               CAST(sum(wn) AS BIGINT) AS n
             FROM (SELECT wn, list_filter(string_split(s, '  '),
                     x -> x <> '') AS l FROM v${r - 1}),
                  unnest(range(len(l) - 1)) AS u(i)
             GROUP BY 1, 2),
      t$r AS (SELECT lft, rgt, n FROM p$r
             ORDER BY n DESC, lft, rgt LIMIT 1),
      v$r AS (SELECT wn, CASE WHEN lft IS NULL THEN s ELSE
               replace(s, ' ' || lft || '  ' || rgt || ' ',
                       ' ' || lft || rgt || ' ') END AS s
             FROM v${r - 1} LEFT JOIN t$r ON TRUE)"""
    sb.result()
  }

  /** DuckDB twin of [[graft.ext.TextOps.hex60]]: 60-bit int from the
    * md5 hex prefix. */
  private def hex60Sql(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** Distinct (doc_id, shingle) pairs over 3-word shingles — DuckDB
    * twin of TextOps.wordShingles + array_distinct + explode (range of
    * a negative bound is empty, covering the <3-token case). */
  private val ShinglesCte =
    """tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |         FROM documents),
      |shraw AS (SELECT doc_id,
      |            unnest(list_transform(range(len(toks) - 2),
      |              i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
      |          FROM tok),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM shraw)""".stripMargin

  /** The 32 minhash signature aggregates: universal hashes
    * (a_i * base + b_i) mod 2^31-1 over the per-shingle md5 base —
    * exact integer twins of Dedup.minhashSignatures. */
  private val MinhashSigCols = (0 until 32).map(i =>
    s"min((${Dedup.minhashA(i)} * b + ${Dedup.minhashB(i)}) % " +
      s"${Dedup.MinhashP}) AS mh_$i").mkString(",\n       ")
  /** 8 bands x 4 rows: band structs for the bucket join. */
  private val MinhashBandStructs = (0 until 8).map(b =>
    s"{b: $b, k: [${(4 * b until 4 * b + 4).map(i => s"mh_$i").mkString(", ")}]}")
    .mkString(",\n         ")
  private val MinhashMatchTerms = (0 until 32).map(i =>
    s"(CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END)").mkString(" + ")

  /** The 60-bit simhash as a per-doc aggregate: per bit, sign of the
    * +1/-1 votes across distinct-token hashes (DuckDB twin of the
    * native SimHash64 expression over hex60 token hashes). */
  private val SimhashBitSum = (0 until 60).map(b =>
    s"(CASE WHEN SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
      s"THEN ${1L << b} ELSE 0 END)").mkString("\n         + ")

  /** Hyperplane-LSH near-dup pairs in SQL — exact twin of
    * Similarity.lshNearDupPairs/lshNearNeighbors: the plane count is
    * derived from count(*) with the same integer ceil-log2 formula as
    * autoPlanes, plane weights are recomputed from md5 exactly as
    * Similarity.planeWeight, projections fold left in declared order
    * (probed bit-identical to the native DotProduct), and candidates
    * are verified with the exact unit-vector cosine. */
  private def lshPairsSql(tables: Int, threshold: Double): String = s"""
      WITH np_t AS (
        SELECT GREATEST(4, LEAST(16,
                 CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END)) AS np
        FROM (SELECT (count(*) + 63) // 64 AS m FROM embeddings)),
      pl AS (SELECT unnest(range(0, $tables * np)) AS pi FROM np_t),
      w AS (SELECT pi, list_transform(range(0, 64), d ->
              (CAST('0x' || substr(md5(CAST(pi AS VARCHAR) || ',' ||
                 CAST(d AS VARCHAR)), 1, 15) AS BIGINT)
               % 2000001 - 1000000) / 1000000.0) AS wv
            FROM pl),
      proj AS (SELECT e.vec_id, w.pi,
                 list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * w.wv[i])) AS proj
               FROM embeddings e CROSS JOIN w),
      sigs AS (SELECT vec_id, pi // np AS tbl,
                 SUM(CASE WHEN proj >= 0
                     THEN (CAST(1 AS BIGINT) << CAST(pi % np AS INTEGER))
                     ELSE CAST(0 AS BIGINT) END) AS sig
               FROM proj CROSS JOIN np_t GROUP BY vec_id, pi // np),
      cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
               FROM sigs x JOIN sigs y
                 ON x.tbl = y.tbl AND x.sig = y.sig
                AND x.vec_id < y.vec_id),
      nv AS (SELECT vec_id, $NormSql AS nv FROM embeddings)
      SELECT vec_a, vec_b, cosine FROM (
        SELECT vec_a, vec_b, ${dotSql("a.nv", "b.nv")} AS cosine
        FROM cand
        JOIN nv a ON a.vec_id = cand.vec_a
        JOIN nv b ON b.vec_id = cand.vec_b)
      WHERE cosine >= $threshold"""

  /** DuckDB twin of Similarity.ivfTopK with Lloyd-refined centroids:
    * the same deterministic init, `iters` rounds of argmax assignment
    * (row_number total order), micro-quantized per-dimension means
    * (order-proof integer sums) and in-order renormalization — an
    * ITERATIVE model fit that still hash-matches across engines. The
    * centroid count is derived from count(*) with the same integer
    * power-of-two-near-sqrt formula as [[Similarity.autoCentroids]]. */
  /** The Lloyd-fit + final-assignment CTE block (nv through ca) —
    * shared by the IVF search oracle and the standalone k-means
    * assignment oracle. Emits `ca(vec_id, centroid_id, v)`. */
  private def ivfAssignCtes(iters: Int): String = {
    val iterCtes = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (SELECT vec_id, centroid_id, v FROM (
         |    SELECT nv.vec_id, $prev.centroid_id, nv.v,
         |           row_number() OVER (PARTITION BY nv.vec_id
         |             ORDER BY ${dotSql("nv.v", s"$prev.cv")} DESC,
         |                      $prev.centroid_id) AS rn
         |    FROM nv CROSS JOIN $prev) WHERE rn = 1),
         |m$it AS (SELECT centroid_id, d,
         |       (SUM(CAST(FLOOR(v[d+1]*1000000) AS BIGINT)) / 1000000.0)
         |         / count(*) AS m
         |     FROM a$it CROSS JOIN range(0, 64) r(d)
         |     GROUP BY centroid_id, d),
         |g$it AS (SELECT centroid_id, list(m ORDER BY d) AS mv
         |       FROM m$it GROUP BY centroid_id),
         |n$it AS (SELECT centroid_id, list_transform(mv,
         |         x -> x / sqrt(list_sum(list_transform(mv, y -> y*y))))
         |         AS cv FROM g$it),
         |c$it AS (SELECT p.centroid_id, COALESCE(n$it.cv, p.cv) AS cv
         |       FROM $prev p LEFT JOIN n$it USING (centroid_id))"""
        .stripMargin
    }.mkString(",\n      ")
    s"""nv AS (SELECT vec_id, $NormSql AS v FROM embeddings),
      nc_t AS (SELECT GREATEST(4, LEAST(4096,
                 CASE WHEN n <= 1 THEN 1
                      ELSE (CAST(1 AS BIGINT)
                            << CAST((length(bin(n - 1)) + 1) // 2 AS INTEGER))
                 END)) AS nc
               FROM (SELECT count(*) AS n FROM embeddings)),
      c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM
               (SELECT vec_id, v,
                       row_number() OVER (ORDER BY vec_id) AS rn FROM nv)
             CROSS JOIN nc_t WHERE rn <= nc),
      $iterCtes,
      ca AS (SELECT vec_id, centroid_id, v FROM (
          SELECT nv.vec_id, c$iters.centroid_id, nv.v,
                 row_number() OVER (PARTITION BY nv.vec_id
                   ORDER BY ${dotSql("nv.v", s"c$iters.cv")} DESC,
                            c$iters.centroid_id) AS rn
          FROM nv CROSS JOIN c$iters) WHERE rn = 1)"""
  }

  private def ivfTopKSql(k: Int, nProbe: Int, iters: Int): String = {
    s"""
      WITH ${ivfAssignCtes(iters)},
      q AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id < 10),
      qp AS (SELECT query_id, centroid_id, qv FROM (
          SELECT q.query_id, c$iters.centroid_id, q.qv,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${dotSql("q.qv", s"c$iters.cv")} DESC,
                            c$iters.centroid_id) AS rn
          FROM q CROSS JOIN c$iters) WHERE rn <= $nProbe),
      scored AS (SELECT query_id, ca.vec_id AS neighbor_id,
                   ${dotSql("qp.qv", "ca.v")} AS cosine
                 FROM qp JOIN ca USING (centroid_id)
                 WHERE query_id <> ca.vec_id)
      SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank FROM scored
            WHERE NOT isnan(cosine))
      WHERE rank <= $k"""
  }

  /** DuckDB twin of Similarity.pqTopK: the same deterministic init
    * (lowest `ksub` ids' subvectors, codeword id = vec id), `iters`
    * rounds of per-subspace Lloyd (argmax of `<x,c> - ||c||^2/2`
    * with row_number total order, micro-quantized per-dim means, NO
    * renormalization — PQ codewords are plain L2 means), then integer
    * ADC: per-query lookup tables of `floor(subdot * 1e6)` summed
    * over the m subspaces. The score sum is BIGINT, so the ranking
    * order is exact on both engines. */
  /** SQL twin of Similarity.int8RerankTopK: symmetric round-half-up
    * int8 codes on the unit vector (`FLOOR(nv*127.0 + 0.5)` — one
    * double expression shape, bit-identical across engines), integer
    * dot shortlist of k*candMult with id tiebreak, exact double
    * rerank. Zero vectors (NaN after normalize) dropped before
    * quantizing on both engines — FLOOR(NaN) casts differently per
    * engine. */
  private def int8RerankSql(k: Int, candMult: Int): String = s"""
    WITH n AS (SELECT vec_id, $NormSql AS nv FROM embeddings),
    nz AS (SELECT vec_id, nv,
             list_transform(nv,
               x -> CAST(FLOOR(x*127.0 + 0.5) AS BIGINT)) AS code
           FROM n WHERE NOT isnan(nv[1])),
    q AS (SELECT vec_id AS query_id, nv AS qv, code AS qc
          FROM nz WHERE vec_id < 10),
    cand AS (
      SELECT query_id, e.vec_id AS neighbor_id, qv, e.nv AS cv,
             list_sum(list_transform(range(1,65),
               i -> qc[i]*e.code[i])) AS iscore
      FROM q, nz e WHERE query_id <> e.vec_id),
    topc AS (
      SELECT query_id, neighbor_id, qv, cv
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY iscore DESC, neighbor_id) AS r FROM cand)
      WHERE r <= ${k * candMult}),
    rer AS (SELECT query_id, neighbor_id,
                   ${dotSql("qv", "cv")} AS cosine FROM topc)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank FROM rer)
    WHERE rank <= $k"""

  private def pqTopKSql(dim: Int, m: Int, ksub: Int, k: Int,
                        shortlist: Int, iters: Int): String = {
    val dsub = dim / m
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${dsub + 1}), i -> $a[i]*$b[i]))"
    val iterCtes = (1 to iters).map { it =>
      val prev = s"b${it - 1}"
      s"""pa$it AS (SELECT vec_id, j, code_id, xj FROM (
         |    SELECT s.vec_id, s.j, $prev.code_id, s.xj,
         |           row_number() OVER (PARTITION BY s.vec_id, s.j
         |             ORDER BY ${dotSub("s.xj", s"$prev.scv")}
         |                      - 0.5 * ${dotSub(s"$prev.scv", s"$prev.scv")}
         |                      DESC, $prev.code_id) AS rn
         |    FROM sub s JOIN $prev ON s.j = $prev.j) WHERE rn = 1),
         |pm$it AS (SELECT j, code_id, d,
         |       (SUM(CAST(FLOOR(xj[d+1]*1000000) AS BIGINT)) / 1000000.0)
         |         / count(*) AS mval
         |     FROM pa$it CROSS JOIN range(0, $dsub) r(d)
         |     GROUP BY j, code_id, d),
         |pg$it AS (SELECT j, code_id, list(mval ORDER BY d) AS mv
         |       FROM pm$it GROUP BY j, code_id),
         |b$it AS (SELECT p.j, p.code_id, COALESCE(pg$it.mv, p.scv) AS scv
         |       FROM $prev p LEFT JOIN pg$it USING (j, code_id))"""
        .stripMargin
    }.mkString(",\n      ")
    s"""
      WITH nv AS (SELECT vec_id, $NormSql AS v FROM embeddings),
      sub AS (SELECT vec_id, j, v[j*$dsub+1 : j*$dsub+$dsub] AS xj
              FROM nv CROSS JOIN range(0, $m) r(j)),
      b0 AS (SELECT j, vec_id AS code_id, xj AS scv FROM sub
             WHERE vec_id IN (SELECT vec_id FROM nv
                              ORDER BY vec_id LIMIT $ksub)),
      $iterCtes,
      codes AS (SELECT vec_id, j, code_id FROM (
          SELECT s.vec_id, s.j, b$iters.code_id,
                 row_number() OVER (PARTITION BY s.vec_id, s.j
                   ORDER BY ${dotSub("s.xj", s"b$iters.scv")}
                            - 0.5 * ${dotSub(s"b$iters.scv", s"b$iters.scv")}
                            DESC, b$iters.code_id) AS rn
          FROM sub s JOIN b$iters ON s.j = b$iters.j) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, j, xj AS qj FROM sub
            WHERE vec_id < 10),
      lut AS (SELECT q.query_id, b.j, b.code_id,
               CAST(FLOOR(${dotSub("q.qj", "b.scv")} * 1000000) AS BIGINT)
                 AS pd
              FROM q JOIN b$iters b ON q.j = b.j),
      adc AS (SELECT l.query_id, c.vec_id AS neighbor_id,
                   CAST(SUM(l.pd) AS BIGINT) AS score_micro
                 FROM codes c
                 JOIN lut l ON l.j = c.j AND l.code_id = c.code_id
                 WHERE l.query_id <> c.vec_id
                 GROUP BY 1, 2),
      short AS (SELECT query_id, neighbor_id FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micro DESC, neighbor_id) AS srn FROM adc)
        WHERE srn <= $shortlist),
      rer AS (SELECT s.query_id, s.neighbor_id,
                ${dotSql("qn.v", "cn.v")} AS cosine
              FROM short s
              JOIN nv qn ON qn.vec_id = s.query_id
              JOIN nv cn ON cn.vec_id = s.neighbor_id)
      SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank FROM rer
            WHERE NOT isnan(cosine))
      WHERE rank <= $k"""
  }

  /** The 0.8-Jaccard pair graph of `docsSel` (any (doc_id, text)
    * relation) as CTEs through the symmetric `edges` set — shared by
    * the clustering oracles and graph_pagerank. */
  private def pairGraphCtes(docsSel: String): String =
    s"""docs AS ($docsSel),
      tokraw AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM docs),
      toks AS (
        SELECT doc_id, token FROM tokraw
        WHERE token NOT IN (SELECT token FROM tokraw
                            GROUP BY token HAVING count(*) > 500)),
      sizes AS (SELECT doc_id, count(*) AS n_tokens FROM tokraw GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT doc_a, doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * 1.0 / (sa.n_tokens + sb.n_tokens - n_inter) >= 0.8),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs)"""

  /** Min-label-propagation connected-components CTE block over the
    * 0.8-Jaccard pair graph — the recursive-CTE twin of
    * Dedup.connectedComponents' pointer jumping. Emits the `walk`
    * CTE; callers append their own final aggregation. Shared by
    * dedup_clusters, dedup_keep_representative and the curation
    * pipeline oracle. */
  private def clustersCtes(docsSel: String): String =
    s"""${pairGraphCtes(docsSel)},
      walk(node, lbl) AS (
        SELECT doc_id, doc_id FROM docs
        UNION
        SELECT e.src, w.lbl FROM walk w JOIN edges e ON e.dst = w.node)"""

  private val DedupClustersSql: String =
    s"""WITH RECURSIVE
      ${clustersCtes("SELECT doc_id, text FROM documents")}
      SELECT node AS doc_id, min(lbl) AS component
      FROM walk GROUP BY node"""

  /** SQL twin of Sampling.bucket (salt ""). */
  private def bucketSql(key: String): String =
    s"(${hex60Sql(s"CAST($key AS VARCHAR)")} % ${Sampling.Buckets})"

  /** Distinct (id, word-n-shingle) rows over a filtered documents
    * slice — the generalized ShinglesCte (any n, any filter). */
  private def shingleSetSql(n: Int, filter: String, idAs: String): String =
    s"""(SELECT DISTINCT doc_id AS $idAs,
       |    unnest(list_transform(
       |      range(len(regexp_split_to_array(trim(text), '\\s+')) - ${n - 1}),
       |      i -> array_to_string(
       |        (regexp_split_to_array(trim(text), '\\s+'))[i+1:i+$n], ' ')))
       |      AS shingle
       |  FROM documents WHERE $filter)""".stripMargin

  /** The MinHash-LSH pair oracle (signatures -> band buckets ->
    * candidate pairs -> match-fraction estimate), with an optional
    * extra predicate on the final pair set — shared by the full and
    * incremental dedup oracles. */
  private def minhashPairsSql(extraWhere: String = ""): String = s"""
      WITH $ShinglesCte,
      bs AS (SELECT doc_id, ${hex60Sql("shingle")} % ${Dedup.MinhashP} AS b
             FROM sh),
      sig AS (SELECT doc_id,
       $MinhashSigCols
       FROM bs GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([
         $MinhashBandStructs]) AS bk FROM sig),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.bk = y.bk AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, est_jaccard FROM (
        SELECT doc_a, doc_b,
               ($MinhashMatchTerms) * 1.0 / 32 AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = cand.doc_a
        JOIN sig sb ON sb.doc_id = cand.doc_b)
      WHERE est_jaccard >= 0.5$extraWhere"""

  /** The greedy first-fit recursive walk shared by both packing
    * oracles; `select` picks the exposed columns (walk's `fill` is
    * the running total AFTER the current doc, so its bin offset is
    * `fill - n_tokens`). */
  private def packWalkSql(select: String): String = s"""
      WITH RECURSIVE ng_t AS (SELECT GREATEST(8, LEAST(1048576,
            CASE WHEN m <= 1 THEN 1
                 ELSE (CAST(1 AS BIGINT)
                       << CAST(length(bin(m - 1)) AS INTEGER)) END)) AS ng
          FROM (SELECT (count(*) + 63) // 64 AS m FROM documents)),
      g AS (SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
          ${bucketSql("doc_id")} % ng AS pack_group,
          row_number() OVER (PARTITION BY ${bucketSql("doc_id")} % ng
            ORDER BY doc_id) AS rn
        FROM documents CROSS JOIN ng_t),
      walk(pack_group, rn, doc_id, n_tokens, bin_id, fill) AS (
        SELECT pack_group, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT), n_tokens
        FROM g WHERE rn = 1
        UNION ALL
        SELECT g.pack_group, g.rn, g.doc_id, g.n_tokens,
               CASE WHEN w.fill + g.n_tokens > 512
                    THEN w.bin_id + 1 ELSE w.bin_id END,
               CASE WHEN w.fill + g.n_tokens > 512
                    THEN g.n_tokens ELSE w.fill + g.n_tokens END
        FROM walk w JOIN g
          ON g.pack_group = w.pack_group AND g.rn = w.rn + 1)
      SELECT $select FROM walk"""

  val oracleSql: Map[String, String] = Map(
    // exact greedy first-fit replayed as a recursive walk per group;
    // the group count is derived from count(*) with the same integer
    // formula as Packing.autoGroups (~64 docs/group, power of two)
    "pack_sequences" ->
      packWalkSql("doc_id, n_tokens, pack_group, bin_id"),
    "pack_with_positions" -> packWalkSql(
      "doc_id, n_tokens, pack_group, bin_id, fill - n_tokens AS seq_start"),
    "contamination_check" -> s"""
      WITH shA AS ${shingleSetSql(13, "doc_id % 20 <> 0", "train_id")},
      hA AS (SELECT train_id, ${hex60Sql("shingle")} AS h FROM shA),
      hot AS (SELECT h FROM hA GROUP BY h HAVING count(*) > 500),
      hA2 AS (SELECT train_id, h FROM hA
              WHERE h NOT IN (SELECT h FROM hot)),
      shB AS ${shingleSetSql(13, "doc_id % 20 = 0", "test_id")},
      hB AS (SELECT test_id, ${hex60Sql("shingle")} AS h FROM shB)
      SELECT train_id, test_id, count(*) AS n_shared_shingles
      FROM hA2 JOIN hB USING (h) GROUP BY 1, 2""",
    // contamination REMOVAL: the overlap oracle's CTEs re-used, then
    // the cleaned train corpus summarized per source
    "decontaminate_corpus" -> s"""
      WITH shA AS ${shingleSetSql(13, "doc_id % 20 <> 0", "train_id")},
      hA AS (SELECT train_id, ${hex60Sql("shingle")} AS h FROM shA),
      hot AS (SELECT h FROM hA GROUP BY h HAVING count(*) > 500),
      hA2 AS (SELECT train_id, h FROM hA
              WHERE h NOT IN (SELECT h FROM hot)),
      shB AS ${shingleSetSql(13, "doc_id % 20 = 0", "test_id")},
      hB AS (SELECT test_id, ${hex60Sql("shingle")} AS h FROM shB),
      ov AS (SELECT train_id, test_id, count(*) AS n_shared
             FROM hA2 JOIN hB USING (h) GROUP BY 1, 2),
      bad AS (SELECT DISTINCT train_id FROM ov WHERE n_shared >= 5)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
               AS BIGINT) AS n_tokens
      FROM documents
      WHERE doc_id % 20 <> 0
        AND doc_id NOT IN (SELECT train_id FROM bad)
      GROUP BY source""",
    // the composed v2 flagship: every stage's oracle fragment reused
    // in sequence — C4 CTEs, md5 exact-dedup, the recursive cluster
    // walk, 13-gram decontamination over the CURATED train slice (hot
    // shingle df computed on the same slice the Spark side uses), then
    // the quality-scored budget cumsum
    "corpus_curation_v2" -> s"""
      WITH RECURSIVE
      base AS (SELECT doc_id, source, text,
          regexp_split_to_array(trim(text), '\\s+') AS btoks,
          ' ' || lower(text) || ' ' AS p
        FROM documents),
      c4 AS (SELECT doc_id, source, text FROM base
        WHERE len(btoks) >= 10
          AND (contains(p, ' the ') OR contains(p, ' a '))
          AND CAST(len(list_distinct(btoks)) AS BIGINT) * 1000000
              // CAST(len(btoks) AS BIGINT) >= 300000
          AND NOT contains(lower(text), '{')
          AND NOT contains(lower(text), 'lorem ipsum')),
      ex AS (SELECT doc_id, source, text FROM (
          SELECT doc_id, source, text,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          FROM c4) WHERE doc_id = keeper),
      ${clustersCtes("SELECT doc_id, text FROM ex")},
      comp AS (SELECT node AS doc_id, min(lbl) AS component
               FROM walk GROUP BY node),
      corpus AS (SELECT ex.doc_id, ex.source, ex.text FROM ex
                 JOIN comp USING (doc_id) WHERE component = ex.doc_id),
      train AS (SELECT * FROM corpus WHERE doc_id % 20 <> 0),
      shA AS (SELECT DISTINCT doc_id AS train_id,
          unnest(list_transform(
            range(len(regexp_split_to_array(trim(text), '\\s+')) - 12),
            i -> array_to_string(
              (regexp_split_to_array(trim(text), '\\s+'))[i+1:i+13], ' ')))
            AS shingle
        FROM train),
      hA AS (SELECT train_id, ${hex60Sql("shingle")} AS h FROM shA),
      hot AS (SELECT h FROM hA GROUP BY h HAVING count(*) > 500),
      hA2 AS (SELECT train_id, h FROM hA
              WHERE h NOT IN (SELECT h FROM hot)),
      shB AS ${shingleSetSql(13, "doc_id % 20 = 0", "test_id")},
      hB AS (SELECT test_id, ${hex60Sql("shingle")} AS h FROM shB),
      ov AS (SELECT train_id, test_id, count(*) AS n_shared
             FROM hA2 JOIN hB USING (h) GROUP BY 1, 2),
      bad AS (SELECT DISTINCT train_id FROM ov WHERE n_shared >= 5),
      clean AS (SELECT doc_id, source, text FROM train
                WHERE doc_id NOT IN (SELECT train_id FROM bad)),
      t2 AS (SELECT doc_id, source, text,
          ' ' || lower(text) || ' ' AS p FROM clean),
      m AS (SELECT doc_id, source,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens,
          length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
            AS n_punct,
          ${scoreSql("en")} AS c_en
        FROM t2),
      q2 AS (SELECT doc_id, source, n_tokens,
          least(1.0, n_tokens / 50.0) * 0.4
            + least(1.0, (c_en * 1.0 / n_tokens) * 5.0) * 0.3
            + (1.0 - least(1.0, (n_punct * 1.0 / n_chars) * 10.0)) * 0.3
            AS quality_score
        FROM m),
      sel AS (SELECT source, doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY quality_score DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM q2 WHERE NOT isnan(quality_score))
      SELECT source, doc_id, n_tokens, cum_tokens
      FROM sel WHERE cum_tokens <= 500""",
    "sample_deterministic" -> s"""
      SELECT doc_id FROM documents
      WHERE ${bucketSql("doc_id")} < ${(0.1 * Sampling.Buckets).toLong}""",
    // exactly-k per source under the salted hash order — the heap
    // aggregate's (bucket asc, doc_id asc) total order replayed as a
    // window rank
    "sample_fixed_per_group" -> s"""
      SELECT source, doc_id, rank FROM (
        SELECT source, doc_id,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY ${hex60Sql("'grpk' || CAST(doc_id AS VARCHAR)")}
              % ${Sampling.Buckets}, doc_id) AS BIGINT) AS rank
        FROM documents)
      WHERE rank <= 10""",
    "sample_train_val_split" -> s"""
      SELECT doc_id,
             CASE WHEN ${bucketSql("doc_id")}
                    < ${(0.1 * Sampling.Buckets).toLong} THEN 'test'
                  WHEN ${bucketSql("doc_id")}
                    < ${(0.2 * Sampling.Buckets).toLong} THEN 'val'
                  ELSE 'train' END AS split
      FROM documents""",
    "sample_stratified" -> s"""
      SELECT event_id, event_type FROM events
      WHERE ${bucketSql("event_id")} < ${
        SampleRates.toSeq.sortBy(_._1).map { case (k, r) =>
          s"WHEN '$k' THEN ${(r * Sampling.Buckets).toLong}"
        }.mkString("CASE event_type ", " ", s" ELSE ${(0.05 * Sampling.Buckets).toLong} END")}""",
    "sample_weighted_length" -> s"""
      SELECT doc_id, n_chars FROM documents
      WHERE (${hex60Sql("'wsample' || CAST(doc_id AS VARCHAR)")}
               % ${Sampling.Buckets})
              * (SELECT max(n_chars) FROM documents)
            < n_chars * ${Sampling.Buckets}""",
    "sample_fixed_size" -> s"""
      SELECT doc_id FROM documents
      ORDER BY ${bucketSql("doc_id")}, doc_id LIMIT 100""",
    "sample_group_split" -> s"""
      SELECT doc_id, source,
             CASE WHEN (${hex60Sql("'grp' || source")} % ${Sampling.Buckets})
                    < ${(0.1 * Sampling.Buckets).toLong} THEN 'test'
                  WHEN (${hex60Sql("'grp' || source")} % ${Sampling.Buckets})
                    < ${(0.2 * Sampling.Buckets).toLong} THEN 'val'
                  ELSE 'train' END AS split
      FROM documents""",
    // same quality-score arithmetic as text_quality_score, ranked per
    // source under the heap aggregate's total order (score desc, id)
    "curate_topk_per_source" -> s"""
      WITH t AS (SELECT doc_id, source, text,
          ' ' || lower(text) || ' ' AS p FROM documents),
      m AS (SELECT doc_id, source,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens,
          length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
            AS n_punct,
          ${scoreSql("en")} AS c_en
        FROM t),
      q AS (SELECT doc_id, source,
          least(1.0, n_tokens / 50.0) * 0.4
            + least(1.0, (c_en * 1.0 / n_tokens) * 5.0) * 0.3
            + (1.0 - least(1.0, (n_punct * 1.0 / n_chars) * 10.0)) * 0.3
            AS quality_score
        FROM m)
      SELECT source, doc_id, quality_score,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank
      FROM q WHERE NOT isnan(quality_score) QUALIFY rank <= 5""",
    // same quality CTEs, then a strict-prefix cumsum under the same
    // (quality desc, doc_id) total order, kept while <= budget
    "curate_token_budget" -> s"""
      WITH t AS (SELECT doc_id, source, text,
          ' ' || lower(text) || ' ' AS p FROM documents),
      m AS (SELECT doc_id, source,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens,
          length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
            AS n_punct,
          ${scoreSql("en")} AS c_en
        FROM t),
      q AS (SELECT doc_id, source, n_tokens,
          least(1.0, n_tokens / 50.0) * 0.4
            + least(1.0, (c_en * 1.0 / n_tokens) * 5.0) * 0.3
            + (1.0 - least(1.0, (n_punct * 1.0 / n_chars) * 10.0)) * 0.3
            AS quality_score
        FROM m),
      c AS (SELECT source, doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY quality_score DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM q WHERE NOT isnan(quality_score))
      SELECT source, doc_id, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 500""",
    // same quality CTEs, hash shard, per-shard quality order
    "sink_curriculum_shards" -> s"""
      WITH t AS (SELECT doc_id, text,
          ' ' || lower(text) || ' ' AS p FROM documents),
      m AS (SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens,
          length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
            AS n_punct,
          ${scoreSql("en")} AS c_en
        FROM t),
      q AS (SELECT doc_id,
          least(1.0, n_tokens / 50.0) * 0.4
            + least(1.0, (c_en * 1.0 / n_tokens) * 5.0) * 0.3
            + (1.0 - least(1.0, (n_punct * 1.0 / n_chars) * 10.0)) * 0.3
            AS quality_score
        FROM m),
      sh2 AS (SELECT doc_id, quality_score,
          (${hex60Sql("'shard' || CAST(doc_id AS VARCHAR)")}
             % ${Sampling.Buckets}) % 8 AS shard
        FROM q WHERE NOT isnan(quality_score))
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(row_number() OVER (PARTITION BY shard
               ORDER BY quality_score DESC, doc_id) AS BIGINT) AS position,
             doc_id
      FROM sh2""",
    // bigram counts (same split as vocab_top_bigrams), per-first-word
    // totals + rank, integer-ppm conditionals
    "vocab_bigram_conditionals" -> """
      WITH tok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
          i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        FROM tok WHERE len(toks) >= 2),
      cnt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n,
          split_part(bigram, ' ', 1) AS w1,
          split_part(bigram, ' ', 2) AS w2
        FROM bg GROUP BY 1),
      ranked AS (SELECT w1, w2, n,
          CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS total,
          CAST(row_number() OVER (PARTITION BY w1
            ORDER BY n DESC, w2) AS BIGINT) AS rank
        FROM cnt)
      SELECT w1, w2, n, total,
        CAST(n * 1000000 // total AS BIGINT) AS cond_ppm, rank
      FROM ranked WHERE total >= 10 AND rank <= 3""",
    "balance_event_classes" -> s"""
      WITH c AS (SELECT event_type AS cls, count(*) AS n
                 FROM events GROUP BY 1),
      m AS (SELECT min(n) AS mn FROM c)
      SELECT e.event_id, e.event_type
      FROM events e
      JOIN c ON e.event_type IS NOT DISTINCT FROM c.cls CROSS JOIN m
      WHERE (${hex60Sql("'bal' || CAST(event_id AS VARCHAR)")}
               % ${Sampling.Buckets}) * c.n
            < m.mn * ${Sampling.Buckets}""",
    // domain mixing: the limiting class is selected by the
    // integer-quantized ratio floor(n*1e6/W) with (n, W, class)
    // lexicographic tie-break — the portable argmin contract
    // mixToTargets documents; the keep rule is exact BIGINT
    // cross-multiplication on the row's hash bucket
    "sample_domain_mixture" -> s"""
      WITH w(cls, wt) AS (VALUES
          ('click', CAST(5 AS BIGINT)),
          ('view', CAST(3 AS BIGINT)),
          ('purchase', CAST(2 AS BIGINT))),
      c AS (SELECT event_type AS cls, count(*) AS n
            FROM events JOIN w ON event_type = w.cls GROUP BY 1),
      j AS (SELECT cls, n, wt FROM c JOIN w USING (cls)),
      lim AS (SELECT n AS n0, wt AS w0 FROM j
              ORDER BY n * 1000000 // wt, n, wt, cls LIMIT 1)
      SELECT e.event_id, e.event_type
      FROM events e JOIN j ON e.event_type = j.cls CROSS JOIN lim
      WHERE ${bucketSql("event_id")} * lim.w0 * j.n
            < lim.n0 * j.wt * ${Sampling.Buckets}""",
    // temperature mixing: weights are floor(sqrt(n)) — IEEE requires
    // sqrt to be correctly rounded, so the weights are bit-identical
    // across engines; anchor by quantized-argmax of floor(w*1e6/n)
    // with (n, w, class) tie-break, then per-class keep fractions
    // quantize once to integer ppm (HUGEINT == the Scala side's
    // BigInt) and the filter is bucket < keep_ppm
    "sample_temperature_mixture" -> s"""
      WITH c AS (SELECT event_type AS cls, count(*) AS n
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      w AS (SELECT cls, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
            FROM c),
      anc AS (SELECT n AS n0, wt AS w0 FROM w
              ORDER BY wt * 1000000 // n DESC, n, wt, cls LIMIT 1),
      ppm AS (SELECT cls,
              CAST(CAST(wt AS HUGEINT) * n0 * 1000000
                   // (CAST(n AS HUGEINT) * w0) AS BIGINT) AS keep_ppm
              FROM w CROSS JOIN anc)
      SELECT e.event_id, e.event_type
      FROM events e JOIN ppm ON e.event_type = ppm.cls
      WHERE (${hex60Sql("'temp' || CAST(event_id AS VARCHAR)")}
             % ${Sampling.Buckets}) < ppm.keep_ppm""",
    // zipped unnests replay the non-overlapping 8-word chunking; the
    // keep-first min runs over the SAME hex60 hash groups as Spark (a
    // 60-bit collision would merge identically on both engines)
    "dedup_repeated_segments" -> s"""
      WITH tok AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
      seg AS (SELECT doc_id,
          unnest(range((len(toks) + 7) // 8)) AS seg_idx,
          unnest(list_transform(range((len(toks) + 7) // 8),
            i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS seg
        FROM tok),
      k AS (SELECT doc_id, seg_idx, seg,
          (doc_id * ${Corpus.SegStride} + seg_idx)
            = min(doc_id * ${Corpus.SegStride} + seg_idx)
                OVER (PARTITION BY ${hex60Sql("seg")}) AS keep
        FROM seg)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
        CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
        md5(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep))
          AS dedup_md5
      FROM k GROUP BY doc_id""",
    // zipped unnests replay the 64-token chunking; per-chunk token
    // count is recomputed from the chunk text exactly like Spark
    "chunk_documents" -> """
      WITH tok AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      seg AS (SELECT doc_id,
          unnest(range((len(toks) + 63) // 64)) AS chunk_idx,
          unnest(list_transform(range((len(toks) + 63) // 64),
            i -> array_to_string(toks[i*64+1 : i*64+64], ' '))) AS seg
        FROM tok)
      SELECT doc_id, chunk_idx,
        CAST(len(regexp_split_to_array(trim(seg), '\s+')) AS BIGINT)
          AS n_tokens,
        md5(seg) AS chunk_md5
      FROM seg""",
    // bin = number of binary digits of the term count (floor(log2)+1):
    // Spark length(bin(x)) == DuckDB length(bin(x)) for x >= 1
    "vocab_freq_histogram" -> """
      WITH tf AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
          AS term FROM documents),
      c AS (SELECT term, count(*) AS occ FROM tf GROUP BY 1)
      SELECT CAST(length(bin(occ)) AS BIGINT) AS df_bucket,
        CAST(count(*) AS BIGINT) AS n_terms,
        CAST(sum(occ) AS BIGINT) AS n_occurrences
      FROM c GROUP BY 1""",
    // n_words >= 1 always (trim of a non-empty doc splits to >= 1
    // token), so the integer floor-div cannot hit zero
    "text_c4_filter" -> """
      WITH t AS (SELECT doc_id, text,
          regexp_split_to_array(trim(text), '\s+') AS toks,
          ' ' || lower(text) || ' ' AS p
        FROM documents),
      m AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(len(list_distinct(toks)) AS BIGINT) * 1000000
            // CAST(len(toks) AS BIGINT) AS distinct_ppm,
          (contains(p, ' the ') OR contains(p, ' a ')) AS has_stopword,
          NOT contains(lower(text), '{') AS no_brace,
          NOT contains(lower(text), 'lorem ipsum') AS no_lorem
        FROM t)
      SELECT doc_id, n_words, distinct_ppm,
        n_words >= 10 AS min_words, has_stopword,
        distinct_ppm >= 300000 AS diverse, no_brace, no_lorem,
        (n_words >= 10 AND has_stopword AND distinct_ppm >= 300000
          AND no_brace AND no_lorem) AS keep
      FROM m""",
    // Gopher shape rules: every metric an integer-ppm floor-div over
    // the same token/line splits Spark uses; stopword hits are exact
    // token membership (list_contains), not substring
    "text_gopher_filter" -> """
      WITH t AS (SELECT doc_id, text,
          regexp_split_to_array(trim(text), '\s+') AS toks,
          string_split(text, chr(10)) AS lines
        FROM documents),
      m AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          greatest(CAST(len(lines) AS BIGINT), 1) AS n_lines,
          CAST(list_sum(list_transform(toks, tk -> length(tk))) AS BIGINT)
            * 1000000 // greatest(CAST(len(toks) AS BIGINT), 1)
            AS mean_word_len_ppm,
          CAST(len(list_filter(toks,
              tk -> regexp_matches(tk, '[a-zA-Z]'))) AS BIGINT) * 1000000
            // greatest(CAST(len(toks) AS BIGINT), 1) AS alpha_ppm,
          ((length(text) - length(replace(text, '#', ''))) +
           (length(text) - length(replace(text, '...', ''))) // 3)
            * 1000000 // greatest(CAST(len(toks) AS BIGINT), 1)
            AS symbol_ppm,
          CAST(len(list_filter(lines, l -> starts_with(l, '- ')
              OR starts_with(l, '* '))) AS BIGINT) AS n_bullet,
          CAST(len(list_filter(lines, l -> ends_with(l, '...')))
            AS BIGINT) AS n_ell,
          CAST(list_contains(toks, 'the') AS BIGINT)
            + CAST(list_contains(toks, 'be') AS BIGINT)
            + CAST(list_contains(toks, 'to') AS BIGINT)
            + CAST(list_contains(toks, 'of') AS BIGINT)
            + CAST(list_contains(toks, 'and') AS BIGINT)
            + CAST(list_contains(toks, 'that') AS BIGINT)
            + CAST(list_contains(toks, 'have') AS BIGINT)
            + CAST(list_contains(toks, 'with') AS BIGINT) AS stop_hits
        FROM t)
      SELECT doc_id, n_words, mean_word_len_ppm, alpha_ppm, symbol_ppm,
        n_bullet * 1000000 // n_lines AS bullet_line_ppm,
        n_ell * 1000000 // n_lines AS ellipsis_line_ppm,
        stop_hits,
        (n_words >= 10 AND n_words <= 100000) AS word_count_ok,
        (mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000)
          AS word_len_ok,
        alpha_ppm >= 800000 AS mostly_alpha,
        symbol_ppm <= 100000 AS low_symbol,
        n_bullet * 1000000 // n_lines <= 900000 AS few_bullets,
        n_ell * 1000000 // n_lines <= 300000 AS few_ellipsis,
        stop_hits >= 2 AS enough_stopwords,
        (n_words >= 10 AND n_words <= 100000
         AND mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000
         AND alpha_ppm >= 800000 AND symbol_ppm <= 100000
         AND n_bullet * 1000000 // n_lines <= 900000
         AND n_ell * 1000000 // n_lines <= 300000
         AND stop_hits >= 2) AS keep
      FROM m""",
    // familiarity joins on the SAME hex60 hash groups as Spark (a
    // 60-bit collision would merge counts identically on both engines)
    "text_bigram_familiarity" -> s"""
      WITH tok AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
      big AS (SELECT doc_id, ${hex60Sql("bigram")} AS h FROM (
          SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
              i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
          FROM tok WHERE len(toks) >= 2)),
      fam AS (SELECT h FROM big GROUP BY h HAVING count(*) >= 5),
      sc AS (SELECT b.doc_id, count(*) AS n_bigrams,
                    count(f.h) AS n_familiar
             FROM big b LEFT JOIN fam f USING (h) GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(n_familiar, 0) AS BIGINT) AS n_familiar,
             CAST(CASE WHEN coalesce(n_bigrams, 0) > 0
                  THEN n_familiar * 1000000 // n_bigrams
                  ELSE 0 END AS BIGINT) AS familiar_ppm
      FROM documents d LEFT JOIN sc USING (doc_id)""",
    "vocab_top_bigrams" -> """
      WITH tok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
          i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        FROM tok WHERE len(toks) >= 2)
      SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg
      GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""",
    // vocabulary-first BPE pair counts: pairs explode over DISTINCT
    // words only, weighted by the word's corpus count
    "vocab_bpe_pairs" -> """
      WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                   AS word FROM documents),
      wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wn
             FROM w GROUP BY 1),
      p AS (SELECT wn, unnest(list_transform(range(1, strlen(word)),
              i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
            FROM wc WHERE strlen(word) >= 2)
      SELECT pair, CAST(sum(wn) AS BIGINT) AS n FROM p
      GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""",
    // iterative-BPE replay: the trainer loop unrolled into static CTEs
    // (one pR/tR/vR triple per round); merge table = each round's t
    "vocab_bpe_merges" -> (bpeCteSql(BpeRounds) +
      (1 to BpeRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) AS merge_round, lft, rgt, n FROM t$r")
        .mkString("\n      ", "\n      UNION ALL ", "")),
    // final-vocabulary replay: explode vN's symbol strings, sum wn
    "vocab_bpe_vocab" -> (bpeCteSql(BpeRounds) + s"""
      SELECT sym AS symbol, CAST(sum(wn) AS BIGINT) AS n
      FROM (SELECT wn, unnest(list_filter(string_split(s, '  '),
              x -> x <> '')) AS sym FROM v$BpeRounds)
      GROUP BY 1"""),
    "features_hashed_bow" -> s"""
      WITH tok AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      SELECT doc_id, CAST(${hex60Sql("token")} % 64 AS BIGINT) AS dim,
             CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2""",
    "emb_normalize" -> s"""
      WITH n AS (SELECT vec_id,
          sqrt(list_sum(list_transform(embedding,
            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS l2_norm,
          $NormSql AS unit
        FROM embeddings)
      SELECT vec_id, unnest(range(len(unit))) AS dim, l2_norm,
        unnest(unit) AS unit_val
      FROM n WHERE l2_norm > 0""",
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
    "text_token_count" ->
      """SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
          AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
          AS BIGINT) AS n_bpe_tokens
        FROM documents""",
    "text_lang_id" -> s"""$DocsNormCte,
      s AS (SELECT doc_id,
              ${scoreSql("en")} AS c_en, ${scoreSql("es")} AS c_es,
              ${scoreSql("de")} AS c_de, ${scoreSql("fr")} AS c_fr
            FROM t)
      SELECT doc_id,
             CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                  WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                  WHEN c_de >= c_fr THEN 'de'
                  ELSE 'fr' END AS lang_pred
      FROM s""",
    "text_quality_score" -> s"""$DocsNormCte,
      m AS (SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                AS n_tokens,
              length(replace(text, ' ', '')) AS n_nonspace,
              length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
                AS n_punct,
              ${scoreSql("en")} AS c_en
            FROM t)
      SELECT doc_id, n_chars, n_tokens,
             n_nonspace * 1.0 / n_tokens AS avg_token_len,
             n_punct * 1.0 / n_chars AS punct_ratio,
             c_en * 1.0 / n_tokens AS stopword_ratio,
             least(1.0, n_tokens / 50.0) * 0.4
               + least(1.0, (c_en * 1.0 / n_tokens) * 5.0) * 0.3
               + (1.0 - least(1.0, (n_punct * 1.0 / n_chars) * 10.0)) * 0.3
               AS quality_score
      FROM m""",
    "text_fingerprint" ->
      """WITH tok AS (SELECT doc_id,
            regexp_split_to_array(trim(text), '\s+') AS toks,
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_md5
          FROM documents)
        SELECT doc_id, content_md5,
               list_min(list_transform(range(len(toks) - 2),
                 i -> md5(array_to_string(toks[i+1:i+3], ' ')))) AS shingle_md5_min
        FROM tok""",

    "text_redact_pii" -> s"""
      SELECT doc_id,
             md5(regexp_replace(regexp_replace(regexp_replace(text,
               '${TextOps.PiiEmail}', '<EMAIL>', 'g'),
               '${TextOps.PiiIpv4}', '<IP>', 'g'),
               '${TextOps.PiiDigits}', '<NUMBER>', 'g')) AS redacted_md5
      FROM documents""",
    "text_repetition" -> """
      WITH toks AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2)
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             MAX(tf) * 1.0 / CAST(SUM(tf) AS BIGINT) AS top_token_ratio,
             COUNT(*) * 1.0 / CAST(SUM(tf) AS BIGINT) AS ttr
      FROM tf GROUP BY doc_id""",
    "text_rolling_fingerprint" -> {
      // window hash per 1-based offset i: sum_j unicode(s[i+j]) * B^(15-j) mod M
      val powers = (0 until 16).map(j =>
        Seq.fill(15 - j)(257L).foldLeft(1L)((a, b) => a * b % 1000003L))
      val terms = (0 until 16).map(j =>
        s"(CAST(unicode(substr(text, CAST(i+$j AS INTEGER), 1)) AS BIGINT) * ${powers(j)} % 1000003)")
        .mkString(" + ")
      s"""SELECT doc_id,
            CASE WHEN length(text) >= 16 THEN
              list_min(list_transform(range(1, length(text) - 14),
                i -> ($terms) % 1000003))
            ELSE NULL END AS roll_min
          FROM documents"""
    },
    "dedup_exact" ->
      """WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 10 = 0)
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_md5,
               min(doc_id) AS doc_id_kept, count(*) AS n_copies
        FROM all_docs GROUP BY 1""",
    "dedup_minhash_lsh" -> minhashPairsSql(),
    // full-LSH pairs restricted to batch-touching ones: the
    // incremental plan must emit exactly this set
    "dedup_incremental" -> minhashPairsSql(
      extraWhere = " AND (doc_a % 10 = 3 OR doc_b % 10 = 3)"),
    "dedup_simhash" -> s"""
      WITH tokraw AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents),
      tokd AS (SELECT DISTINCT doc_id, token FROM tokraw),
      h AS (SELECT doc_id, ${hex60Sql("token")} AS th FROM tokd),
      sg AS (SELECT doc_id,
         $SimhashBitSum AS sh
       FROM h GROUP BY doc_id),
      chunks AS (SELECT doc_id, sh, unnest([
          {c: 0, k: (sh >> 0) & 65535},  {c: 1, k: (sh >> 16) & 65535},
          {c: 2, k: (sh >> 32) & 65535}, {c: 3, k: (sh >> 48) & 65535}])
          AS ck FROM sg),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.sh AS sh_a,
                      y.doc_id AS doc_b, y.sh AS sh_b
               FROM chunks x JOIN chunks y
                 ON x.ck = y.ck AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""",
    "dedup_ngram_jaccard" ->
      """WITH tokraw AS (
          SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents),
        toks AS (
          SELECT doc_id, token FROM tokraw
          WHERE token NOT IN (SELECT token FROM tokraw
                              GROUP BY token HAVING count(*) > 500)),
        sizes AS (SELECT doc_id, count(*) AS n_tokens FROM tokraw GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_inter, sa.n_tokens AS n_a, sb.n_tokens AS n_b,
               n_inter * 1.0 / (sa.n_tokens + sb.n_tokens - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * 1.0 / (sa.n_tokens + sb.n_tokens - n_inter) >= 0.8""",
    // the bloom routing is semantically transparent (definite-new ∪
    // confirmed-new == batch minus corpus texts): the oracle is the
    // plain md5 anti-join
    "dedup_bloom_incremental" -> """
      SELECT b.doc_id, b.source
      FROM documents b
      WHERE b.doc_id % 10 = 3
        AND md5(b.text) NOT IN (SELECT md5(text) FROM documents c
                                WHERE c.doc_id % 10 <> 3)""",
    // the shingle-hash truth-set CTE shape (hsh/sizes/hot/kept/inter)
    // with the integer min-side containment predicate
    "dedup_containment" -> s"""
      WITH $ShinglesCte,
      hsh AS (SELECT DISTINCT doc_id, ${hex60Sql("shingle")} AS h FROM sh),
      sizes AS (SELECT doc_id, count(*) AS n FROM hsh GROUP BY 1),
      hot AS (SELECT h FROM hsh GROUP BY h HAVING count(*) > 500),
      kept AS (SELECT doc_id, h FROM hsh
               WHERE h NOT IN (SELECT h FROM hot)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS n_inter
                FROM kept a JOIN kept b
                  ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_inter,
             sa.n AS n_a, sb.n AS n_b,
             CASE WHEN sa.n <= sb.n THEN doc_a ELSE doc_b END
               AS contained_doc
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE 100 * n_inter >= 90 * least(sa.n, sb.n)""",
    "dedup_clusters" -> DedupClustersSql,
    // representative per component == rows whose label is the min of
    // their cluster; composes the clusters oracle as a subquery
    "dedup_keep_representative" -> s"""
      SELECT component AS doc_id,
             CAST(count(*) AS BIGINT) AS cluster_size
      FROM ($DedupClustersSql) GROUP BY component""",
    // the composed curation chain: C4 keep-conditions (text_c4_filter
    // oracle), exact keep-first over md5(text), the shared clusters
    // CTE block restricted to the exact-dedup survivors,
    // representative filter, then the chunk_documents replay
    "corpus_curation_e2e" -> s"""
      WITH RECURSIVE
      base AS (SELECT doc_id, text,
          regexp_split_to_array(trim(text), '\\s+') AS btoks,
          ' ' || lower(text) || ' ' AS p
        FROM documents),
      c4 AS (SELECT doc_id, text FROM base
        WHERE len(btoks) >= 10
          AND (contains(p, ' the ') OR contains(p, ' a '))
          AND CAST(len(list_distinct(btoks)) AS BIGINT) * 1000000
              // CAST(len(btoks) AS BIGINT) >= 300000
          AND NOT contains(lower(text), '{')
          AND NOT contains(lower(text), 'lorem ipsum')),
      ex AS (SELECT doc_id, text FROM (
          SELECT doc_id, text,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          FROM c4) WHERE doc_id = keeper),
      ${clustersCtes("SELECT doc_id, text FROM ex")},
      comp AS (SELECT node AS doc_id, min(lbl) AS component
               FROM walk GROUP BY node),
      corpus AS (SELECT ex.doc_id, ex.text FROM ex
                 JOIN comp USING (doc_id) WHERE component = ex.doc_id),
      ctok AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM corpus),
      seg AS (SELECT doc_id,
          unnest(range((len(toks) + 63) // 64)) AS chunk_idx,
          unnest(list_transform(range((len(toks) + 63) // 64),
            i -> array_to_string(toks[i*64+1 : i*64+64], ' '))) AS seg
        FROM ctok)
      SELECT doc_id, chunk_idx,
        CAST(len(regexp_split_to_array(trim(seg), '\\s+')) AS BIGINT)
          AS n_tokens,
        md5(seg) AS chunk_md5
      FROM seg""",
    "dedup_embedding_cosine" -> lshPairsSql(tables = 4, threshold = 0.3),
    "sim_lsh_ann" -> lshPairsSql(tables = 1, threshold = 0.2),

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
    // bucketing changes the physical layout, never the values: the
    // oracle is the plain join over the same projections
    "sink_bucketed_join" -> s"""
      SELECT o_orderpriority, count(*) AS n_items,
             ${stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1""",
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
    "window_tumbling" -> s"""
      SELECT CAST(FLOOR(epoch(ts)/3600) AS BIGINT)*3600 AS window_epoch,
             event_type, count(*) AS n_events,
             ${stableSumSql("value")} AS sum_value
      FROM events GROUP BY 1, 2""",
    // the full (type x hour) grid with zero fill — range() generates
    // the hour axis, the distinct type set is the other
    "window_gapfill" -> """
      WITH b AS (SELECT event_type,
          CAST(FLOOR(epoch(ts)/3600) AS BIGINT)*3600 AS window_epoch
        FROM events),
      c AS (SELECT event_type, window_epoch,
          CAST(count(*) AS BIGINT) AS n_events
        FROM b GROUP BY 1, 2),
      r AS (SELECT min(window_epoch) AS lo, max(window_epoch) AS hi FROM b),
      h AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS window_epoch
            FROM r),
      ty AS (SELECT DISTINCT event_type FROM events)
      SELECT ty.event_type, h.window_epoch,
             COALESCE(c.n_events, 0) AS n_events
      FROM h CROSS JOIN ty
      LEFT JOIN c ON c.event_type = ty.event_type
        AND c.window_epoch = h.window_epoch""",
    "window_sliding" -> s"""
      WITH w AS (
        SELECT (CAST(FLOOR(epoch(ts)/1800) AS BIGINT) - k) * 1800 AS window_epoch,
               value
        FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS off(k))
      SELECT window_epoch, count(*) AS n_events,
             ${stableSumSql("value")} AS sum_value
      FROM w GROUP BY 1""",
    "window_session" -> s"""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
      ids AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged)
      SELECT user_id, session_seq, count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             ${stableSumSql("value")} AS sum_value
      FROM ids GROUP BY 1, 2""",
    "window_session_builtin" ->
      """WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
      ids AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged)
      SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             user_id, count(*) AS n_events
      FROM ids GROUP BY user_id, session_seq""",
    "events_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        FROM events""",

    "analytics_q1" -> s"""
      SELECT l_returnflag, l_linestatus,
             ${stableSumSql("l_quantity")} AS sum_qty,
             ${stableSumSql("l_extendedprice")} AS sum_base_price,
             ${stableSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             count(*) AS n_rows
      FROM lineitem GROUP BY 1, 2""",
    "analytics_running_total" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(FLOOR(l_extendedprice*1000000) AS BIGINT))
                 OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) / 1000000.0
                 AS running_revenue
        FROM lineitem WHERE l_suppkey < 10""",
    "analytics_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
              FROM orders)
        WHERE rank <= 3""",
    "analytics_priority_revenue" -> s"""
      SELECT o_orderpriority,
             ${stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1""",
    "analytics_region_revenue" -> s"""
      SELECT r_name,
             ${stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1""",
    // same anchor scalar, micro-unit monetary sum, and tiebroken
    // per-segment ntile(5)s
    "analytics_rfm_scores" -> s"""
      WITH o AS (SELECT CAST(o_custkey AS BIGINT) AS customer_id,
                        CAST(o_orderdate AS DATE) AS d, o_totalprice
                 FROM orders),
      mx AS (SELECT max(d) AS maxd FROM o),
      rfm AS (SELECT customer_id,
                     CAST((SELECT maxd FROM mx) - max(d) AS BIGINT)
                       AS recency_days,
                     CAST(count(*) AS BIGINT) AS frequency,
                     ${stableSumSql("o_totalprice")} AS monetary
              FROM o GROUP BY 1),
      j AS (SELECT rfm.*, c.c_mktsegment
            FROM rfm JOIN customer c ON c.c_custkey = rfm.customer_id)
      SELECT customer_id, c_mktsegment, recency_days, frequency, monetary,
             CAST(ntile(5) OVER (PARTITION BY c_mktsegment
               ORDER BY recency_days, customer_id) AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (PARTITION BY c_mktsegment
               ORDER BY frequency DESC, customer_id) AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (PARTITION BY c_mktsegment
               ORDER BY monetary DESC, customer_id) AS BIGINT) AS m_score
      FROM j""",
    "analytics_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "analytics_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem""",
    "events_from_json_struct" ->
      """SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        FROM events""",
    "analytics_pivot" ->
      """SELECT user_id,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'error') AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY user_id""",
    "analytics_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "analytics_moving_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(epoch(l_shipdate) AS BIGINT) AS epoch_s,
               CAST(SUM(CAST(FLOOR(l_extendedprice*1000000) AS BIGINT))
                 OVER (PARTITION BY l_suppkey ORDER BY CAST(epoch(l_shipdate) AS BIGINT)
                       RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                 AS BIGINT) / 1000000.0 AS moving_7d_revenue
        FROM lineitem WHERE l_suppkey < 5""",
    "analytics_lead_lag_ntile" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
               lag(l_extendedprice, 1) OVER w AS prev_price,
               lead(l_extendedprice, 1) OVER w AS next_price,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               first_value(l_extendedprice) OVER
                 (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS first_price
        FROM lineitem WHERE l_suppkey < 5
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber)""",
    "setop_except_all" ->
      """SELECT l_orderkey FROM lineitem
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1""",
    // first-3 path per user under the (epoch_us, event_id) total
    // order (the staged source floors ts to microseconds), then path
    // counts, top-20 with (count desc, path) tie-break
    "analytics_event_paths" -> """
      WITH f AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
        FROM events),
      p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
               count(*) AS n_steps
        FROM f WHERE rn <= 3 GROUP BY user_id),
      c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users
            FROM p WHERE n_steps = 3 GROUP BY 1)
      SELECT path, n_users FROM c
      ORDER BY n_users DESC, path LIMIT 20""",
    "analytics_funnel" ->
      """WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN epoch(ts) END) AS s,
                 min(CASE WHEN event_type = 'click' THEN epoch(ts) END) AS c,
                 min(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS p
          FROM events GROUP BY user_id)
        SELECT user_id,
               s IS NOT NULL AS did_signup,
               c > s AS clicked_after_signup,
               p > c AND c > s AS purchased_after_click
        FROM f""",
    "analytics_cohort_retention" ->
      """WITH w AS (
          SELECT user_id,
                 CAST(FLOOR(epoch(ts)/604800) AS BIGINT) AS active_week
          FROM events),
        fw AS (SELECT user_id, min(active_week) AS cohort_week
               FROM w GROUP BY user_id),
        dw AS (SELECT DISTINCT user_id, active_week FROM w)
        SELECT cohort_week, active_week - cohort_week AS week_offset,
               count(*) AS n_users
        FROM dw JOIN fw USING (user_id)
        GROUP BY 1, 2""",
    "text_top_terms" ->
      """WITH docs AS (SELECT * FROM documents),
        terms AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM docs),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM terms GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM docs),
        scored AS (
          SELECT doc_id, term, tf * (n * 1.0) / df AS score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tf * (n * 1.0) / df DESC, term) AS rank
          FROM tf JOIN dfreq USING (term), n)
        SELECT doc_id, term, score, CAST(rank AS BIGINT) AS rank
        FROM scored WHERE rank <= 3""",
    "join_salted_skew" -> s"""
      SELECT o_orderpriority,
             ${stableSumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1""",
    "analytics_percentiles" ->
      """SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75,
               quantile_cont(l_extendedprice, 0.99) AS p99
        FROM lineitem GROUP BY 1""",
    "incremental_watermark_load" ->
      """SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_iso,
               o_totalprice
        FROM orders""",
    "asof_join_last_purchase" ->
      """WITH p AS (
          SELECT user_id, ts, max(value) AS purchase_value,
                 epoch(ts) AS purchase_epoch
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT e.event_id, p.purchase_value, p.purchase_epoch
        FROM events e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""",

    // per-purchase click counts via a grouped CTE (== the per-key
    // window), integer ppm split summed per click
    "attribution_linear" -> """
      WITH ev AS (SELECT event_id, user_id, event_type,
                         CAST(ts AS TIMESTAMP) AS ts FROM events),
      j AS (SELECT p.event_id AS p_id, c.event_id AS click_id
            FROM ev p JOIN ev c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE),
      n AS (SELECT p_id, count(*) AS n_clicks FROM j GROUP BY 1)
      SELECT j.click_id,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(1000000 // n.n_clicks) AS BIGINT) AS credit_ppm
      FROM j JOIN n USING (p_id)
      GROUP BY 1""",
    // purchases credited to the earliest click within the 30-minute
    // lookback (µs-truncated timestamps, like the interval join)
    "attribution_first_touch" -> """
      WITH ev AS (SELECT event_id, user_id, event_type,
                         CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT p.event_id,
             count(*) AS n_clicks_window,
             strftime(min(c.ts), '%Y-%m-%d %H:%M:%S') AS first_click_s
      FROM ev p JOIN ev c
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      GROUP BY p.event_id""",
    // ntile(4) under the same (n_tokens, doc_id) total order — the
    // SQL-standard first-(n%4)-buckets-get-one-extra distribution
    "stats_length_quartiles" -> """
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(ntile(4) OVER (PARTITION BY source
               ORDER BY len(regexp_split_to_array(trim(text), '\s+')),
                        doc_id) AS BIGINT) AS quartile
      FROM documents""",
    // full MERGE replay: base rows without updates + applied upserts,
    // minus flagged deletes — the same disjoint custkey residues
    "merge_upsert_customers" -> """
      WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                           c_name, c_mktsegment FROM customer),
      upd AS (
        SELECT c_custkey, c_name,
               'SEGMENT_UPDATED' AS c_mktsegment, false AS is_delete
        FROM base WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 10000000, 'NEW_' || c_name,
               'SEGMENT_NEW', false
        FROM base WHERE c_custkey % 10 = 2
        UNION ALL
        SELECT c_custkey, c_name, c_mktsegment, true
        FROM base WHERE c_custkey % 10 = 1)
      SELECT b.c_custkey, b.c_name, b.c_mktsegment
      FROM base b ANTI JOIN upd u ON b.c_custkey = u.c_custkey
      UNION ALL
      SELECT c_custkey, c_name, c_mktsegment FROM upd WHERE NOT is_delete""",

    // SCD2 replay: null-safe change collapse (IS DISTINCT FROM lag),
    // then validity intervals via lead over the surviving versions
    "scd2_customer_priority" -> """
      WITH ch AS (
        SELECT CAST(o_custkey AS BIGINT) AS customer_id,
               o_orderpriority AS priority,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                 * 10000000000 + o_orderkey AS ord
        FROM orders),
      sel AS (
        SELECT customer_id, priority, ord FROM ch
        QUALIFY priority IS DISTINCT FROM
          lag(priority) OVER (PARTITION BY customer_id ORDER BY ord))
      SELECT customer_id, priority, ord AS valid_from,
             lead(ord) OVER (PARTITION BY customer_id ORDER BY ord)
               AS valid_to,
             lead(ord) OVER (PARTITION BY customer_id ORDER BY ord) IS NULL
               AS is_current,
             CAST(row_number() OVER (PARTITION BY customer_id ORDER BY ord)
               AS BIGINT) AS version
      FROM sel""",

    // snapshot diff: same v2 mutation pattern, FULL OUTER JOIN on the
    // PK, IS DISTINCT FROM for null-safe attribute comparison
    "diff_snapshots" -> """
      WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                           c_name, c_mktsegment FROM customer),
      v2 AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 10 = 0 THEN 'SEGMENT_V2'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM base WHERE c_custkey % 10 <> 1
        UNION ALL
        SELECT c_custkey + 10000000, 'NEW_' || c_name, 'SEGMENT_NEW'
        FROM base WHERE c_custkey % 10 = 2)
      SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
             CASE WHEN a.c_custkey IS NULL THEN 'added'
                  WHEN b.c_custkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS change_type,
             a.c_mktsegment AS old_segment,
             b.c_mktsegment AS new_segment
      FROM base a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
      WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
         OR a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
         OR a.c_name IS DISTINCT FROM b.c_name""",
    // next-fit packing: running sum over (size DESC, shard), integer
    // floor-divide by the target — BIGINT casts on every windowed SUM
    // (DuckDB SUM OVER returns HUGEINT, the r7 dtype lesson)
    "sink_compaction_plan" -> """
      WITH shards AS (
        SELECT doc_id % 64 AS shard,
               CAST(sum(n_chars) AS BIGINT) AS size_bytes
        FROM documents GROUP BY 1),
      c AS (
        SELECT shard, size_bytes,
               CAST(coalesce(sum(size_bytes) OVER (
                 ORDER BY size_bytes DESC, shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM shards)
      SELECT shard, size_bytes, cum_before // 8192 AS compact_group
      FROM c""",
    // exact-integer z-test: 4(nx-S)^2 > 9(n*SS - S^2) over BIGINTs
    "quality_outlier_zscore" -> """
      WITH d AS (SELECT doc_id, source,
                        CAST(len(regexp_split_to_array(trim(text), '\s+'))
                          AS BIGINT) AS n_tokens
                 FROM documents),
      st AS (SELECT source, count(*) AS n,
                    CAST(sum(n_tokens) AS BIGINT) AS s,
                    CAST(sum(n_tokens * n_tokens) AS BIGINT) AS ss
             FROM d GROUP BY source)
      SELECT d.doc_id, d.source, d.n_tokens
      FROM d JOIN st USING (source)
      WHERE st.n > 1
        AND 4 * (st.n * d.n_tokens - st.s) * (st.n * d.n_tokens - st.s)
          > 9 * (st.n * st.ss - st.s * st.s)""",
    // blocked fuzzy pairs over DISTINCT names: same (first token,
    // length-band) blocking, levenshtein 1..3, lexicographic ordering
    "dedup_fuzzy_names" -> """
      WITH names AS (SELECT p_name, count(*) AS n_parts
                     FROM part GROUP BY p_name),
      b AS (SELECT p_name, n_parts,
                   split_part(p_name, ' ', 1) AS w1,
                   len(p_name) // 3 AS lb
            FROM names)
      SELECT a.p_name AS name_a, x.p_name AS name_b,
             CAST(levenshtein(a.p_name, x.p_name) AS BIGINT) AS distance,
             CAST(a.n_parts AS BIGINT) AS parts_a,
             CAST(x.n_parts AS BIGINT) AS parts_b
      FROM b a JOIN b x ON a.w1 = x.w1 AND a.lb = x.lb
                        AND a.p_name < x.p_name
      WHERE levenshtein(a.p_name, x.p_name) BETWEEN 1 AND 3""",

    // three unrolled integer power iterations over the LSH pair graph
    // (the shared minhash CTE block as a nested-WITH subquery);
    // teleport (15*1e9)//(100*N), damped (85*sum)//100 — the exact
    // expressions Graph.pageRankPpb evaluates (BIGINT casts on the
    // HUGEINT window/aggregate sums, the r7 dtype lesson)
    "graph_pagerank" -> s"""
      WITH lpairs AS (SELECT doc_a, doc_b FROM (${minhashPairsSql()}) lp),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM lpairs
                UNION SELECT doc_b, doc_a FROM lpairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      deg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT id, CAST(1000000000 // n AS BIGINT) AS rank_fp
             FROM nodes, nn),
      it1 AS (SELECT e.dst AS id,
                     CAST(CAST(15 AS BIGINT) * 1000000000 // (100 * (SELECT n FROM nn))
                          + 85 * sum(r.rank_fp // d.outdeg) // 100
                       AS BIGINT) AS rank_fp
              FROM edges e
              JOIN r0 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY e.dst),
      it2 AS (SELECT e.dst AS id,
                     CAST(CAST(15 AS BIGINT) * 1000000000 // (100 * (SELECT n FROM nn))
                          + 85 * sum(r.rank_fp // d.outdeg) // 100
                       AS BIGINT) AS rank_fp
              FROM edges e
              JOIN it1 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY e.dst),
      it3 AS (SELECT e.dst AS id,
                     CAST(CAST(15 AS BIGINT) * 1000000000 // (100 * (SELECT n FROM nn))
                          + 85 * sum(r.rank_fp // d.outdeg) // 100
                       AS BIGINT) AS rank_fp
              FROM edges e
              JOIN it2 r ON r.id = e.src JOIN deg d ON d.id = e.src
              GROUP BY e.dst)
      SELECT id AS doc_id, rank_fp AS rank_ppb FROM it3""",

    // degree-ordered triangle census: orient every edge from its
    // (degree, id)-smaller endpoint, wedge on shared src, probe the
    // closing edge (oriented b->c by construction) — integer counts
    "graph_triangles" -> s"""
      WITH lpairs AS (SELECT doc_a AS a, doc_b AS b
                      FROM (${minhashPairsSql()}) lp),
      und AS (SELECT DISTINCT a, b FROM lpairs),
      deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
              FROM (SELECT a AS id FROM und
                    UNION ALL SELECT b AS id FROM und)
              GROUP BY 1),
      ore AS (SELECT
                CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                     THEN a ELSE b END AS src,
                CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                     THEN b ELSE a END AS dst,
                CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                     THEN db.d ELSE da.d END AS dd
              FROM und
              JOIN deg da ON da.id = und.a
              JOIN deg db ON db.id = und.b),
      wedge AS (SELECT e1.src, e1.dst AS w_b, e2.dst AS w_c
                FROM ore e1 JOIN ore e2 ON e1.src = e2.src
                WHERE e1.dd < e2.dd
                   OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
      closed AS (SELECT w.w_b, o.src
                 FROM wedge w LEFT JOIN ore o
                   ON o.src = w.w_b AND o.dst = w.w_c)
      SELECT CAST(count(*) AS BIGINT) AS wedges,
             CAST(count(src) AS BIGINT) AS triangles
      FROM closed""",

    // the bloom prefilter is semantically transparent: the oracle is
    // the PLAIN join — that transparency is the operator's contract
    "join_bloom_prefilter" -> s"""
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             count(*) AS n_orders,
             ${stableSumSql("o_totalprice")} AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY 1""",

    // ---- r9 additions ----
    // the bucket rewrite is semantically transparent: the oracle is
    // the naive BETWEEN join
    "join_range_bucketed" -> """
      WITH iv AS (SELECT CAST(n_nationkey AS BIGINT) AS interval_id,
                         CAST(n_nationkey AS BIGINT) * 600 + 1 AS lo,
                         CAST(n_nationkey AS BIGINT) * 600 + 1000 AS hi
                  FROM nation)
      SELECT interval_id, CAST(count(*) AS BIGINT) AS n_points,
             CAST(min(p_partkey) AS BIGINT) AS key_lo,
             CAST(max(p_partkey) AS BIGINT) AS key_hi
      FROM iv JOIN part ON p_partkey BETWEEN lo AND hi
      GROUP BY 1""",
    // CMS replay: same depth-prefixed hex60 hashing, same cells
    // merge == recompute: the Spark side folds base+delta aggregate
    // states; the oracle aggregates the full table in one pass
    "agg_partial_merge" -> s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n,
             ${stableSumSql("o_totalprice")} AS total_price,
             min(o_totalprice) AS vmin, max(o_totalprice) AS vmax
      FROM orders GROUP BY 1""",

    // histogram quantile estimate + error vs exact nearest-rank: the
    // bucket index and the estimate are single double expression
    // shapes; ranks via the (q*n+99)//100 cum-walk convention
    "sketch_quantile_error" -> """
      WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
                 WHERE NOT isnan(o_totalprice)),
      s AS (SELECT min(x) AS mn, max(x) AS mx,
              CAST(count(*) AS BIGINT) AS n FROM v),
      h AS (SELECT CASE WHEN mx = mn THEN 0
                     ELSE least(127, CAST(FLOOR((x - mn) * 128 / (mx - mn))
                       AS BIGINT)) END AS b,
                   mn, mx, n, CAST(count(*) AS BIGINT) AS c
            FROM v, s GROUP BY 1, 2, 3, 4),
      cum AS (SELECT *, sum(c) OVER (ORDER BY b
                ROWS UNBOUNDED PRECEDING) AS cum FROM h),
      qs AS (SELECT unnest([50, 90, 99]) AS q),
      est AS (SELECT q, mn, mx, min(b) AS b_est
              FROM qs, cum WHERE cum >= (q * n + 99) // 100
              GROUP BY 1, 2, 3),
      vh AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
      vc AS (SELECT x, sum(c) OVER (ORDER BY x
               ROWS UNBOUNDED PRECEDING) AS cum FROM vh),
      ex AS (SELECT q, min(x) AS exact
             FROM qs, s, vc WHERE cum >= (q * n + 99) // 100
             GROUP BY 1)
      SELECT CAST(e.q AS BIGINT) AS q,
             mn + b_est * (mx - mn) / 128 AS est, exact,
             abs(mn + b_est * (mx - mn) / 128 - exact) AS abs_err
      FROM est e JOIN ex ON e.q = ex.q""",

    "sketch_cms_error" -> s"""
      WITH tk AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                    AS token FROM documents),
      ds AS (SELECT unnest(range(${Sketches.CmsDepth})) AS d),
      ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
             FROM tk GROUP BY 1),
      top AS (SELECT token AS term, exact_cnt FROM ex
              ORDER BY exact_cnt DESC, token LIMIT 20),
      cells AS (SELECT d,
                  ${hex60Sql("CAST(d AS VARCHAR) || ':' || token")}
                    % ${Sketches.CmsWidth} AS slot,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM tk CROSS JOIN ds GROUP BY 1, 2),
      probe AS (SELECT term, exact_cnt, d,
                  ${hex60Sql("CAST(d AS VARCHAR) || ':' || term")}
                    % ${Sketches.CmsWidth} AS slot
                FROM top CROSS JOIN ds)
      SELECT term, exact_cnt, CAST(min(COALESCE(cnt, 0)) AS BIGINT) AS cms_est
      FROM probe LEFT JOIN cells USING (d, slot)
      GROUP BY 1, 2""",
    // HLL replay: identical register math, HUGEINT for the scaled
    // harmonic mean where Spark uses DECIMAL(38,0)
    "sketch_hll_distinct" -> s"""
      WITH tk AS (SELECT source,
                    unnest(regexp_split_to_array(trim(text), '\\s+'))
                      AS token FROM documents),
      h AS (SELECT source, ${hex60Sql("token")} AS hv FROM tk),
      regs AS (SELECT source, hv % ${Sketches.HllRegisters} AS idx,
                 CAST(max(53 - length(bin(hv >> 8))) AS BIGINT) AS rho
               FROM h GROUP BY 1, 2),
      sums AS (SELECT source,
                 SUM(1::BIGINT << CAST(53 - rho AS INTEGER)) AS s_present,
                 count(*) AS n_present
               FROM regs GROUP BY 1),
      est AS (SELECT source,
                CAST(CAST('${Sketches.HllNumerator.toPlainString}' AS HUGEINT)
                     // ((s_present
                          + (${Sketches.HllRegisters} - n_present)
                            * (1::BIGINT << 53)) * CAST(1000000 AS HUGEINT))
                  AS BIGINT) AS hll_est
              FROM sums)
      SELECT tk2.source, tk2.exact_distinct, est.hll_est
      FROM (SELECT source, CAST(count(DISTINCT token) AS BIGINT)
              AS exact_distinct FROM tk GROUP BY 1) tk2
      JOIN est USING (source)""",
    // priority sampling replay: same bucket hash, same integer
    // priority, same (priority, key) total order
    "sample_weighted_priority" -> s"""
      WITH d AS (SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                     AS BIGINT) AS n_tokens
                 FROM documents)
      SELECT doc_id, n_tokens FROM d
      ORDER BY ${bucketSql("doc_id")} * ${Sampling.Buckets}
                 // GREATEST(n_tokens, 1), doc_id
      LIMIT 100""",
    // stopword strip replay: df over distinct (doc, token), hot =
    // df*2 >= n, positional reassembly via string_agg ORDER BY
    "corpus_stopword_strip" -> """
      WITH tok AS (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS toks
                   FROM documents),
      dfr AS (SELECT token, count(*) AS df
              FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token
                    FROM tok) GROUP BY 1),
      hot AS (SELECT token FROM dfr
              WHERE df * 2 >= (SELECT count(*) FROM documents)),
      pos AS (SELECT doc_id, unnest(range(len(toks))) AS p, toks FROM tok),
      tx AS (SELECT doc_id, p, toks[CAST(p + 1 AS INTEGER)] AS token
             FROM pos),
      kept AS (SELECT doc_id, p, token FROM tx
               WHERE token NOT IN (SELECT token FROM hot)),
      agg AS (SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY 1),
      base AS (SELECT doc_id, len(toks) AS n_toks FROM tok)
      SELECT b.doc_id, COALESCE(a.clean_text, '') AS clean_text,
             CAST(b.n_toks - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
      FROM base b LEFT JOIN agg a USING (doc_id)""",
    // integer idf replay: same (n*1e6) div df proxy, same tie order
    "text_tfidf_top_terms" -> """
      WITH tk AS (SELECT doc_id,
                    unnest(regexp_split_to_array(trim(text), '\s+'))
                      AS token FROM documents),
      tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             FROM tk GROUP BY 1, 2),
      dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, tf.token, tf,
               CAST(tf AS HUGEINT) *
                 (((SELECT count(*) FROM documents) * 1000000) // df)
                 AS score
             FROM tf JOIN dfr USING (token)),
      r AS (SELECT *, row_number() OVER
              (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
            FROM sc)
      SELECT doc_id, token, tf, CAST(score AS BIGINT) AS score,
             CAST(rnk AS BIGINT) AS rnk
      FROM r WHERE rnk <= 3""",
    // rolling range-frame replay: RANGE over epoch seconds includes
    // same-second peers in both engines; micro-unit stable sum
    "window_rolling_counts" -> """
      SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
             CAST(count(*) OVER w AS BIGINT) AS n_7d,
             (SUM(CAST(FLOOR(value*1000000) AS BIGINT)) OVER w
               / 1000000.0) AS val_7d
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""",
    // funnel replay: identical staged min-ts chain and 7-day cap
    "events_funnel" -> """
      WITH ev AS (SELECT user_id, event_type,
                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
                  FROM events),
      v AS (SELECT user_id, min(ts_sec) AS v_ts FROM ev
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(ts_sec) AS c_ts FROM ev e
            JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts_sec >= v_ts GROUP BY 1),
      p AS (SELECT e.user_id, min(ts_sec) AS p_ts FROM ev e
            JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts_sec >= c_ts GROUP BY 1),
      u AS (SELECT DISTINCT user_id FROM ev),
      st AS (SELECT u.user_id, CASE
               WHEN p_ts IS NOT NULL AND p_ts <= v_ts + 604800
                 THEN 'purchase'
               WHEN c_ts IS NOT NULL AND c_ts <= v_ts + 604800
                 THEN 'click'
               WHEN v_ts IS NOT NULL THEN 'view'
               ELSE 'none' END AS stage
             FROM u LEFT JOIN v USING (user_id)
                    LEFT JOIN c USING (user_id)
                    LEFT JOIN p USING (user_id))
      SELECT stage, CAST(count(*) AS BIGINT) AS n_users
      FROM st GROUP BY 1""",
    // same bigram split as vocab_bigram_conditionals; HUGEINT products
    // replay the Spark side's decimal128, floor-div back to BIGINT
    "vocab_pmi_collocations" -> """
      WITH tok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
          i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        FROM tok WHERE len(toks) >= 2),
      cnt AS (SELECT split_part(bigram, ' ', 1) AS w1,
          split_part(bigram, ' ', 2) AS w2,
          CAST(count(*) AS BIGINT) AS n12
        FROM bg GROUP BY 1, 2),
      m1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1
             FROM cnt GROUP BY 1),
      m2 AS (SELECT w2, CAST(sum(n12) AS BIGINT) AS n2
             FROM cnt GROUP BY 1),
      tot AS (SELECT CAST(sum(n12) AS BIGINT) AS total FROM cnt)
      SELECT c.w1, c.w2, c.n12, m1.n1, m2.n2,
        CAST((CAST(tot.total AS HUGEINT) * c.n12 * 1000000)
             // (CAST(m1.n1 AS HUGEINT) * m2.n2) AS BIGINT) AS pmi_ppm
      FROM cnt c JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot
      WHERE c.n12 >= 5""",
    // same lower/trim/collapse chain; 'g' flag = Spark's replace-all
    "text_normalize" -> """
      WITH n AS (SELECT doc_id,
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
            AS norm_text,
          CAST(length(text) AS BIGINT) AS n_chars_raw
        FROM documents)
      SELECT doc_id, norm_text, n_chars_raw,
             CAST(length(norm_text) AS BIGINT) AS n_chars_norm
      FROM n""",
    // identical (ts_sec, event_id) total order, lag/lead replay
    // split-merge sweep line: per-(key, day) local prefix maxima +
    // a per-day rollup walk; ends (-1) sort before starts (+1) at the
    // same instant, so the 30-min hold is end-exclusive
    "events_concurrency_peak" -> """
      WITH ev AS (SELECT event_type AS k,
                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
      b AS (SELECT k, t, CAST(1 AS BIGINT) AS delta FROM ev
            UNION ALL
            SELECT k, t + 1800, CAST(-1 AS BIGINT) FROM ev),
      d AS (SELECT k, t, delta, t // 86400 AS day FROM b),
      run AS (SELECT k, day, delta,
                sum(delta) OVER (PARTITION BY k, day ORDER BY t, delta
                  ROWS UNBOUNDED PRECEDING) AS run
              FROM d),
      daily AS (SELECT k, day, max(run) AS day_max,
                  sum(delta) AS day_sum
                FROM run GROUP BY 1, 2),
      wc AS (SELECT k, day, day_max,
               coalesce(sum(day_sum) OVER (PARTITION BY k ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS carry
             FROM daily)
      SELECT k AS event_type,
             CAST(max(carry + day_max) AS BIGINT) AS peak_concurrency
      FROM wc GROUP BY 1""",
    "events_context_window" -> """
      WITH ev AS (SELECT event_id, user_id, event_type,
                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
                  FROM events)
      SELECT event_id, user_id, event_type, ts_sec,
             lag(event_type, 1) OVER w AS prev_type,
             lead(event_type, 1) OVER w AS next_type,
             ts_sec - lag(ts_sec, 1) OVER w AS prev_gap_sec,
             lead(ts_sec, 1) OVER w - ts_sec AS next_gap_sec
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)""",
    // same histogram cum-walk: value at rank ceil(q*n) via integer
    // (q*n+99)//100, clamp with greatest/least
    "quality_winsorize_per_source" -> """
      WITH d AS (SELECT doc_id, source,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      hist AS (SELECT source, n_tokens, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
      cum AS (SELECT source, n_tokens,
          CAST(sum(c) OVER (PARTITION BY source ORDER BY n_tokens)
            AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM hist),
      b AS (SELECT source,
          min(CASE WHEN cum >= (5 * n + 99) // 100
              THEN n_tokens END) AS lo,
          min(CASE WHEN cum >= (95 * n + 99) // 100
              THEN n_tokens END) AS hi
        FROM cum GROUP BY 1)
      SELECT d.doc_id, d.source, d.n_tokens, b.lo, b.hi,
             greatest(b.lo, least(b.hi, d.n_tokens)) AS n_tokens_w
      FROM d JOIN b USING (source)""",
    // same two nearest-rank median walks over per-source histograms
    "quality_outlier_mad" -> """
      WITH d AS (SELECT doc_id, source,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      h1 AS (SELECT source, n_tokens, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
      c1 AS (SELECT source, n_tokens,
          CAST(sum(c) OVER (PARTITION BY source ORDER BY n_tokens)
            AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM h1),
      med AS (SELECT source,
          min(CASE WHEN cum >= (n + 1) // 2 THEN n_tokens END) AS med
        FROM c1 GROUP BY 1),
      dv AS (SELECT d.doc_id, d.source, d.n_tokens, m.med,
          abs(d.n_tokens - m.med) AS dev
        FROM d JOIN med m USING (source)),
      h2 AS (SELECT source, dev, CAST(count(*) AS BIGINT) AS c
        FROM dv GROUP BY 1, 2),
      c2 AS (SELECT source, dev,
          CAST(sum(c) OVER (PARTITION BY source ORDER BY dev)
            AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM h2),
      mad AS (SELECT source,
          min(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad
        FROM c2 GROUP BY 1)
      SELECT v.doc_id, v.source, v.n_tokens, v.med, a.mad,
             v.dev > 3 * a.mad AS is_outlier
      FROM dv v JOIN mad a USING (source)""",
    // distance-1 pairs from bigrams both ways, distance-2 pairs from
    // the (first, third) trigram projection both ways
    "vocab_skipgram_pairs" -> """
      WITH tok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
          i -> toks[i+1] || ' ' || toks[i+2])) AS g
        FROM tok WHERE len(toks) >= 2),
      tg AS (SELECT unnest(list_transform(range(len(toks) - 2),
          i -> toks[i+1] || ' ' || toks[i+3])) AS g
        FROM tok WHERE len(toks) >= 3),
      pairs AS (
        SELECT split_part(g, ' ', 1) AS center,
               split_part(g, ' ', 2) AS context FROM bg
        UNION ALL
        SELECT split_part(g, ' ', 2), split_part(g, ' ', 1) FROM bg
        UNION ALL
        SELECT split_part(g, ' ', 1), split_part(g, ' ', 2) FROM tg
        UNION ALL
        SELECT split_part(g, ' ', 2), split_part(g, ' ', 1) FROM tg)
      SELECT center, context, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5""",
    // ordered-aggregate first/last replay the struct min/max; HUGEINT
    // sum replays the decimal128 volume fold
    "window_ohlc_hourly" -> """
      WITH ev AS (SELECT event_id,
          CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
          CAST(FLOOR(value * 1000000) AS BIGINT) AS micro
        FROM events)
      SELECT ts_sec // 3600 AS hour,
             first(micro ORDER BY ts_sec, event_id) AS open_micro,
             max(micro) AS high_micro,
             min(micro) AS low_micro,
             last(micro ORDER BY ts_sec, event_id) AS close_micro,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(micro) AS BIGINT) AS vol_micro
      FROM ev GROUP BY 1""",
    // same lead() chain gated on the never-NULL next_ts; NULL types
    // group and window-partition identically in both engines
    "events_markov_transitions" -> """
      WITH ev AS (SELECT event_id, user_id, event_type,
          CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
      nx AS (SELECT event_type,
          lead(event_type, 1) OVER w AS next_type,
          lead(ts_sec, 1) OVER w AS next_ts
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
      tr AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM nx WHERE next_ts IS NOT NULL GROUP BY 1, 2),
      tt AS (SELECT event_type, next_type, n,
          CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM tr)
      SELECT event_type, next_type, n, total,
             CAST(n * 1000000 // total AS BIGINT) AS prob_ppm
      FROM tt""",
    // HUGEINT squares replay the decimal128 fold
    "vocab_gini_diversity" -> """
      WITH tf AS (SELECT source,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents),
      cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n
        FROM tf GROUP BY 1, 2),
      ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
          CAST(sum(n) AS BIGINT) AS n_tokens,
          sum(CAST(n AS HUGEINT) * n) AS ss
        FROM cnt GROUP BY 1)
      SELECT source, n_types, n_tokens,
        CAST(1000000 - (ss * 1000000)
          // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
          AS gini_ppm
      FROM ag""",
    // same stopword-hit argmax chain as text_lang_id, joined to the
    // labeled column; shares ride a window over the tiny matrix
    "text_langid_confusion" -> s"""
      WITH t AS (SELECT doc_id, lang, text,
          ' ' || lower(text) || ' ' AS p FROM documents),
      s AS (SELECT lang,
              ${scoreSql("en")} AS c_en, ${scoreSql("es")} AS c_es,
              ${scoreSql("de")} AS c_de, ${scoreSql("fr")} AS c_fr
            FROM t),
      pr AS (SELECT lang, CASE
               WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr
                 THEN 'en'
               WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
               WHEN c_de >= c_fr THEN 'de'
               ELSE 'fr' END AS lang_pred
             FROM s),
      m AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM pr GROUP BY 1, 2),
      tt AS (SELECT lang, lang_pred, n,
          CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS total
        FROM m)
      SELECT lang, lang_pred, n, total,
             CAST(n * 1000000 // total AS BIGINT) AS share_ppm
      FROM tt""",
    // zipped unnests replay posexplode; DuckDB's BIGINT // truncates
    // toward zero on negatives, so the oracle carries the SAME
    // positive-remainder rewrite as the Spark side — the numerator is
    // exactly divisible, making the division convention irrelevant
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
      FROM ag"""
  )
}
