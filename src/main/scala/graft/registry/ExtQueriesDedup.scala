package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{AsOfJoin, Audio, Corpus, Dedup, Graph, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, TextOps, Video, Windows}


import QueryShared._

/** Deduplication generators and the near-dup graph analyses built on them.
  *
  * One family slice of the extension registry — [[ExtQueries]]
  * aggregates every slice behind the unchanged `queries` /
  * `oracleSql` surface (the r10 split of the 4.4k-line
  * monolith; entries are verbatim, no behavior change).
  */
object ExtQueriesDedup {

  val queries: Map[String, Q] = Map(

    // the banding parameter sweep: each candidate band count scored
    // against exact shingle-jaccard truth — recall AND candidate
    // volume per configuration, so the band choice is measured on the
    // actual corpus instead of argued from the S-curve
    "dedup_lsh_tune_report" -> ((s, dir) =>
      Dedup.lshTuneReport(t(s, dir, "documents"), "doc_id", "text")),

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
    // which sources near-duplicate WHICH: the near-dup pair mass as a
    // source x source matrix with exact-ppm shares — reads the STAGED
    // pair table (never re-pairs) and adds two id-keyed joins + one
    // sources^2-bounded agg + a 1-row total broadcast
    "dedup_source_overlap_report" -> ((s, dir) =>
      Dedup.sourceOverlapReport(
        graft.ext.PairStage.lshPairs(s, dir),
        t(s, dir, "documents"), "doc_id", "source")),
    // the SKETCHED source-overlap matrix (VERDICT r14 #7 — the
    // sketch_kmv_jaccard composition): per unordered source pair, the
    // KMV-estimated Jaccard of the sources' distinct 3-shingle sets.
    // dedup_source_overlap_report prices near-dup PAIR mass and pays
    // the staged pair table; this prices raw CONTENT overlap from
    // 256-row-per-source sketches — the shape that scales past the
    // audit path: one shingle explode (the pass every dedup op pays),
    // one distinct, a bounded per-source window, then all pair math
    // on |sources| x 256 rows. The exact-truth columns are the
    // deliberate audit cost (the recall-report convention); a
    // production run drops them and keeps only the sketch side.
    // KmvErrorBoundSpec pins |est - exact| within the k=256
    // binomial-sampling bound.
    "dedup_source_overlap_kmv" -> ((s, dir) =>
      Sketches.kmvJaccard(
        t(s, dir, "documents").select(col("source"),
          explode(graft.functions.VectorFunctions.wordShingleStrings(
            col("text"), 3)).as("sh")),
        col("source"), col("sh"), k = 256)
        .withColumnRenamed("cls_a", "source_a")
        .withColumnRenamed("cls_b", "source_b")),
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
    // the EXACT-TRUTH incremental (VERDICT r17 #5a): batch-touching
    // exact-Jaccard pairs from the STAGED standing token table — the
    // recall-report truth set re-verified after an append without the
    // full rebuild. The df-cap is full-corpus (standing + batch), so
    // the output equals the rebuild's batch-touching slice exactly.
    "dedup_jaccard_incremental" -> ((s, dir) => {
      Dedup.jaccardIncrementalFrom(
        graft.ext.PairStage.docTokenSets(s, dir, excludeMod = 3),
        Dedup.docTokens(
          t(s, dir, "documents").filter(col("doc_id") % 10 === 3),
          col("doc_id"), col("text")),
        threshold = 0.8,
        standingDf = Some(graft.ext.PairStage.tokenDf(s, dir, 3)),
        standingSizes = Some(graft.ext.PairStage.docTokenSizes(s, dir, 3)))
    }),
    // the simhash CLASS-TABLE MERGE incremental (VERDICT r17 #5b):
    // only the batch is hashed; new docs bump or mint classes in the
    // staged standing class table, the banded pair delta comes from
    // the touched classes, untouched standing pairs pass through from
    // the staged standing pair table. Output == the full rebuild row
    // for row, so the oracle is dedup_simhash's, verbatim.
    "dedup_simhash_incremental" -> ((s, dir) => {
      Dedup.simhashPairsIncremental(
        graft.ext.PairStage.simhashClasses(s, dir, excludeMod = 3),
        graft.ext.PairStage.simhashClassPairs(s, dir, maxHamming = 3,
          excludeMod = 3),
        t(s, dir, "documents").filter(col("doc_id") % 10 === 3),
        "doc_id", "text")
    }),
    // the DELTA contract of the same merge (r19): add/del rows against
    // the persisted standing pair table instead of the full merged
    // table — the batch-proportional OUTPUT form that removes the
    // corpus-class-sized rewrite the full-table contract pays every
    // increment (the SCALE.md r19 simhash plateau finding).
    "dedup_simhash_delta" -> ((s, dir) => {
      Dedup.simhashPairsDelta(
        graft.ext.PairStage.simhashClasses(s, dir, excludeMod = 3),
        graft.ext.PairStage.simhashClassPairs(s, dir, maxHamming = 3,
          excludeMod = 3),
        t(s, dir, "documents").filter(col("doc_id") % 10 === 3),
        "doc_id", "text")
    }),
    // the NORMALIZED-artifact delta (r19): change set on pair IDENTITY
    // (doc_a, doc_b, hamming) only — sizes live in the class table, so
    // a count bump on a big duplicate class no longer rewrites every
    // pair row of that class (61% of the full-row delta at sf10 was
    // such size-only churn; SCALE.md r19).
    "dedup_simhash_identity_delta" -> ((s, dir) => {
      Dedup.simhashPairsIdentityDelta(
        graft.ext.PairStage.simhashClasses(s, dir, excludeMod = 3),
        graft.ext.PairStage.simhashClassPairs(s, dir, maxHamming = 3,
          excludeMod = 3),
        t(s, dir, "documents").filter(col("doc_id") % 10 === 3),
        "doc_id", "text")
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
      // class-pair table is STAGED (r17): built once per corpus
      // snapshot, shared with the agreement matrix
      graft.ext.PairStage.simhashClassPairs(s, dir, maxHamming = 3)),
    // the 2x2x2 dedup-modality agreement matrix (r17 #5): minhash x
    // simhash x semantic pair classification with exact ppm shares
    // per canonical source pair — the eps/threshold calibration
    // observable. Enumerates only the bounded minhash ∪ semantic
    // union; the simhash-only cell derives by exact class-space
    // subtraction (see Dedup.agreementMatrix).
    "dedup_agreement_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      val sem = Similarity.semDedupFrom(
          graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
          graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
          eps = 0.3)
        .filter(col("removed_by").isNotNull)
        .select(col("vec_id"), col("removed_by"))
      Dedup.agreementMatrix(
        docs.select(col("doc_id"), col("source")),
        graft.ext.PairStage.lshPairs(s, dir),
        docs.select(col("doc_id"),
          Dedup.simhash(col("text")).as("sh")),
        graft.ext.PairStage.simhashClassPairs(s, dir, maxHamming = 3),
        sem)
    }),
    "dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // staged corpus-level pair table (build-once contract; shared
      // with dedup_keep_representative)
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
    }),
    // the mega-cluster pathology check over the same staged pair
    // table: power-of-two cluster-size histogram with exact-ppm doc
    // shares — what decides cluster-capping before keep-representative
    "dedup_cluster_size_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      Dedup.clusterSizeReport(
        Dedup.connectedComponents(docs.select(col("doc_id")), pairs))
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
        planes = Similarity.autoPlanes(
          graft.ext.PairStage.corpusCard(s, dir)._1), tables = 4,
        threshold = 0.3)
    }),
    // SemDeDup semantic pruning: Lloyd cells bound the pair stream,
    // centrality-order scan inside each cell removes anything within
    // eps cosine of an earlier member (eps matches the
    // dedup_embedding_cosine near-dup threshold); reuses the staged
    // kmeans fit shared with the whole IVF family
    "dedup_semdedup" -> ((s, dir) => {
      val nc = Similarity.autoCentroids(
        graft.ext.PairStage.corpusCard(s, dir)._1)
      Similarity.semDedupFrom(
        graft.ext.PairStage.ivfCorpusCells(s, dir, nc, iters = 2),
        graft.ext.PairStage.ivfCentroids(s, dir, nc, iters = 2),
        eps = 0.3)
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
    // degree histogram of the near-dup graph over ALL docs (bucket 0 =
    // isolated): the hub-pathology check that tells whether the df-cap
    // is working BEFORE components/pagerank pay the skew
    "graph_degree_report" -> ((s, dir) =>
      Graph.degreeReport(
        t(s, dir, "documents").select(col("doc_id")),
        graft.ext.PairStage.lshPairs(s, dir))),
    // source-priority representative selection: within each near-dup
    // cluster keep the doc from the most-trusted source (priority from
    // a broadcast rank dim over the distinct sources — standing in for
    // the curated source-priority table every production dedup has;
    // doc_id breaks ties inside a source). The min-label
    // representative (dedup_keep_representative) ignores WHERE a doc
    // came from; this is the knob that prefers wiki over CC when both
    // carry the same content.
    "dedup_keep_priority" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      val comp = Dedup.connectedComponents(
        docs.select(col("doc_id")), pairs)
      // priority dim: |sources| rows, ranked lexicographically — the
      // window sorts the distinct-source frame only, never docs
      val prio = docs.select(col("source")).distinct()
        .withColumn("priority", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("source")))
          .cast("long"))
      Dedup.keepByPriority(comp,
        docs.select(col("doc_id"), col("source")), prio)
    }),
  )

  /** The class-collapsed simhash pair replay — shared VERBATIM by
    * dedup_simhash and dedup_simhash_incremental (the incremental
    * reconstructs the entire merged pair table, so its oracle IS the
    * rebuild's; byte-identical text also lets the oracle runner's
    * shared-CTE materialization evaluate the replay once). */
  /** The simhash class-pair replay CTE chain over the `documents` rows
    * matching `where`, every CTE name suffixed `sfx` so two corpus
    * slices can coexist inside one oracle (the delta oracle replays
    * full AND standing). Both [[SimhashPairsOracle]] and the delta
    * oracle's full side instantiate this with ("", "") so their chains
    * stay byte-identical — which is what lets the gate's shared-CTE
    * materializer (tools/cte_mat.py) stage the full-corpus replay
    * once across all simhash oracles. */
  private def simhashChainSql(sfx: String, where: String): String =
    s"""tokraw$sfx AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents$where),
      tokd$sfx AS (SELECT DISTINCT doc_id, token FROM tokraw$sfx),
      h$sfx AS (SELECT doc_id, ${hex60Sql("token")} AS th FROM tokd$sfx),
      sg$sfx AS (SELECT doc_id,
         $SimhashBitSum AS sh
       FROM h$sfx GROUP BY doc_id),
      cls$sfx AS (SELECT sh, min(doc_id) AS rep, count(*) AS n
              FROM sg$sfx GROUP BY sh),
      chunks$sfx AS (SELECT rep, sh, n, unnest([
          {c: 0, k: (sh >> 0) & 65535},  {c: 1, k: (sh >> 16) & 65535},
          {c: 2, k: (sh >> 32) & 65535}, {c: 3, k: (sh >> 48) & 65535}])
          AS ck FROM cls$sfx),
      cand$sfx AS (SELECT DISTINCT x.rep AS doc_a, x.sh AS sh_a, x.n AS n_a,
                      y.rep AS doc_b, y.sh AS sh_b, y.n AS n_b
               FROM chunks$sfx x JOIN chunks$sfx y
                 ON x.ck = y.ck AND x.rep < y.rep)"""

  /** The pair-table SELECT over a [[simhashChainSql]] chain. */
  private def simhashSelectSql(sfx: String): String =
    s"""SELECT doc_a, doc_b,
             CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming,
             n_a, n_b, CAST(n_a * n_b AS BIGINT) AS n_pairs
      FROM cand$sfx WHERE bit_count(xor(sh_a, sh_b)) <= 3
      UNION ALL
      SELECT rep AS doc_a, rep AS doc_b, CAST(0 AS BIGINT) AS hamming,
             n AS n_a, n AS n_b, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
      FROM cls$sfx WHERE n >= 2"""

  private val SimhashPairsOracle: String = s"""
      WITH ${simhashChainSql("", "")}
      ${simhashSelectSql("")}"""

  /** dedup_simhash_delta oracle: the symmetric difference of the full
    * rebuild's pair table and the standing (doc_id % 10 <> 3) pair
    * table, tagged add/del — exactly the change set the Spark side's
    * batch-proportional merge must produce. */
  private val SimhashDeltaOracle: String = s"""
      WITH ${simhashChainSql("", "")},
      fullp AS (${simhashSelectSql("")}),
      standp AS (WITH ${simhashChainSql("_s", " WHERE doc_id % 10 <> 3")}
        ${simhashSelectSql("_s")})
      SELECT 'add' AS op, doc_a, doc_b, hamming, n_a, n_b, n_pairs FROM
        (SELECT * FROM fullp EXCEPT SELECT * FROM standp)
      UNION ALL
      SELECT 'del' AS op, doc_a, doc_b, hamming, n_a, n_b, n_pairs FROM
        (SELECT * FROM standp EXCEPT SELECT * FROM fullp)"""

  /** dedup_simhash_identity_delta oracle: the same symmetric
    * difference projected to pair identity (doc_a, doc_b, hamming) —
    * the normalized-artifact change set. */
  private val SimhashIdentityDeltaOracle: String = s"""
      WITH ${simhashChainSql("", "")},
      fullp AS (${simhashSelectSql("")}),
      standp AS (WITH ${simhashChainSql("_s", " WHERE doc_id % 10 <> 3")}
        ${simhashSelectSql("_s")})
      SELECT 'add' AS op, doc_a, doc_b, hamming FROM
        (SELECT doc_a, doc_b, hamming FROM fullp
         EXCEPT SELECT doc_a, doc_b, hamming FROM standp)
      UNION ALL
      SELECT 'del' AS op, doc_a, doc_b, hamming FROM
        (SELECT doc_a, doc_b, hamming FROM standp
         EXCEPT SELECT doc_a, doc_b, hamming FROM fullp)"""

  val oracleSql: Map[String, String] = Map(
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
    // the KMV replay of sketch_kmv_jaccard over (source, 3-shingle):
    // distinct hashes, per-source 256-minima sketch, merged-union
    // re-cut, membership join — all windows bounded by k; exact truth
    // from the distinct shingle-string sets
    "dedup_source_overlap_kmv" -> s"""
      WITH tok AS (SELECT source,
             regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents),
      d AS (SELECT DISTINCT source AS cls,
             unnest(list_transform(range(len(toks) - 2),
               i -> array_to_string(toks[i+1:i+3], ' '))) AS it
           FROM tok),
      hh AS (SELECT DISTINCT cls, ${hex60Sql("it")} AS h FROM d),
      sk AS (SELECT cls, h FROM (SELECT cls, h, row_number() OVER
               (PARTITION BY cls ORDER BY h) AS r FROM hh) WHERE r <= 256),
      cl AS (SELECT DISTINCT cls FROM sk),
      pc AS (SELECT x.cls AS cls_a, y.cls AS cls_b
             FROM cl x JOIN cl y ON x.cls < y.cls),
      mg AS (SELECT DISTINCT cls_a, cls_b, h FROM (
               SELECT pc.cls_a, pc.cls_b, s.h FROM pc
                 JOIN sk s ON s.cls = pc.cls_a
               UNION ALL
               SELECT pc.cls_a, pc.cls_b, s.h FROM pc
                 JOIN sk s ON s.cls = pc.cls_b)),
      tu AS (SELECT cls_a, cls_b, h FROM (SELECT *, row_number() OVER
               (PARTITION BY cls_a, cls_b ORDER BY h) AS r FROM mg)
             WHERE r <= 256),
      est AS (SELECT cls_a, cls_b, CAST(count(*) AS BIGINT) AS k_used,
               CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
             FROM tu
               LEFT JOIN sk sa ON sa.cls = tu.cls_a AND sa.h = tu.h
               LEFT JOIN sk sb ON sb.cls = tu.cls_b AND sb.h = tu.h
             GROUP BY 1, 2),
      ex AS (SELECT x.cls AS cls_a, y.cls AS cls_b,
               CAST(count(*) AS BIGINT) AS n_inter
             FROM d x JOIN d y ON x.it = y.it AND x.cls < y.cls
             GROUP BY 1, 2),
      sz AS (SELECT cls, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
      SELECT est.cls_a AS source_a, est.cls_b AS source_b, k_used, n_both,
             n_both * 1000000 // k_used AS kmv_jaccard_ppm,
             COALESCE(ex.n_inter, 0) AS n_inter,
             sa.n AS n_a, sb.n AS n_b,
             COALESCE(ex.n_inter, 0) * 1000000
               // (sa.n + sb.n - COALESCE(ex.n_inter, 0))
               AS exact_jaccard_ppm,
             abs(n_both * 1000000 // k_used
               - COALESCE(ex.n_inter, 0) * 1000000
                 // (sa.n + sb.n - COALESCE(ex.n_inter, 0)))
               AS abs_err_ppm
      FROM est
        LEFT JOIN ex ON ex.cls_a = est.cls_a AND ex.cls_b = est.cls_b
        JOIN sz sa ON sa.cls = est.cls_a
        JOIN sz sb ON sb.cls = est.cls_b""",
    // the pair oracle joined twice to the source labels, folded to the
    // unordered source matrix; share as exact integer ppm of the total
    "dedup_source_overlap_report" -> s"""
      WITH lp AS (SELECT doc_a, doc_b FROM (${minhashPairsSql()}) x),
      lab AS (SELECT LEAST(da.source, db.source) AS source_a,
                     GREATEST(da.source, db.source) AS source_b
              FROM lp
              JOIN documents da ON da.doc_id = lp.doc_a
              JOIN documents db ON db.doc_id = lp.doc_b),
      m AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
            FROM lab GROUP BY 1, 2),
      tot AS (SELECT sum(n_pairs) AS t FROM m)
      SELECT source_a, source_b, n_pairs,
             CAST(n_pairs * 1000000 // t AS BIGINT) AS share_ppm
      FROM m, tot""",
    // each band config's candidate set vs the same exact-jaccard
    // truth; every count, recall and overhead value an exact integer
    "dedup_lsh_tune_report" -> {
      val bandCtes = Seq(4, 8, 16).map { b =>
        s"""bands$b AS (SELECT doc_id, unnest([
           ${minhashBandStructsFor(b)}]) AS bk FROM sig),
      cand$b AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands$b x JOIN bands$b y
                   ON x.bk = y.bk AND x.doc_id < y.doc_id),
      row$b AS (SELECT CAST($b AS BIGINT) AS bands,
          (SELECT CAST(count(*) AS BIGINT) FROM cand$b) AS n_candidates,
          CAST(count(*) AS BIGINT) AS n_truth,
          CAST(count(c.doc_b) AS BIGINT) AS matched,
          CAST(count(c.doc_b) * 1000000 // NULLIF(count(*), 0)
            AS BIGINT) AS recall_ppm,
          CAST((SELECT count(*) FROM cand$b) * 1000000
            // NULLIF(count(*), 0) AS BIGINT) AS overhead_ppm
        FROM truth tr LEFT JOIN cand$b c
          ON c.doc_a = tr.doc_a AND c.doc_b = tr.doc_b)"""
      }.mkString(",\n      ")
      s"""
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
                GROUP BY 1, 2),
      truth AS (SELECT doc_a, doc_b FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.5),
      bs AS (SELECT doc_id, ${hex60Sql("shingle")} % ${Dedup.MinhashP}
               AS b FROM sh),
      sig AS (SELECT doc_id,
       $MinhashSigCols
       FROM bs GROUP BY doc_id),
      $bandCtes
      SELECT * FROM row4
      UNION ALL SELECT * FROM row8
      UNION ALL SELECT * FROM row16"""
    },
    // full-LSH pairs restricted to batch-touching ones: the
    // incremental plan must emit exactly this set
    "dedup_incremental" -> minhashPairsSql(
      extraWhere = " AND (doc_a % 10 = 3 OR doc_b % 10 = 3)"),
    // the exact-truth incremental: the full exact-Jaccard pair set
    // (full-corpus df-cap) restricted to batch-touching pairs — which
    // the class-merge-free incremental plan must reproduce exactly
    "dedup_jaccard_incremental" ->
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
        WHERE n_inter * 1.0 / (sa.n_tokens + sb.n_tokens - n_inter) >= 0.8
          AND (doc_a % 10 = 3 OR doc_b % 10 = 3)""",
    // the class-merge incremental reconstructs the ENTIRE merged pair
    // table — its oracle is the full rebuild's oracle, verbatim
    // (byte-identical WITH prefix, so the oracle runner's shared-CTE
    // materialization can evaluate the replay once for both)
    "dedup_simhash_incremental" -> SimhashPairsOracle,
    "dedup_simhash" -> SimhashPairsOracle,
    "dedup_simhash_delta" -> SimhashDeltaOracle,
    "dedup_simhash_identity_delta" -> SimhashIdentityDeltaOracle,
    // the agreement matrix: minhash + semdedup replays enumerate the
    // union (each embedded as its own WITH-subquery); simhash
    // membership via the class CTEs; the simhash-only cell by exact
    // class-space subtraction — mirror of Dedup.agreementMatrix
    "dedup_agreement_report" -> s"""
      WITH tokraw AS (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents),
      tokd AS (SELECT DISTINCT doc_id, token FROM tokraw),
      hh AS (SELECT doc_id, ${hex60Sql("token")} AS th FROM tokd),
      sg AS MATERIALIZED (SELECT doc_id,
         $SimhashBitSum AS sh
       FROM hh GROUP BY doc_id),
      cls AS (SELECT sh, min(doc_id) AS rep FROM sg GROUP BY sh),
      mem AS MATERIALIZED (SELECT sg.doc_id, cls.rep
             FROM sg JOIN cls USING (sh)),
      chunks AS (SELECT rep, sh, unnest([
          {c: 0, k: (sh >> 0) & 65535},  {c: 1, k: (sh >> 16) & 65535},
          {c: 2, k: (sh >> 32) & 65535}, {c: 3, k: (sh >> 48) & 65535}])
          AS ck FROM cls),
      xp AS MATERIALIZED (
        SELECT DISTINCT x.rep AS rep_a, y.rep AS rep_b
        FROM chunks x JOIN chunks y
          ON x.ck = y.ck AND x.rep < y.rep
        WHERE bit_count(xor(x.sh, y.sh)) <= 3),
      mh AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b
            FROM (${minhashPairsSql()})),
      sem AS MATERIALIZED (
        SELECT least(vec_id, removed_by) AS a,
               greatest(vec_id, removed_by) AS b
        FROM (${QueryShared.SemDedupSql})
        WHERE removed_by IS NOT NULL),
      u AS (SELECT a, b,
              CASE WHEN _m IS NULL THEN 0 ELSE 1 END AS in_minhash,
              CASE WHEN _e IS NULL THEN 0 ELSE 1 END AS in_semantic
            FROM (SELECT a, b, 1 AS _m FROM mh) mhj
            FULL JOIN (SELECT a, b, 1 AS _e FROM sem) semj USING (a, b)),
      uf AS (SELECT least(da.source, db.source) AS src_lo,
               greatest(da.source, db.source) AS src_hi,
               u.in_minhash,
               CASE WHEN ma.rep = mb.rep THEN 1
                    WHEN xp.rep_a IS NOT NULL THEN 1 ELSE 0 END
                 AS in_simhash,
               u.in_semantic
             FROM u
             JOIN mem ma ON ma.doc_id = u.a
             JOIN mem mb ON mb.doc_id = u.b
             LEFT JOIN xp ON xp.rep_a = least(ma.rep, mb.rep)
                         AND xp.rep_b = greatest(ma.rep, mb.rep)
             JOIN documents da ON da.doc_id = u.a
             JOIN documents db ON db.doc_id = u.b),
      cellsU AS (SELECT src_lo, src_hi, in_minhash, in_simhash,
               in_semantic, count(*) AS n_pairs
             FROM uf GROUP BY 1, 2, 3, 4, 5),
      cs AS (SELECT mem.rep, d.source, count(*) AS c
             FROM mem JOIN documents d USING (doc_id) GROUP BY 1, 2),
      xtot AS (SELECT least(ca.source, cb.source) AS src_lo,
               greatest(ca.source, cb.source) AS src_hi,
               SUM(ca.c * cb.c) AS n
             FROM xp
             JOIN cs ca ON ca.rep = xp.rep_a
             JOIN cs cb ON cb.rep = xp.rep_b GROUP BY 1, 2),
      itot AS (SELECT x.source AS src_lo, y.source AS src_hi,
               SUM(CASE WHEN x.source = y.source
                        THEN x.c * (x.c - 1) // 2
                        ELSE x.c * y.c END) AS n
             FROM cs x JOIN cs y
               ON x.rep = y.rep AND x.source <= y.source
             GROUP BY 1, 2),
      stot AS (SELECT src_lo, src_hi, SUM(n) AS s_tot
             FROM (SELECT * FROM xtot UNION ALL
                   SELECT * FROM itot WHERE n > 0) GROUP BY 1, 2),
      sinu AS (SELECT src_lo, src_hi, SUM(n_pairs) AS s_in_u
             FROM cellsU WHERE in_simhash = 1 GROUP BY 1, 2),
      sonly AS (SELECT s.src_lo, s.src_hi, 0 AS in_minhash,
               1 AS in_simhash, 0 AS in_semantic,
               s.s_tot - COALESCE(iu.s_in_u, 0) AS n_pairs
             FROM stot s LEFT JOIN sinu iu USING (src_lo, src_hi)
             WHERE s.s_tot - COALESCE(iu.s_in_u, 0) > 0),
      allc AS (SELECT * FROM cellsU UNION ALL SELECT * FROM sonly),
      tt AS (SELECT SUM(n_pairs) AS t FROM allc)
      SELECT src_lo, src_hi, CAST(in_minhash AS BIGINT) AS in_minhash,
             CAST(in_simhash AS BIGINT) AS in_simhash,
             CAST(in_semantic AS BIGINT) AS in_semantic,
             CAST(n_pairs AS BIGINT) AS n_pairs,
             CAST(n_pairs * 1000000 // t AS BIGINT) AS share_ppm
      FROM allc CROSS JOIN tt""",
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
    // size histogram over the clusters subquery: bucket =
    // length(bin(size)) (engine-portable floor(log2)+1), share
    // denominator from the histogram's own sum — integer floor-div
    "dedup_cluster_size_report" -> s"""
      WITH sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
                     FROM ($DedupClustersSql) GROUP BY component),
      b AS (SELECT CAST(length(bin(sz)) AS BIGINT) AS size_bucket,
                   CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(sum(sz) AS BIGINT) AS n_docs
            FROM sizes GROUP BY 1)
      SELECT size_bucket, n_clusters, n_docs,
             n_docs * 1000000
               // (SELECT CAST(sum(n_docs) AS BIGINT) FROM b)
               AS docs_share_ppm
      FROM b""",
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
    // SemDeDup replay: the shared Lloyd-fit CTEs, centrality rank per
    // cell (dot to the final centroid, id tiebreak), then the
    // earlier-member scan — removed iff an earlier-ranked cell-mate
    // sits within eps cosine; mega cells (> 4096) excluded from the
    // pair join exactly like the Spark guard
    "dedup_semdedup" -> SemDedupSql,
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

    // same LSH pair graph; endpoint-union degree, left join keeps
    // isolated docs at degree 0 (bucket 0), length(bin(deg)) buckets,
    // histogram-internal ppm denominator — integer floor-div both sides
    "graph_degree_report" -> s"""
      WITH lp AS (SELECT doc_a, doc_b FROM (${minhashPairsSql()}) x),
      deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT doc_a AS doc_id FROM lp
                    UNION ALL SELECT doc_b FROM lp)
              GROUP BY 1),
      alln AS (SELECT d.doc_id, coalesce(g.deg, 0) AS deg
               FROM documents d LEFT JOIN deg g USING (doc_id)),
      b AS (SELECT CASE WHEN deg = 0 THEN 0
                        ELSE CAST(length(bin(deg)) AS BIGINT)
                   END AS degree_bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(deg) AS BIGINT) AS total_degree
            FROM alln GROUP BY 1)
      SELECT degree_bucket, n_docs, total_degree,
             n_docs * 1000000
               // (SELECT CAST(sum(n_docs) AS BIGINT) FROM b)
               AS docs_share_ppm
      FROM b""",
    // clusters CTE + source labels + the lexicographic-rank priority
    // dim; per-component argmin replayed as a (priority, doc_id)
    // window rank over the labeled cluster rows
    "dedup_keep_priority" -> s"""
      WITH comp AS ($DedupClustersSql),
      prio AS (SELECT source,
                 CAST(row_number() OVER (ORDER BY source) AS BIGINT)
                   AS priority
               FROM (SELECT DISTINCT source FROM documents)),
      lab AS (SELECT c.component, c.doc_id, d.source, p.priority
              FROM comp c
              JOIN documents d USING (doc_id)
              JOIN prio p ON p.source = d.source),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY component
                ORDER BY priority, doc_id) AS rn,
              CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                AS cluster_size
            FROM lab)
      SELECT component, doc_id AS keeper_id, source AS keeper_source,
             priority AS keeper_priority, cluster_size
      FROM r WHERE rn = 1""",
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
  )
}
