package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{AsOfJoin, Audio, Corpus, Dedup, Graph, Multimodal, Packing, RangeJoin, Sampling, Similarity, Sketches, TextOps, Video, Windows}


import QueryShared._

/** Deterministic sampling and split assignment.
  *
  * One family slice of the extension registry — [[ExtQueries]]
  * aggregates every slice behind the unchanged `queries` /
  * `oracleSql` surface (the r10 split of the 4.4k-line
  * monolith; entries are verbatim, no behavior change).
  */
object ExtQueriesSampling {

  val queries: Map[String, Q] = Map(

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
    // leakage-safe split at the NEAR-DUP-CLOSURE level: the split key
    // is the connected-component label over the staged 0.8-jaccard
    // pair graph, so two near-duplicate documents can never straddle
    // train/val/test (Lee et al. 2022's contamination concern — a
    // doc-keyed split leaks every split-straddling near-dup pair into
    // eval). Per (source, split) doc counts, plus the audit pair: the
    // component split's straddle count (0 by construction, COMPUTED
    // from the pair table, not asserted) next to the straddle count
    // the naive doc-keyed split would have produced on the same pairs
    "sample_component_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.ext.PairStage.jaccardPairs(s, dir)
      val comps = Dedup.connectedComponents(
        docs.select(col("doc_id")), pairs)
      val assigned = docs.select(col("doc_id"), col("source"))
        .join(comps, Seq("doc_id"))
        .withColumn("split", Sampling.splitColumn(col("component"),
          valPct = 0.1, testPct = 0.1, salt = "comp"))
        .withColumn("_naive", Sampling.splitColumn(col("doc_id"),
          valPct = 0.1, testPct = 0.1, salt = "comp"))
      val sp = assigned.select(col("doc_id"), col("split"), col("_naive"))
      val straddle = pairs
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("_ca"),
          col("_naive").as("_na")), Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("_cb"),
          col("_naive").as("_nb")), Seq("doc_b"))
        .agg(
          coalesce(sum((col("_ca") =!= col("_cb")).cast("long")), lit(0L))
            .as("n_cross_pairs"),
          coalesce(sum((col("_na") =!= col("_nb")).cast("long")), lit(0L))
            .as("n_cross_pairs_naive"))
        .withColumn("_one", lit(1))
      assigned.groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("_one", lit(1))
        .join(broadcast(straddle), Seq("_one"))
        .drop("_one")
    }),
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
    // priority sampling (Duffield-Lund-Thorup): token-weighted
    // fixed-size doc draw — longer docs proportionally likelier,
    // sample size exactly k, deterministic and engine-replayable
    "sample_weighted_priority" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      Sampling.prioritySample(docs, col("doc_id"), col("n_tokens"),
        k = 100)
    }),
  )

  val oracleSql: Map[String, String] = Map(
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
    // component-keyed split over the shared clusters CTE block, with
    // both straddle audits computed from the same pairs CTE the
    // clustering walked
    "sample_component_split" -> {
      def splitCase(key: String) = s"""
             CASE WHEN (${hex60Sql(s"'comp' || CAST($key AS VARCHAR)")}
                          % ${Sampling.Buckets})
                    < ${(0.1 * Sampling.Buckets).toLong} THEN 'test'
                  WHEN (${hex60Sql(s"'comp' || CAST($key AS VARCHAR)")}
                          % ${Sampling.Buckets})
                    < ${(0.2 * Sampling.Buckets).toLong} THEN 'val'
                  ELSE 'train' END"""
      s"""
      WITH RECURSIVE
      ${clustersCtes("SELECT doc_id, text FROM documents")},
      comp AS (SELECT node AS doc_id, min(lbl) AS component
               FROM walk GROUP BY node),
      asg AS MATERIALIZED (SELECT d.doc_id, d.source,
                ${splitCase("comp.component")} AS split,
                ${splitCase("d.doc_id")} AS naive
              FROM documents d JOIN comp ON comp.doc_id = d.doc_id),
      st AS (SELECT
               COALESCE(CAST(sum(CASE WHEN a.split <> b.split
                 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_cross_pairs,
               COALESCE(CAST(sum(CASE WHEN a.naive <> b.naive
                 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_cross_pairs_naive
             FROM pairs p
             JOIN asg a ON a.doc_id = p.doc_a
             JOIN asg b ON b.doc_id = p.doc_b),
      cells AS (SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
                FROM asg GROUP BY 1, 2)
      SELECT source, split, n_docs, n_cross_pairs, n_cross_pairs_naive
      FROM cells CROSS JOIN st"""
    },
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
    // priority sampling replay: same bucket hash, same integer
    // priority, same (priority, key) total order
    "sample_weighted_priority" -> s"""
      WITH d AS (SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                     AS BIGINT) AS n_tokens
                 FROM documents)
      SELECT doc_id, n_tokens FROM d
      ORDER BY ${bucketSql("doc_id")} * ${Sampling.Buckets}
                 // LEAST(GREATEST(n_tokens, 1), ${Sampling.Buckets - 1}),
               doc_id
      LIMIT 100""",
  )
}
