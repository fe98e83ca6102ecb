package graft.ext

import graft.SparkSpec

/** Physical-plan shape assertions for the similarity search paths:
  * the properties that make them survive a 100x scale-up are plan
  * facts, not output facts, so they are pinned here — the oracle rows
  * prove the VALUES, these prove the SHAPE that computes them.
  */
class PlanShapeSpec extends SparkSpec {

  private def ivfPlan: String =
    graft.registry.ExtQueries.queries("sim_ivf_topk")(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("ivfTopK ranks with partial aggregation, never an unbounded window sort") {
    val plan = ivfPlan
    // r17: the serving plan reads the STAGED inverted list — the
    // corpus argmax must be GONE from a retrieval call entirely (it
    // runs once, at PairStage.ivfCorpusCells staging; the build-path
    // shape is pinned below). The final top-k must still be the
    // map-side-combining bounded-heap aggregate.
    assert(!plan.contains("max_by"),
      s"serving plan re-runs the corpus assignment argmax:\n$plan")
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"final ranking is not the bounded-heap partial aggregate:\n$plan")
    // the BUILD path (the staged assignment) keeps the partial-agg
    // argmax shape: a row_number window over the broadcast-expanded
    // corpus would shuffle-and-sort n x nCentroids rows
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = PairStage.ivfCentroids(spark, sf0001,
      Similarity.autoCentroids(emb.count()), iters = 2)
    val buildPlan = Similarity.ivfAssignWith(cents, emb, "vec_id",
      "embedding").queryExecution.executedPlan.toString
    assert(buildPlan.contains("partial_max_by"),
      s"staged-assignment build lost its partial argmax:\n$buildPlan")
    // the one remaining window is the QUERY-side probe-cell selection
    // (queries x nCentroids rows), and it must carry a map-side
    // WindowGroupLimit so each task forwards at most nProbe rows per
    // query into the exchange — the bounded form of rank-filtering
    val windows = "(?<!Group)Window ".r.findAllIn(plan).size
    assert(windows <= 1, s"unexpected window operators:\n$plan")
    if (windows == 1)
      assert("WindowGroupLimit .*Partial".r.findFirstIn(plan).isDefined,
        s"probe-cell window lacks the partial group limit:\n$plan")
  }

  test("ivfTopK probes with a broadcast of centroids, not a corpus shuffle join") {
    val plan = ivfPlan
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring lost its broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in the IVF plan:\n$plan")
  }

  test("brute-force heap top-k aggregates partially too") {
    val plan = graft.registry.ExtQueries
      .queries("sim_bruteforce_topk_agg")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"heap top-k is not partially aggregated:\n$plan")
    assert(!plan.contains("Window"))
  }

  private def extPlan(name: String): String =
    graft.registry.ExtQueries.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("staged-pair consumers read the artifact, never recompute pair-gen") {
    // graph_pagerank / graph_triangles read PairStage's parquet edge
    // list; if the staging silently regressed to inline re-derivation,
    // shingle/minhash expressions would reappear in their plans and
    // the bench would quietly triple-pay the dominant cost again
    Seq("graph_pagerank", "graph_triangles").foreach { name =>
      val plan = extPlan(name)
      assert(!plan.toLowerCase.contains("shingle") &&
        !plan.toLowerCase.contains("minhash"),
        s"$name recomputes pair-gen instead of reading the staged " +
          s"artifact:\n$plan")
    }
    // both graph queries eagerly materialize their small results
    // (lineage truncated by design), so the positive artifact-scan
    // assertion runs on lsh_recall_report, whose candidate side reads
    // the same staged table through a lazy plan
    val recall = extPlan("lsh_recall_report")
    assert(recall.contains("graft_lsh_pairs"),
      s"lsh_recall_report does not scan the staged pair artifact:\n$recall")
  }

  test("bpe tokenization joins the corpus against a vocabulary lookup") {
    // the per-word fold must stay on the vocabulary side: the corpus
    // side of text_bpe_tokenize is explode + join + agg, with no
    // higher-order aggregate() fold over document rows
    val plan = extPlan("text_bpe_tokenize")
    assert(plan.contains("graft_bpe_"),
      s"tokenize does not read the staged trained state:\n$plan")
    assert(!plan.toLowerCase.contains("aggregate(lambdafunction"),
      s"re-tokenize fold leaked onto the corpus side:\n$plan")
  }

  test("segment dedup plans hash aggregates + joins, never a window sort") {
    val plan = extPlan("dedup_repeated_segments")
    assert(!plan.contains("Window "), s"window in segment dedup:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"keep-first min is not a hash aggregate:\n$plan")
  }

  test("fixed-size sampling and top-bigrams plan TakeOrdered, not a global sort") {
    val fs = extPlan("sample_fixed_size")
    assert(fs.contains("TakeOrderedAndProject"),
      s"fixed-size sample is not TakeOrdered:\n$fs")
    val bg = extPlan("vocab_top_bigrams")
    assert(bg.contains("TakeOrderedAndProject"),
      s"top-bigrams limit is not TakeOrdered:\n$bg")
    // the per-task forward is k rows; a standalone Sort exec would
    // shuffle-and-sort every group count
    assert("Sort \\[".r.findFirstIn(bg).isEmpty,
      s"global sort in top-bigrams:\n$bg")
    assert("Sort \\[".r.findFirstIn(fs).isEmpty,
      s"global sort in fixed-size sample:\n$fs")
  }

  test("class rebalancing broadcasts the count frame, never shuffles the facts") {
    val plan = extPlan("balance_event_classes")
    assert(plan.contains("BroadcastHashJoin"),
      s"class counts are not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact table shuffled for the class join:\n$plan")
  }

  test("per-source curation ranks via the partial heap aggregate") {
    val plan = extPlan("curate_topk_per_source")
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"per-source top-k is not partially aggregated:\n$plan")
    assert(!plan.contains("Window "), s"window in curation plan:\n$plan")
  }

  test("random projection and C4 flags stay narrow (no exchange)") {
    for (q <- Seq("emb_random_projection", "text_c4_filter")) {
      val plan = extPlan(q)
      assert(!plan.contains("Exchange"),
        s"$q should be a narrow map but plans an exchange:\n$plan")
    }
  }

  test("domain mixing is a narrow literal-map filter — zero joins, zero exchanges") {
    // the per-class constants ride literal maps, so after the one
    // driver-side count job the kept-set filter must be a pure narrow
    // map over the fact scan: at 100x the fact table neither shuffles
    // nor joins
    val plan = extPlan("sample_domain_mixture")
    assert(!plan.contains("Exchange"),
      s"mixture filter should be narrow but plans an exchange:\n$plan")
    assert(!plan.contains("Join"),
      s"mixture filter should use literal maps, not a join:\n$plan")
  }

  test("multimodal decode is partition-local over the payload scan") {
    // codec work must stay where the bytes are: mapPartitions over the
    // scan, no exchange before the decode (a shuffle would move every
    // binary payload across the cluster)
    val plan = extPlan("mm_decode_features")
    assert(plan.contains("MapPartitions"),
      s"decode lost its partition-local shape:\n$plan")
    assert(!plan.contains("Exchange"),
      s"binary payloads shuffled before decode:\n$plan")
  }

  test("per-group fixed-k sampling ranks via the partial heap, never a window sort") {
    // the whole point of the heap form: <= k rows forwarded per task
    // per group; a row_number window would shuffle-and-sort every doc
    val plan = extPlan("sample_fixed_per_group")
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"per-group sample is not partially aggregated:\n$plan")
    assert(!plan.contains("Window "),
      s"window sort in the per-group sample plan:\n$plan")
  }

  test("quantile-error exact side runs bucket-partitioned — no unpartitioned window") {
    // on a continuous column the distinct-value histogram is ~n rows;
    // an unpartitioned running-sum window over it would be a
    // single-task global sort. The split-merge rewrite leaves exactly
    // one window, partitioned by the bucket index (n/B rows per task),
    // with the cross-bucket carry as a metadata-sized broadcast join
    val plan = extPlan("sketch_quantile_error")
    val windows = "Window \\[[^\\]]*\\](, \\[[^\\]]*\\])*".r
      .findAllIn(plan).toList
    assert(windows.nonEmpty, s"expected the in-bucket window:\n$plan")
    windows.foreach { w =>
      // simple-mode print: Window [exprs], [partitionSpec], [orderSpec];
      // an unpartitioned window drops the middle bracket group
      assert(w.count(_ == '[') >= 3,
        s"unpartitioned window in the quantile plan: $w\n$plan")
    }
  }

  test("gap-fill grid joins broadcast — the fact table never reshuffles for the grid") {
    // hours x types is the bounded build side; the counts side arrives
    // hash-partitioned from its own aggregation and must not pick up a
    // second exchange for the grid join
    val plan = extPlan("window_gapfill")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoop"),
      s"gap-fill grid is not broadcast:\n$plan")
  }
}
