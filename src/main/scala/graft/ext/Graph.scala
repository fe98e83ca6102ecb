package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over document-similarity graphs.
  *
  * [[Dedup.connectedComponents]] answers "which docs form one near-dup
  * cluster"; [[Graph.pageRankPpb]] answers the follow-up a curation
  * pipeline asks next: WITHIN the similarity graph, which documents
  * are central (canonical-candidate ranking, crawl-frontier
  * prioritization over a link graph, seed selection). Reference:
  * Page et al., "The PageRank Citation Ranking" (1999).
  */
object Graph {

  /** ppb fixed-point scale: ranks are longs in [0, 1e9]. */
  val Scale = 1000000000L

  /** Damped PageRank over a SYMMETRIC edge list, in parts-per-billion
    * fixed point — every step is BIGINT arithmetic (long sums are
    * order-free; integer division is floor on the all-positive ranks
    * here), so the result is bit-identical across engines and an
    * unrolled SQL oracle can replay it exactly. Floating-point
    * PageRank cannot make that promise: cross-engine 1-ULP drift in
    * any iteration compounds through the next.
    *
    * Symmetric edges (an undirected graph, e.g. near-dup pairs in both
    * directions) guarantee outdeg >= 1 for every node that appears, so
    * the dangling-mass redistribution of general PageRank is not
    * needed.
    *
    * Scale shape: per iteration, one shuffle keying ranks by node for
    * the contribution join and one keyed by dst for the message sum —
    * the standard join-based power iteration (edges partition by src
    * and stay put; AQE handles hub skew via split shuffle reads). The
    * edge list and degree table are cached once and released before
    * return; the returned frame is eagerly materialized so the caches
    * cannot leak into the caller's lifetime. The one driver-side
    * action besides materialization is a node COUNT (a scalar, not a
    * collect).
    *
    * @param nodes  one `id` column, distinct; every node appears in
    *               the output (one with no in-edges ranks at the
    *               teleport term, never silently dropped)
    * @param edges  `src`, `dst` — must contain both directions
    * @param iters  power-iteration count (fixed, so the oracle can
    *               unroll it)
    */
  def pageRankPpb(nodes: DataFrame, edges: DataFrame,
                  iters: Int = 3): DataFrame = {
    require(iters >= 1, "pageRankPpb needs at least one iteration")
    val e = edges.cache()
    // distinct column names break the shared lineage with `edges`
    // (DetectAmbiguousSelfJoin rejects a deg-from-edges rejoin otherwise)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("deg_id"), col("outdeg")).cache()
    try {
      val n = nodes.count()
      // an empty graph (e.g. a corpus whose df-cap leaves no near-dup
      // pairs) has an empty rank table, not an error
      if (n == 0)
        nodes.select(col("id").as("doc_id"), lit(0L).as("rank_ppb"))
      else Materialize.eager(pageRankPlan(nodes, e, deg, iters, n))
    } finally {
      deg.unpersist(); e.unpersist()
    }
  }

  /** The lazy power-iteration plan (exposed for plan-shape specs; use
    * [[pageRankPpb]], which caches the edge side and materializes). */
  private[graft] def pageRankPlan(nodes: DataFrame, edges: DataFrame,
                                  deg: DataFrame, iters: Int,
                                  n: Long): DataFrame = {
    // teleport term (1-d)/N and the damped sum d*sum(contrib), both
    // as exact integer expressions mirrored verbatim by the oracle:
    // teleport = (15 * Scale) / (100 * N); damped = (85 * msum) / 100
    val teleport = 15L * Scale / (100L * n)
    var ranks = nodes.select(col("id"), lit(Scale / n).as("rank_fp"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(deg, col("id") === col("deg_id"))
        .select(col("id").as("c_src"),
          expr("rank_fp div outdeg").as("contrib"))
      ranks = edges.join(contrib, col("src") === col("c_src"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("msum"))
        .select(col("dst").as("id"),
          (lit(teleport) + expr("(85 * msum) div 100")).as("rank_fp"))
    }
    // every iteration rebuilds `ranks` from a groupBy over edge dsts,
    // so a node that is never a dst (isolated, or in `nodes` beyond
    // the edge endpoints) silently vanishes. Restore such nodes at the
    // teleport rank — exactly what the full iteration computes for a
    // node with no in-edges (its damped sum is empty every round), so
    // edge-endpoint-only inputs are byte-identical to before.
    nodes.select(col("id").as("n_id"))
      .join(ranks, col("n_id") === col("id"), "left")
      .select(col("n_id").as("doc_id"),
        coalesce(col("rank_fp"), lit(teleport)).as("rank_ppb"))
  }

  /** Triangle count (exact, each triangle once) plus the ORIENTED
    * wedge count — the number of candidate probes the algorithm
    * generated, i.e. its join work — over an UNDIRECTED distinct edge
    * list (canonical `a < b` pairs). The clustering-structure probe a
    * curation pipeline runs on its near-dup graph: a near-dup graph
    * whose candidate wedges rarely close is chains (transcription
    * drift), not clusters (true duplicates); and triangles/wedges is
    * the closure selectivity of the probe join itself. (Oriented
    * wedges are NOT the raw wedge census: a hub's raw wedges are
    * deliberately never generated — see the star-graph spec.)
    *
    * Degree-ordered orientation (Chiba–Nishizeki / the standard
    * MapReduce triangle scheme, cf. Suri & Vassilvitskii WWW'11):
    * every edge points from its (degree, id)-smaller endpoint to the
    * larger, so each triangle is counted exactly once, and — the 100 TB
    * property — the oriented out-degree is O(sqrt(m)) even at a hub
    * whose raw degree is millions. Wedge generation (the self-join on
    * `src`) therefore does sum(outdeg^2) <= m*sqrt(m) work instead of
    * the sum(deg^2) of a naive orientation, which is quadratic in the
    * hubbiest key. Every step is an equi-join or count: wedges shuffle
    * on (b, c) into the closing-edge join, AQE splits any residual
    * skew, and both outputs are single integers (metadata-sized).
    *
    * Integer-only, so the counts hash-verify cross-engine. Empty edge
    * list → (0, 0), not an empty frame.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val und = pairs.select(col("a"), col("b")).distinct().cache()
    try {
      val deg = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).cast("long").as("d"))
      // orient a->b iff (d_a, a) < (d_b, b); carry the dst's degree so
      // wedge endpoints can be ordered without another deg join
      val withDeg = und
        .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
      val lower = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = withDeg.select(
        when(lower, col("a")).otherwise(col("b")).as("src"),
        when(lower, col("b")).otherwise(col("a")).as("dst"),
        when(lower, col("db")).otherwise(col("da")).as("dd")).cache()
      try {
        val e1 = oriented.select(col("src"), col("dst").as("w_b"),
          col("dd").as("db1"))
        val e2 = oriented.select(col("src"), col("dst").as("w_c"),
          col("dd").as("dc2"))
        val wedges = e1.join(e2, Seq("src"))
          .filter(col("db1") < col("dc2") ||
            (col("db1") === col("dc2") && col("w_b") < col("w_c")))
          .select(col("w_b"), col("w_c"))
        // b precedes c in (deg, id) order, so the closing edge b-c is
        // oriented b->c by construction — one equi-join probes it, and
        // a single global agg (count(*) vs count(matched)) yields both
        // numbers in one pass with no driver-side action. Aggregation
        // over an empty wedge set still emits the (0, 0) row.
        val closed = wedges.join(oriented.select(col("src"), col("dst")),
          col("w_b") === col("src") && col("w_c") === col("dst"), "left")
        val out = closed.agg(count(lit(1)).as("wedges"),
          count(col("src")).as("triangles"))
        Materialize.relit(out)
      } finally oriented.unpersist()
    } finally und.unpersist()
  }

  /** Degree distribution of the similarity graph — the hub-pathology
    * check that precedes any pair-graph analytics: a power-of-two
    * degree histogram (bucket = floor(log2(deg))+1 via the
    * engine-portable `length(bin(deg))`, bucket 0 = isolated nodes)
    * with each bucket's doc count, total edge-endpoint mass, and the
    * exact-ppm doc share. A web-scale near-dup graph reliably grows
    * boilerplate hubs; their bucket tells whether the df-cap is doing
    * its job BEFORE pagerank/components pay the skew (the cluster-size
    * histogram sees the damage only after transitive closure).
    *
    * Scale shape: one endpoint union + node-keyed hash-agg (map-side
    * combine) over the pair table, a left join back to the node frame
    * to keep isolated nodes, a <=64-row bucket rollup, 1-row total
    * broadcast. Never an adjacency materialization.
    *
    * @param nodes one `doc_id` column, distinct
    * @param pairs `doc_a` < `doc_b`, one row per undirected edge
    */
  def degreeReport(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    val all = nodes.select(col("doc_id"))
      .join(deg, Seq("doc_id"), "left")
      .withColumn("deg", coalesce(col("deg"), lit(0L)))
    val buckets = all
      .groupBy(when(col("deg") === 0L, lit(0L))
        .otherwise(length(bin(col("deg"))).cast("long"))
        .as("degree_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("deg")).as("total_degree"))
    val total = buckets.agg(sum(col("n_docs")).as("_total"))
      .withColumn("_one", lit(1))
    buckets.withColumn("_one", lit(1)).join(broadcast(total), Seq("_one"))
      .select(col("degree_bucket"), col("n_docs"), col("total_degree"),
        expr("n_docs * 1000000 div _total").as("docs_share_ppm"))
  }
}
