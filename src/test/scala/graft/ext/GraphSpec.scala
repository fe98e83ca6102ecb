package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side integer replay of the pageRankPpb contract — an
    * independent implementation the distributed plan must match
    * exactly (same fixed-point arithmetic, Map-based). */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val teleport = 15L * Graph.Scale / (100L * n)
    var ranks = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val msum = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => ranks(e._1) / outdeg(e._1)).sum
      }
      ranks = msum.map { case (id, s) => id -> (teleport + 85L * s / 100L) }
    }
    ranks
  }

  // path graph 1-2-3 plus an isolated pair 4-5, symmetric edges
  private val edgeList = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
    4L -> 5L, 5L -> 4L)

  test("pageRankPpb matches the driver-side integer replay exactly") {
    val edges = edgeList.toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
    val got = Graph.pageRankPpb(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === replay(edgeList, 3))
  }

  test("pageRankPpb centers mass on the path hub and splits the pair evenly") {
    val edges = edgeList.toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
    val r = Graph.pageRankPpb(nodes, edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(1L) && r(2L) > r(3L), s"hub not highest: $r")
    assert(r(1L) === r(3L), s"symmetric leaves diverged: $r")
    assert(r(4L) === r(5L), s"isolated pair diverged: $r")
    // total mass stays ~Scale: each iteration loses only integer
    // floor remainders (< n per division site)
    val total = r.values.sum
    assert(total > Graph.Scale * 95 / 100 && total <= Graph.Scale,
      s"mass off: $total")
  }

  test("isolated nodes survive at the teleport rank, never dropped") {
    // node 6 is in `nodes` but touches no edge: each iteration's
    // groupBy-over-dsts rebuild would silently lose it; the contract
    // is every node returned, no-in-edge nodes at the teleport term
    // (their damped sum is empty every round)
    val edges = edgeList.toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
      .union(Seq(6L).toDF("id"))
    val r = Graph.pageRankPpb(nodes, edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    val teleport = 15L * Graph.Scale / (100L * 6L)
    assert(r(6L) === teleport, s"isolated node not at teleport: $r")
    // connected nodes all rank above the floor
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(r(_) > teleport), s"$r")
  }

  test("an empty graph yields an empty rank table, not an error") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
    val out = Graph.pageRankPpb(nodes, edges, iters = 3)
    assert(out.columns.toSeq === Seq("doc_id", "rank_ppb"))
    assert(out.count() === 0)
  }

  test("triangleStats counts the square-with-diagonal exactly") {
    // square 1-2-3-4-1 plus diagonal 1-3: two triangles (1,2,3) and
    // (1,3,4); degree order is 2 < 4 < 1 < 3 ((deg, id) asc), so both
    // wedges form at the degree-2 corners and close through 1->3
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val r = Graph.triangleStats(pairs).as[(Long, Long)].collect().toSeq
    assert(r === Seq((2L, 2L)), s"wedges/triangles: $r")
  }

  test("triangleStats: triangle-free star and empty input") {
    // star: every leaf orients INTO the hub (leaves are (deg,id)-
    // smaller), so no source has two out-edges — zero candidate
    // wedges even though the star has 3 raw wedges. Exactly the
    // orientation's point: a hub generates no quadratic probe work.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val rs = Graph.triangleStats(star).as[(Long, Long)].collect().head
    assert(rs === ((0L, 0L)), s"star wedges/triangles: $rs")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val re = Graph.triangleStats(empty).as[(Long, Long)].collect().head
    assert(re === ((0L, 0L)), s"empty graph must report (0,0): $re")
  }

  test("degreeReport buckets degrees by power of two and keeps isolated nodes") {
    // triangle 1-2-3 (degree 2 each -> bucket 2), edge 4-5 (degree 1
    // -> bucket 1), node 6 isolated (bucket 0)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val out = Graph.degreeReport(nodes, pairs)
      .orderBy("degree_bucket")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 0L, 166666L), (1L, 2L, 2L, 333333L),
      (2L, 3L, 6L, 500000L)), s"got $out")
  }

  test("degreeReport mass reconciles: endpoints = 2x pairs, docs partition") {
    val nodes = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("doc_a", "doc_b")
    val out = Graph.degreeReport(nodes, pairs)
      .agg(sum("n_docs"), sum("total_degree")).as[(Long, Long)].head()
    assert(out == ((4L, 6L)),
      s"docs must partition and degree mass must be 2x edge count: $out")
  }

  test("the power-iteration plan shuffles on graph keys, no cartesian or window") {
    val edges = edgeList.toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("deg_id"), col("outdeg"))
    val plan = Graph.pageRankPlan(nodes, edges, deg, iters = 3, n = 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in pagerank:\n$plan")
    assert(!plan.contains("Window "), s"window in pagerank:\n$plan")
    // per-iteration aggregates must map-side combine (long sums)
    assert(plan.contains("partial_sum"), s"message sum not partial:\n$plan")
  }
}
