package graft.ext

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Merge

/** Round-4 scale guards: the boundary/plan behavior of the helpers that
  * exist purely for 100x scale — auto-sizing formulas, the df-cap
  * hot-set path, materialization hygiene, and pointer-jumping
  * convergence. These are the specs for properties the oracle rows
  * can't see (the oracle checks end-to-end values at one corpus size;
  * these check the mechanisms that keep those values computable at any
  * corpus size).
  */
class ScaleGuardsSpec extends SparkSpec {
  import spark.implicits._

  // ---- auto-sizing formulas, pinned against the SQL twins ----
  // Each helper has a DuckDB twin that derives the same count from
  // count(*) with BIGINT arithmetic: nc = GREATEST(min, LEAST(max,
  // 1::BIGINT << f(length(bin(m-1))))). The reference implementations
  // below replay that BIGINT algebra via BigInt, so a divergence in
  // ANY regime (including the >2^31 shift range, where an Int shift
  // would wrap mod 32) fails here instead of in a 100 TB run.

  private def bitLen(m: Long): Int =
    if (m <= 0) 0 else BigInt(m).bitLength // == length(bin(m)) for m>0

  private def sqlTwinGroups(n: Long, target: Long, minG: Int, maxG: Int): Long = {
    val m = (n + target - 1) / target
    val pow = if (m <= 1) BigInt(1) else BigInt(1) << bitLen(m - 1)
    pow.max(minG).min(maxG).toLong
  }

  private def sqlTwinCentroids(n: Long, minC: Int, maxC: Int): Long = {
    val pow =
      if (n <= 1) BigInt(1) else BigInt(1) << ((bitLen(n - 1) + 1) / 2)
    pow.max(minC).min(maxC).toLong
  }

  test("autoGroups matches the BIGINT SQL-twin formula at every regime") {
    val interesting = Seq(0L, 1L, 2L, 63L, 64L, 65L, 4095L, 4096L, 4097L,
      (1L << 20) * 64L, // exactly maxG groups
      (1L << 20) * 64L + 1,
      (1L << 31) * 64L, // Int-shift wrap region: 1 << 31 is negative
      (1L << 40) * 64L, // Int-shift wrap region: 1 << 40 wraps to 256
      Long.MaxValue / 128)
    for (n <- interesting) {
      val got = Packing.autoGroups(n)
      val want = sqlTwinGroups(n, 64L, 8, 1 << 20)
      assert(got.toLong == want, s"autoGroups($n): got $got want $want")
    }
    // clamps and power-of-two shape
    assert(Packing.autoGroups(0) == 8)
    assert(Packing.autoGroups(1) == 8)
    assert(Packing.autoGroups(Long.MaxValue / 128) == (1 << 20))
    for (n <- Seq(100000L, 999999L, 12345678L)) {
      val g = Packing.autoGroups(n)
      assert((g & (g - 1)) == 0, s"autoGroups($n)=$g not a power of two")
    }
  }

  test("autoCentroids matches the BIGINT SQL-twin formula at every regime") {
    val interesting = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 499L, 500L,
      1L << 24, (1L << 24) + 1,
      1L << 33, // Int-shift region for the halved exponent
      1L << 62, Long.MaxValue)
    for (n <- interesting) {
      val got = Similarity.autoCentroids(n)
      val want = sqlTwinCentroids(n, 4, 4096)
      assert(got.toLong == want, s"autoCentroids($n): got $got want $want")
    }
    assert(Similarity.autoCentroids(0) == 4) // clamp floor
    assert(Similarity.autoCentroids(1L << 24) == 4096) // clamp ceiling
    // ~sqrt shape between the clamps: c in [sqrt(n), 2*sqrt(n))
    for (n <- Seq(500L, 10000L, 1000000L)) {
      val c = Similarity.autoCentroids(n)
      val s = math.sqrt(n.toDouble)
      assert(c >= s && c < 2 * s + 1, s"autoCentroids($n)=$c not ~sqrt")
    }
  }

  test("autoPlanes boundary behavior (n=0,1, clamps, powers of two)") {
    assert(Similarity.autoPlanes(0) == 4)
    assert(Similarity.autoPlanes(1) == 4)
    assert(Similarity.autoPlanes(64L * 16) == 4) // 16 buckets -> minPlanes
    assert(Similarity.autoPlanes(64L * (1 << 16)) == 16)
    assert(Similarity.autoPlanes(Long.MaxValue / 2) == 16) // clamp ceiling
    // exact power-of-two bucket count: ceil-log2 is exact
    assert(Similarity.autoPlanes(64L * 256) == 8)
    assert(Similarity.autoPlanes(64L * 256 + 1) == 9)
  }

  // ---- hot-key (df-cap) path ----

  private def mkDocs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("docTokensCapped materializes the hot set: no Aggregate re-runs in the consumer plan") {
    val docs = mkDocs(1L -> "x y common", 2L -> "x y common",
      3L -> "common z w")
    val capped = Dedup.docTokensCapped(docs, col("doc_id"), col("text"),
      maxDf = 2L)
    // the hot side must be a materialized leaf (LogicalRDD), NOT the
    // groupBy/filter subtree — otherwise the anti-join recomputes the
    // full-corpus aggregate that hotKeys already ran for its count()
    val aggs = capped.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a
    }
    assert(aggs.isEmpty,
      s"hot-set aggregate re-appears in the consumer plan:\n${capped.queryExecution.optimizedPlan}")
    // and the values are right: common (df=3) dropped, x/y/z/w kept
    val kept = capped.select("token").as[String].collect().toSet
    assert(kept == Set("x", "y", "z", "w"))
  }

  test("jaccardPairs with a LARGE hot set (maxDf=1) — hand-computed corpus") {
    val docs = mkDocs(1L -> "x y common", 2L -> "x y common",
      3L -> "common z w")
    // maxDf=2: only 'common' (df=3) is hot. docs 1-2 share {x,y},
    // sizes are the UNCAPPED 3 -> jaccard = 2/(3+3-2) = 0.5; doc 3
    // shares only the capped token -> no pair at all.
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, maxDf = 2L)
      .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 2L, 3L, 3L, 0.5)))
    // maxDf=1: EVERY shared token is hot (the web-scale regime the
    // distributed anti-join exists for) -> the pair set is empty, and
    // the job completes instead of OOMing on a driver-side hot list
    val none = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.0, maxDf = 1L)
    assert(none.isEmpty)
  }

  test("crossCorpusOverlap drops hot train shingles before the join (maxDf=1)") {
    val train = mkDocs(1L -> "p q r", 2L -> "p q s")
    val test = mkDocs(10L -> "q r t")
    // 2-shingles: train1 {p q, q r}, train2 {p q, q s}; 'p q' has
    // train-df 2 > 1 -> dropped. test {q r, r t} shares 'q r' with
    // train1 only.
    val got = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
        shingleN = 2, maxDf = 1L)
      .select("train_id", "test_id", "n_shared_shingles")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L)))
  }

  // ---- materialization hygiene ----

  test("LSH pair generators leave no cache-manager entries behind") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
    spark.catalog.clearCache()
    Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    Dedup.simhashPairs(docs, "doc_id", "text").count()
    // Materialize.eager never touches the CacheManager: its blocks (or
    // checkpoint files) are freed by the ContextCleaner when the frame
    // is GC'd, so a long-lived session cannot accumulate pinned
    // corpus-sized entries from repeated near-dup calls
    assert(spark.sharedState.cacheManager.isEmpty,
      "minhashLshPairs/simhashPairs leaked cached plans")
  }

  // ---- pointer-jumping convergence ----

  test("connectedComponents converges in ~log2 rounds on a 1000-node path graph") {
    // a path graph is the adversarial case for plain label propagation
    // (diameter 999 -> 999 rounds); pointer jumping must finish in
    // <= ceil(log2(999)) + slack rounds. maxIter=12 FAILS the test if
    // convergence is linear.
    val nodes = spark.range(1, 1001).select(col("id").as("doc_id"))
    val pairs = spark.range(1, 1000).select(col("id").as("doc_a"),
      (col("id") + 1).as("doc_b"))
    val labels = Dedup.connectedComponents(nodes, pairs, maxIter = 12)
    val comps = labels.select("component").distinct()
      .as[Long].collect().toSeq
    assert(comps == Seq(1L), s"path graph must collapse to component 1, got $comps")
    assert(labels.count() == 1000)
  }

  // ---- bounded-collect contract in the mixing/balancing samplers ----
  // These collect per-class constants to the driver — correct for
  // domain labels, an OOM for accidental high-cardinality columns.
  // The contract is enforced (probe limit(cap+1), loud refusal), not
  // assumed: a doc_id-as-class mistake dies with a pointer to the
  // distributed alternative, never with a heap dump.

  test("balanceClasses / temperatureSample refuse high-cardinality class columns") {
    val wide = (0 until 50).map(i => (i.toLong, s"doc_$i")).toDF("id", "doc_id")
    val e1 = intercept[IllegalArgumentException] {
      Corpus.balanceClasses(wide, col("doc_id"), col("id"), maxClasses = 10)
        .count()
    }
    assert(e1.getMessage.contains("domain-label sampler"))
    val e2 = intercept[IllegalArgumentException] {
      Corpus.temperatureSample(wide, col("doc_id"), col("id"), maxClasses = 10)
        .count()
    }
    assert(e2.getMessage.contains("domain-label sampler"))
    // the bounded probe must not reject a legitimate domain label
    val ok = Corpus.balanceClasses(wide.withColumn("dom", col("id") % 3),
      col("dom"), col("id"), maxClasses = 10)
    assert(ok.count() > 0)
  }

  // ---- relit bound ----
  // Materialize.relit (the loop-carried-state lineage truncation used
  // by the k-means/codebook loops) collects to the driver; its
  // metadata-scale contract is enforced via a limit-probed collect,
  // so a corpus-sized frame refuses loudly instead of heap-dumping.

  test("Materialize.relit enforces its metadata-scale bound") {
    val small = (0 until 10).map(i => (i.toLong, s"c$i")).toDF("id", "v")
    val again = Materialize.relit(small)
    assert(again.collect().toSet == small.collect().toSet)
    assert(again.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a }.isEmpty)
    val e = intercept[IllegalArgumentException] {
      Materialize.relit(spark.range(100).toDF("id"), maxRows = 50)
    }
    assert(e.getMessage.contains("Materialize.eager"))
  }

  // ---- MERGE broadcast gate ----
  // mergeUpsert promises a huge update set degrades to a shuffled
  // anti-join. The gate is a bounded row probe: above the threshold no
  // broadcast hint may appear (an unconditional hint would force a
  // 10^9-row key set onto every executor), below it the copy-on-write
  // broadcast plan must survive.

  test("mergeUpsert drops the broadcast hint above the key-row threshold") {
    val base = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val upd = (0 until 50).map(i => (i.toLong, s"U$i")).toDF("k", "v")
    val big = Merge.mergeUpsert(base, upd, Seq("k"),
      checkDuplicates = false, broadcastKeyRowLimit = 10)
    val hinted = big.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.isEmpty,
      s"update set above threshold still carries a broadcast hint")
    // result is unaffected by which join the planner picks
    assert(big.count() == 100)
    val small = Merge.mergeUpsert(base, upd, Seq("k"),
      checkDuplicates = false, broadcastKeyRowLimit = 1000)
    val smallHints = small.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(smallHints.nonEmpty, "small update set lost its broadcast hint")
  }

}
