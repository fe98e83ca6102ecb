package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup semantic pruning and the component-keyed leakage-safe
  * split (r16 session-2 additions). */
class SemDedupSplitSpec extends SparkSpec {
  import spark.implicits._

  private def awaitGuard(name: String, deadlineMs: Long = 10000): Option[Long] = {
    val full = GuardLog.Prefix + name
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    var got = GuardLog.lastFired.get(full)
    while (got.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      got = GuardLog.lastFired.get(full)
    }
    got
  }

  /** Two well-separated directions with an exact duplicate in each of
    * two of the four cell-X members; ids chosen so the deterministic
    * init (lowest two ids) seeds one centroid per true cluster. */
  private lazy val fixture = Seq(
    (1L, Array(1.0f, 0f, 0f, 0f)),
    (2L, Array(0f, 1.0f, 0f, 0f)),
    (3L, Array(1.0f, 0f, 0f, 0f)),    // copy of 1
    (4L, Array(0.8f, 0.6f, 0f, 0f)),
    (5L, Array(0f, 0.8f, 0.6f, 0f)),
    (6L, Array(0.8f, 0.6f, 0f, 0f)))  // copy of 4
    .toDF("vec_id", "embedding")

  test("semDedup removes exactly the later copy of each duplicate, keeps rank 1") {
    val cents = Similarity.ivfCentroids(fixture, "vec_id", "embedding",
      nCentroids = 2, iters = 2)
    val out = Similarity.semDedup(fixture, cents, "vec_id", "embedding",
        eps = 0.95)
      .select("vec_id", "cell_rank", "removed_by", "is_removed")
      .as[(Long, Long, Option[Long], Long)].collect()
    assert(out.length == 6)
    val removed = out.filter(_._4 == 1L).map(r => r._1 -> r._3.get).toMap
    // cos(1,3) = cos(4,6) = 1 >= 0.95; cos(1,4) = 0.8 < 0.95 — only
    // the exact copies fall, each attributed to its original
    assert(removed == Map(3L -> 1L, 6L -> 4L), s"got $removed")
    // the most central member of every cell survives by construction
    out.filter(_._2 == 1L).foreach { r =>
      assert(r._4 == 0L, s"cell_rank 1 row ${r._1} was removed")
    }
    // removed_by and is_removed agree row by row
    out.foreach { r => assert((r._3.isDefined) == (r._4 == 1L)) }
  }

  test("semDedup mega-cell split: unsplittable duplicates hit the recursion floor loudly") {
    val cents = Similarity.ivfCentroids(fixture, "vec_id", "embedding",
      nCentroids = 2, iters = 2)
    val out = Similarity.semDedup(fixture, cents, "vec_id", "embedding",
        eps = 0.95, maxCell = 1L, guardName = "semdedup_spec_cap",
        floorGuardName = "semdedup_spec_floor")
      .agg(sum(col("is_removed"))).as[Long].collect()(0)
    // every cell exceeds the cap (r17: SPLIT, not skip). The
    // duplicate pairs {1,3} and {4,6} are exactly identical, so the
    // sub-fit cannot separate them (argmax ties -> lowest sub_id):
    // their sub-cells stay over the cap-of-1 and hit the recursion
    // floor — kept undeduped, loudly. The singleton sub-cells pair
    // nothing. Net: nothing removed, both guards fired with exact
    // row counts.
    assert(out == 0L)
    // all 6 rows entered the split path (4 + 2 member cells > cap 1)
    assert(awaitGuard("semdedup_spec_cap").contains(6L))
    // the two identical pairs (4 rows) are unsplittable -> floor
    assert(awaitGuard("semdedup_spec_floor").contains(4L))
  }

  test("semDedup splits a 10k-member mega cell and dedups inside sub-cells") {
    // 10,000 vectors, 40 exact-duplicate clusters of 250 (cluster
    // j = id % 40, direction = basis vector e_j in 48 dims), ALL
    // pinned to one parent cell — the boilerplate-heavy corpus the
    // r16 keep-undeduped fallback abandoned. The split must fit 128
    // sub-centroids (autoCentroids(10000)) over the sliver, land
    // each cluster in its own sub-cell, and remove everything but
    // each cluster's most-central (lowest-id) member.
    val dim = 48
    val n = 10000
    val cells = spark.range(n).select(col("id").as("vec_id"),
        lit(0L).as("centroid_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => when(d === (col("id") % 40).cast("int"), lit(1.0))
            .otherwise(lit(0.0))).as("v"))
    val cents = Seq((0L, Array.tabulate(dim)(d => if (d == 0) 1.0 else 0.0)
        .toSeq))
      .toDF("centroid_id", "cv")
    val out = Similarity.semDedupFrom(cells, cents, eps = 0.9,
      guardName = "semdedup_split_mega10k",
      floorGuardName = "semdedup_split_floor10k")
    val (total, removed) = out.agg(count(lit(1)), sum(col("is_removed")))
      .as[(Long, Long)].collect()(0)
    assert(total == n.toLong)
    // every cluster keeps exactly one representative
    assert(removed == (n - 40).toLong,
      s"expected ${n - 40} removals, got $removed")
    // each kept row is its cluster's lowest id (ids 0..39), and each
    // removed row is attributed within its own cluster
    val kept = out.filter(col("is_removed") === 0L)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == (0L until 40L),
      s"kept ${kept.take(50).toSeq}")
    val badAttr = out.filter(col("is_removed") === 1L)
      .filter(col("removed_by") =!= col("vec_id") % 40).count()
    assert(badAttr == 0L, s"$badAttr rows removed by a non-cluster rep")
    // whole cell went through the split; nothing hit the floor
    assert(awaitGuard("semdedup_split_mega10k").contains(n.toLong))
    assert(awaitGuard("semdedup_split_floor10k", 2000).isEmpty,
      "no sub-cell should exceed the cap after the split")
  }

  test("semDedup equals an exact driver-side replay on random vectors") {
    // deterministic pseudo-random fixture: 80 vectors, 8 dims, 8 cells
    val rnd = new scala.util.Random(42)
    val rows = (0L until 80L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val eps = 0.5
    val got = Similarity.semDedup(df, cents, "vec_id", "embedding", eps)
      .select("vec_id", "centroid_id", "cell_rank", "removed_by",
        "is_removed")
      .as[(Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // replay with the engine's exact arithmetic: strict in-order
    // double folds for dot and norm, argmax tie -> lowest centroid,
    // rank tie -> lowest id
    def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val cvs = cents.select("centroid_id", "cv")
      .as[(Long, Seq[Double])].collect()
      .map { case (id, cv) => (id, cv.toIndexedSeq) }
    val normed = rows.map { case (id, v) =>
      val d = v.map(_.toDouble).toIndexedSeq
      val nm = math.sqrt(dot(d, d))
      id -> d.map(_ / nm)
    }
    val assigned = normed.map { case (id, v) =>
      val best = cvs.map { case (cid, cv) => (cid, dot(v, cv)) }
        .reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
      (id, best._1, v, best._2)
    }
    val want = assigned.groupBy(_._2).flatMap { case (cid, members) =>
      val ranked = members.sortBy { case (id, _, _, cos) => (-cos, id) }
        .zipWithIndex.map { case ((id, _, v, _), r) => (id, v, r + 1L) }
      ranked.map { case (id, v, rank) =>
        val earlier = ranked.filter(_._3 < rank)
          .filter { case (_, w, _) => dot(v, w) >= eps }.map(_._1)
        val rb = if (earlier.isEmpty) None else Some(earlier.min)
        id -> ((cid, rank, rb, if (rb.isDefined) 1L else 0L))
      }
    }
    assert(got == want,
      s"divergence: ${got.toSet.diff(want.toSet)} vs ${want.toSet.diff(got.toSet)}")
    // the replay must be non-trivial: some removals at this eps
    assert(want.values.exists(_._4 == 1L), "fixture produced no removals")
  }

  test("corpus_curation_v4: funnel is monotone, anchored, and the semantic stage bites") {
    val rows = graft.registry.ExtQueriesCorpus
      .queries("corpus_curation_v4")(spark, sf0001)
      .select("stage_idx", "stage", "n_docs", "n_tokens")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("raw", "gopher_filter", "exact_dedup", "semdedup_prune",
        "temp_mixture"))
    val raw = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.head._3 === raw)
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3,
        s"stage ${cur._2} grew docs: ${prev._3} -> ${cur._3}")
      assert(cur._4 <= prev._4,
        s"stage ${cur._2} grew tokens: ${prev._4} -> ${cur._4}")
    }
    // the semantic stage must actually remove something on the
    // fixture (embedding near-dups exist at eps 0.3), and the funnel
    // must not degenerate to empty
    val byName = rows.map(r => r._2 -> r._3).toMap
    assert(byName("semdedup_prune") < byName("exact_dedup"),
      "semantic pruning removed nothing")
    assert(rows.last._3 > 0L, "funnel degenerated to an empty corpus")
  }

  test("sample_component_split: zero straddle by construction, naive straddles counted") {
    val rows = graft.registry.ExtQueriesSampling
      .queries("sample_component_split")(spark, sf0001)
      .select("source", "split", "n_docs", "n_cross_pairs",
        "n_cross_pairs_naive")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the component key makes straddling impossible — and the query
    // COMPUTES that from the pair table rather than asserting it
    assert(rows.forall(_._4 == 0L))
    // the audit columns are global constants across cells
    assert(rows.map(r => (r._4, r._5)).distinct.length == 1)
    assert(rows.forall(r => Set("train", "val", "test").contains(r._2)))
    val total = rows.map(_._3).sum
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(total == corpus, s"split cells cover $total of $corpus docs")
  }
}
