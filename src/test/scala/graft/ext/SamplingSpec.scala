package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("deterministic sample is invariant under repartitioning and re-reads") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(13), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample membership must not depend on partitioning")
    assert(a.nonEmpty && a.size < docs.count())
    // df.sample (RNG-based) does NOT have this property with a changed
    // partitioning — that contrast is the reason this operator exists
    val frac = a.size.toDouble / docs.count()
    assert(math.abs(frac - 0.2) < 0.1, s"fraction far off: $frac")
  }

  test("larger fractions strictly contain smaller ones (nested samples)") {
    val small = Sampling.deterministicSample(docs, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.deterministicSample(docs, col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big),
      "bucket thresholding must nest: sample(0.1) within sample(0.3)")
  }

  test("train/val/test split is exhaustive, disjoint and stable") {
    val split = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), valPct = 0.1, testPct = 0.1)
        .as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
    // stability: same assignment on a re-read
    val again = docs.repartition(7).select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), 0.1, 0.1).as("split"))
      .as[(Long, String)].collect().toMap
    val first = split.as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("independent salts draw independent samples") {
    val s1 = Sampling.deterministicSample(docs, col("doc_id"), 0.5, salt = "a")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, col("doc_id"), 0.5, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s2)
    // overlap should be near 25% of the corpus, not 0% or 50%
    val overlap = (s1 & s2).size.toDouble / docs.count()
    assert(overlap > 0.1 && overlap < 0.4, s"suspicious overlap: $overlap")
  }

  test("stratified sample respects per-stratum rates") {
    val ev = graft.Tables.events(spark, sf0001)
    val rates = Map("view" -> 0.1, "purchase" -> 1.0)
    val out = Sampling.stratifiedSample(ev, col("event_type"),
      col("event_id"), rates, default = 0.0)
    val got = out.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val base = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    // all purchases kept, views near 10%, everything else dropped
    assert(got("purchase") == base("purchase"))
    val viewFrac = got("view").toDouble / base("view")
    assert(math.abs(viewFrac - 0.1) < 0.07, s"view rate off: $viewFrac")
    assert(got.keySet == Set("view", "purchase"))
  }

  test("k-center coreset matches an independent driver-side greedy replay") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = Sampling.kCenterCoreset(emb, "vec_id", "embedding", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sortBy(_._1)
    // independent replay: same quantization contract, plain Scala
    val pts = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    def dPpm(a: Seq[Float], b: Seq[Float]): Long = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      math.floor(acc * 1000000).toLong
    }
    var chosen = Vector((0L, pts.head._1, -1L))
    var mind = pts.map(p => p._1 -> dPpm(p._2, pts.head._2)).toMap
    val byId = pts.toMap
    for (j <- 1 until 6) {
      val (selId, selD) = mind.toSeq.maxBy { case (id, d) => (d, -id) }
      chosen :+= ((j.toLong, selId, selD))
      mind = mind.map { case (id, d) =>
        id -> math.min(d, dPpm(byId(id), byId(selId)))
      }
    }
    assert(got === chosen, s"trace diverged:\n got=$got\nwant=$chosen")
    // the selection spreads: all ids distinct
    assert(got.map(_._2).distinct.size === 6)
  }

  test("k-center round state is materialized: final plan holds no distance chain") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (trace, state) =
      Sampling.kCenterCoresetWithState(emb, "vec_id", "embedding", k = 5)
    assert(trace.count() === 5)
    // Each round eagerly materializes (lineage-truncating localCheckpoint),
    // so the final state's plan is a materialized scan — NOT a k-deep
    // least(zip_with...) chain whose round-j argmax re-evaluates all j-1
    // prior distance maps (the O(n·k²) growth flagged in r8). Without the
    // per-round Materialize.eager this plan contains k zip_with nodes.
    val plan = state.queryExecution.analyzed.toString
    assert(!plan.contains("zip_with"),
      s"distance chain leaked into final state plan:\n$plan")
    assert(state.columns.toSeq === Seq("vec_id", "v", "mind"))
  }

  test("priority sample is weight-biased, exact-size and replayable") {
    val docs2 = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("w"))
    val a = Sampling.prioritySample(docs2, col("doc_id"), col("w"), k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a.size === 50)
    // replayable: identical draw under repartitioning
    val b = Sampling.prioritySample(docs2.repartition(13), col("doc_id"),
        col("w"), k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // driver-side replay of the integer priority order
    val rows = docs2.as[(Long, Long)].collect()
    val want = rows.map { case (id, w) =>
      val u = TextOps.hex60Local(id.toString) % Sampling.Buckets
      ((u * Sampling.Buckets) / math.max(w, 1L), id)
    }.sorted.take(50).map(_._2).toSet
    assert(a === want)
    // weight bias: sampled docs skew longer than the corpus average
    val avgAll = rows.map(_._2).sum.toDouble / rows.length
    val avgSampled = rows.filter(r => a(r._1)).map(_._2).sum.toDouble / 50
    assert(avgSampled > avgAll,
      s"weighting had no effect: sampled $avgSampled vs corpus $avgAll")
  }

  test("priority sample saturates weights at/above the resolution bound") {
    // weights pushed past Buckets must clamp to Buckets-1 (max-weight
    // behavior) instead of aborting the job on one data-dependent row:
    // the draw over the shifted weights equals the draw over weights
    // pre-clamped at the bound.
    val docs2 = docs.select(col("doc_id"),
      (TextOps.tokenCount(col("text")) + Sampling.Buckets).as("w"))
    val got = Sampling.prioritySample(docs2, col("doc_id"), col("w"), k = 5)
      .select("doc_id").as[Long].collect().toSet
    val clamped = docs2.select(col("doc_id"),
      least(col("w"), lit(Sampling.Buckets - 1L)).as("w"))
    val want = Sampling.prioritySample(clamped, col("doc_id"), col("w"), k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
    assert(got.size === 5)
  }

  test("k-center stops early instead of emitting duplicate centers") {
    // 3 distinct points, one duplicated; ask for k=5
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)), (4L, Array(1f, 0f))) // 4 duplicates 1
      .toDF("vec_id", "embedding")
    val got = Sampling.kCenterCoreset(emb, "vec_id", "embedding", k = 5)
      .collect()
    // seed=1; ids 2,3 are pickable; 4 coincides with 1 (mind=0) so the
    // traversal must stop at 3 rows rather than re-selecting chosen ids
    assert(got.length === 3, got.mkString(","))
    assert(got.map(_.getLong(1)).toSet === Set(1L, 2L, 3L))
  }
}
