package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet").cache()
  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("exact dedup groups duplicated content and keeps the min id") {
    val copies = docs.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    val groups = Dedup.exactGroups(docs.unionByName(copies),
      col("doc_id"), col("text"))
    val dupGroups = groups.filter(col("n_copies") >= 2)
    assert(dupGroups.count() == docs.filter(col("doc_id") % 50 === 0).count())
    // representative is always the original (min) id
    assert(dupGroups.filter(col("doc_id_kept") >= 1000000).count() == 0)
  }

  test("minhash estimates track exact jaccard (shingle-level)") {
    val subset = docs.filter(col("doc_id") < 120)
    // exact jaccard on 3-shingle sets via the same tokenization
    val sh = subset.select(col("doc_id"),
      explode(array_distinct(TextOps.wordShingles(col("text"), 3)))
        .as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard", $"ni" * 1.0 / ($"na" + $"nb" - $"ni"))
    val est = Dedup.minhashSignatures(subset, col("doc_id"), col("text"),
      shingleN = 3, k = 64)
    val estA = est.select(col("doc_id").as("doc_a") +:
      (0 until 64).map(i => col(s"mh_$i").as(s"a_$i")): _*)
    val estB = est.select(col("doc_id").as("doc_b") +:
      (0 until 64).map(i => col(s"mh_$i").as(s"b_$i")): _*)
    val matches = (0 until 64)
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduce(_ + _)
    val joined = exact.join(estA, "doc_a").join(estB, "doc_b")
      .withColumn("est", matches / 64.0)
      .select($"jaccard", $"est").as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    val mae = joined.map { case (j, e) => math.abs(j - e) }.sum / joined.size
    assert(mae < 0.15, s"minhash mean abs error too high: $mae")
  }

  test("simhash of identical docs is identical; near-identical is close") {
    val pair = Seq(
      (1L, "spark query filter join group sort merge"),
      (2L, "spark query filter join group sort merge"),
      (3L, "completely 9 different 8 words 7 entirely 6 unrelated"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashPairs(pair, "doc_id", "text", maxHamming = 0)
    val rows = out.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((1L, 2L)))
  }

  test("LSH bucket pairs are a subset of brute-force pairs at the same threshold") {
    val brute = Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearNeighbors(emb, "vec_id", "embedding",
      dim = 64, planes = 8, threshold = 0.2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }

  test("brute-force top-k is sorted by cosine and ivf results are true neighbors") {
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 5)
    val byQuery = bf.select("query_id", "rank", "cosine")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      nCentroids = 8, k = 5)
    // every ivf hit's cosine is <= the brute-force best for that query
    val best = bf.filter(col("rank") === 1)
      .select("query_id", "cosine").as[(Long, Double)].collect().toMap
    val hits = ivf.select("query_id", "cosine").as[(Long, Double)].collect()
    assert(hits.nonEmpty)
    hits.foreach { case (q, c) => assert(c <= best(q) + 1e-12) }
    // recall@5 against brute force must not decrease with more probes
    def recall(n: Int): Double = {
      val truth = bf.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val got = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        nCentroids = 8, k = 5, nProbe = n)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val r1 = recall(1); val r4 = recall(4)
    assert(r4 >= r1)
    assert(r4 > 0.5, s"recall@5 with nProbe=4 too low: $r4")
  }

  test("connected components label every node with its component minimum") {
    val nodes = (1L to 8L).toDF("doc_id")
    // components: {1,2,3} via chain, {4,5} pair, {6,7,8} star on 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (6L, 8L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 6L, 8L -> 6L))
  }

  test("token df-cap guards the inverted index against hot tokens") {
    val toks = Dedup.docTokens(docs, col("doc_id"), col("text"), maxDf = 50)
    val maxDf = toks.groupBy("token").count().agg(max("count")).as[Long].head()
    assert(maxDf <= 50)
  }
}
