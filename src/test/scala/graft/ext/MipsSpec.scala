package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** MIPS top-k: heap-agg formulation vs a window replay, the
  * norm-augmentation reduction's order equivalence, and the fixture
  * that shows cosine and MIPS are genuinely different orders (the
  * operator's reason to exist). */
class MipsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("mipsTopK equals the window formulation on the corpus") {
    val got = Similarity.mipsTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    val want = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", Similarity.dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("norm-augmented cosine reproduces the MIPS order exactly") {
    // M^2 = max corpus self-dot: augmented corpus vectors all have
    // norm M, so cos(q', x') = dot(q, x) / (|q| * M) — a positive
    // per-query scaling that cannot reorder neighbors
    val maxSq = emb.agg(max(Similarity.dot(col("embedding"),
      col("embedding")))).as[Double].head()
    val corpusAug = Similarity.normAugment(emb, "embedding",
      lit(maxSq), isQuery = false, out = "aug")
    val queryAug = Similarity.normAugment(emb.filter(col("vec_id") < 10),
      "embedding", lit(maxSq), isQuery = true, out = "aug")
    val viaCosine = Similarity.bruteForceTopK(
        queryAug.select(col("vec_id"), col("aug").as("embedding")),
        corpusAug.select(col("vec_id"), col("aug").as("embedding")),
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val viaDot = Similarity.mipsTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaCosine === viaDot,
      "augmented-cosine order must equal the dot order")
  }

  test("MIPS-IVF with every cell probed reproduces the exact MIPS top-k") {
    // nProbe = nCentroids makes the IVF search exhaustive, so the
    // ONLY thing between it and mipsTopK is the augmented index
    // machinery (staged 65-dim fit, cell assignment, heap ranking) —
    // which must then be rank-for-rank identical to the flat dot scan
    val maxSq = emb.agg(max(Similarity.dot(col("embedding"),
      col("embedding")))).as[Double].head()
    val nC = Similarity.autoCentroids(emb.count())
    val cents = PairStage.mipsIvfCentroids(spark, sf0001, nC, iters = 2)
    val got = Similarity.ivfTopKWith(cents,
        Similarity.normAugment(emb, "embedding", lit(maxSq),
          isQuery = false, out = "av"),
        Similarity.normAugment(emb.filter(col("vec_id") < 10),
          "embedding", lit(maxSq), isQuery = true, out = "av"),
        "vec_id", "av", k = 5, nProbe = nC)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val want = Similarity.mipsTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want,
      "all-cells MIPS-IVF must equal the flat MIPS ranking")
  }

  test("cosine and MIPS disagree when corpus norms vary") {
    // neighbor 1 is perfectly aligned but short; neighbor 2 is
    // half-aligned but long: cosine picks 1, inner product picks 2
    def vec(xs: Double*): Array[Float] =
      (xs.map(_.toFloat) ++ Array.fill(64 - xs.size)(0f)).toArray
    val fix = Seq(
      (0L, vec(1.0, 0.0)),   // query
      (1L, vec(1.0, 0.0)),   // cos = 1.0, dot = 1.0
      (2L, vec(8.0, 8.0))).toDF("vec_id", "embedding") // cos ~.707, dot 8
    val q = fix.filter(col("vec_id") === 0)
    val topCos = Similarity.bruteForceTopK(q, fix, "vec_id", "vec_id",
        "embedding", k = 1)
      .select("neighbor_id").as[Long].head()
    val topDot = Similarity.mipsTopK(q, fix, "vec_id", "vec_id",
        "embedding", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(topCos === 1L && topDot === 2L,
      s"expected cosine->1 dot->2, got cosine->$topCos dot->$topDot")
  }
}
