package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.{GuardLog, Similarity}

/** The streaming semantic admission gate — parity with the batch
  * corpus x arrival cell-mate computation, and the mega-cell guard. */
class StreamSemanticGateSpec extends SparkSpec {
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

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val corpus = emb.filter(col("vec_id") % 10 =!= 3)
  private lazy val arrivals = emb.filter(col("vec_id") % 10 === 3)
  private lazy val cents = Similarity.ivfCentroids(corpus, "vec_id",
    "embedding", Similarity.autoCentroids(corpus.count()), iters = 2)
  private lazy val corpusIdx =
    Similarity.ivfAssignWith(cents, corpus, "vec_id", "embedding")

  test("semantic gate: stream == batch stale-fit cell-mate pairs, multi-batch safe") {
    // batch truth: ALL vectors assigned with the stale (corpus-only)
    // fit, arrival x standing cell-mates at >= eps cosine
    val aAll = Similarity.ivfAssignWith(cents, emb, "vec_id", "embedding")
    val want = aAll.filter(col("vec_id") % 10 === 3).as("a")
      .join(aAll.filter(col("vec_id") % 10 =!= 3).as("b"),
        col("a.centroid_id") === col("b.centroid_id"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
        Similarity.dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture must contain corpus x arrival cell-mates")
    // two files -> two micro-batches: the literal-fold assignment and
    // the stream-static probe must behave identically across batches
    val dir = java.nio.file.Files.createTempDirectory("graft_semgate").toString
    arrivals.filter(col("vec_id") % 20 === 3).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    arrivals.filter(col("vec_id") % 20 =!= 3).coalesce(1)
      .write.mode("append").parquet(dir)
    graft.ext.Scratch.reclaimOnExit(dir)
    val src = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = StreamOps.runToMemory(
        StreamOps.semanticGate(src, cents, corpusIdx, "vec_id",
          "embedding", eps = 0.3),
        "semgate_test", OutputMode.Append())
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want,
      s"gate/batch divergence: extra=${got -- want} missing=${want -- got}")
  }

  test("semantic gate: mega-cell cap admits everything and fires loudly") {
    // the cap lives at STAGING time now (ADVICE r16): capCells drops
    // over-cap cells with an observe that fires when the staged
    // artifact materializes, and the gate reads the bounded leaf
    val capped = graft.ext.Materialize.eager(
      Similarity.capCells(corpusIdx, maxCell = 1L, "semgate_spec_cap"))
    val n = StreamOps.semanticGate(arrivals, cents, capped, "vec_id",
        "embedding", eps = 0.3).count()
    // every standing cell holds > 1 member: the whole index drops
    // from the probe (arrivals all admitted), counted through the
    // guard at staging time
    assert(n == 0L, s"capped gate still emitted $n pairs")
    assert(awaitGuard("semgate_spec_cap").exists(_ > 0L))
  }

  test("semantic gate refuses an index that does not honor the cap") {
    // ADVICE r17: boundedness rests on callers passing the capped
    // staged artifact — an uncapped index must fail LOUDLY at gate
    // construction, not silently reinstate per-trigger |cell| cost
    val e = intercept[IllegalArgumentException] {
      StreamOps.semanticGate(arrivals, cents, corpusIdx, "vec_id",
        "embedding", eps = 0.3, maxCell = 1L)
    }
    assert(e.getMessage.contains("UNCAPPED"), e.getMessage)
  }
}
