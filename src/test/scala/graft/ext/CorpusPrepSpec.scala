package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("sequence packing: greedy per-group bins never exceed the budget") {
    val packed = Packing.packSequences(docs, col("doc_id"), col("text"),
      budgetTokens = 512, nGroups = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.nonEmpty)
    assert(packed.map(_._3).distinct.forall(g => g >= 0 && g < 8))
    // replay the greedy fold per group locally and compare bin ids
    packed.groupBy(_._3).foreach { case (_, rows) =>
      var bin = 0L; var fill = 0L; var first = true
      rows.sortBy(_._1).foreach { case (_, n, _, gotBin) =>
        if (!first && fill + n > 512) { bin += 1; fill = 0L }
        first = false
        fill += n
        assert(gotBin == bin, s"bin mismatch (expected $bin got $gotBin)")
      }
    }
    // THE packing contract: a bin's total stays within budget unless a
    // single oversized document owns it
    packed.groupBy(r => (r._3, r._4)).foreach { case ((g, b), rows) =>
      val total = rows.map(_._2).sum
      assert(total <= 512 || rows.size == 1,
        s"bin ($g,$b) holds $total tokens across ${rows.size} docs")
    }
    // deterministic under a different partitioning
    val again = Packing.packSequences(docs.repartition(13), col("doc_id"),
        col("text"), budgetTokens = 512, nGroups = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == again.toSeq)
  }

  test("contamination check finds 13-gram overlap and nothing else") {
    val span = (1 to 13).map(i => s"tok$i").mkString(" ")
    val test = Seq((100L, s"benchmark question $span answer"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words $span suffix words here"), // contaminated
      (2L, "completely different content with no overlap at all " +
        "padding padding padding padding padding padding padding"))
      .toDF("doc_id", "text")
    val hits = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
        shingleN = 13)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits.map(h => (h._1, h._2)) == Seq((1L, 100L)))
    assert(hits.head._3 >= 1L)
  }

  test("contamination survives the hot-shingle cap only below the df threshold") {
    val span = (1 to 13).map(i => s"w$i").mkString(" ")
    val train = (1L to 10L).map(i => (i, s"doc $i has $span inside"))
      .toDF("doc_id", "text")
    val test = Seq((99L, s"held out $span text")).toDF("doc_id", "text")
    // df of the shared shingle is 10 > maxDf=5 -> dropped (and logged)
    val capped = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
      shingleN = 13, maxDf = 5)
    assert(capped.count() == 0)
    val uncapped = Dedup.crossCorpusOverlap(train, test, "doc_id", "text",
      shingleN = 13, maxDf = 500)
    assert(uncapped.count() == 10)
  }

  test("corpus_curation_v2: fused registered plan equals stage-materialized replay") {
    // the bench stage probe materializes between stages; the oracle
    // checks the fused plan — this pins that the two paths are the
    // same computation, so stage timings attribute the verified query
    val fused = graft.registry.ExtQueries.queries("corpus_curation_v2")(
      spark, sf0001).as[(String, Long, Long, Long)].collect().toSet
    var cur = graft.registry.ExtQueries.curationV2Docs(spark, sf0001)
    for ((_, f) <- graft.registry.ExtQueries.curationV2Stages(spark, sf0001))
      cur = Materialize.eager(f(cur))
    val staged = cur.as[(String, Long, Long, Long)].collect().toSet
    assert(fused.nonEmpty, "curation v2 selected nothing at sf0.001")
    assert(staged == fused, "staged replay diverges from the fused plan")
  }
}
