package graft.ext

import graft.SparkSpec

/** The staged-artifact store's contract: keyed by corpus dir AND
  * every generator parameter, so two scales or two parameterizations
  * can never share an artifact — and repeat reads return the
  * identical staged rows (the build-once guarantee correctness rides
  * on). */
class PairStageSpec extends SparkSpec {

  test("staged pairs are keyed by corpus dir and params; reads are stable") {
    val a1 = PairStage.lshPairs(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    // second read serves the SAME artifact (values identical)
    val a2 = PairStage.lshPairs(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(a1 === a2)
    // a different parameterization builds a DIFFERENT artifact: a
    // stricter threshold can only shrink the pair set, and sharing a
    // key would return the 0.5-threshold rows verbatim
    val strict = PairStage.lshPairs(spark, sf0001, threshold = 0.9)
      .collect().map(_.toString).sorted.toSeq
    assert(strict.size < a1.size,
      s"threshold=0.9 returned ${strict.size} pairs vs ${a1.size} at 0.5 " +
        "- parameterizations may be sharing a staged artifact")
    assert(strict.toSet.subsetOf(a1.toSet))
  }

  test("staged BPE state matches an inline train exactly") {
    val (stagedMerges, stagedState) =
      PairStage.bpeTrained(spark, sf0001, rounds = 3)
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val (merges, state) = Corpus.bpeTrain(docs,
      org.apache.spark.sql.functions.col("text"), rounds = 3)
    assert(stagedMerges.collect().map(_.toString).sorted.toSeq
      === merges.collect().map(_.toString).sorted.toSeq)
    assert(stagedState.collect().map(_.toString).sorted.toSeq
      === state.collect().map(_.toString).sorted.toSeq)
  }
}
