package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-document line dedup (Corpus.lineDedup) on hand-computable
  * fixtures, plus the calibration report's NaN-score exclusion (the
  * r13 ADVICE item: floor(NaN) buckets diverge across engines, so
  * empty docs must be excluded like every other score consumer). */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dupLine = "the quick brown fox jumps high"

  test("line dedup: first (doc,pos) occurrence wins, short lines always stay") {
    val docs = Seq(
      (1L, s"$dupLine\nshort\n$dupLine"),           // within-doc dup too
      (2L, s"$dupLine\nunique line two three four five"),
      (3L, dupLine)                                  // all lines removed
    ).toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, col("doc_id"), col("text"))
      .select("doc_id", "text_clean", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 keeps its pos-0 copy (the global winner) and the short
    // line; its pos-2 copy and every later doc's copy are removed
    assert(got(1L) === ((s"$dupLine\nshort", 3L, 1L)))
    assert(got(2L) === (("unique line two three four five", 2L, 1L)))
    // a doc whose every line was deduplicated away keeps an empty
    // text, not a missing row — downstream filters decide its fate
    assert(got(3L) === (("", 1L, 1L)))
  }

  test("line dedup: ineligible lines never dedup, even when identical") {
    val docs = Seq(
      (1L, "same short\nbody line one two three four five"),
      (2L, "same short\nother body one two three four five"))
      .toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, col("doc_id"), col("text"),
        minTokens = 5)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L),
      "a 2-token line repeats across docs but is below minTokens")
  }

  test("calibration report survives empty docs: finite bucket-0 score, no crash") {
    // the empty doc's NaN punct ratio is ABSORBED by least() (NaN is
    // greatest in both Spark and DuckDB orderings), so it scores a
    // finite 0.008 -> bucket 0 on both engines; what this test pins
    // is (a) no ANSI divide-by-zero crash, (b) the doc is counted
    // once, in bucket 0, identically to the SQL twin's arithmetic
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, ""),
      (3L, "a b c"))
      .toDF("doc_id", "text")
    val rep = Corpus.qualityCalibrationReport(docs, col("doc_id"),
      col("text")).cache()
    assert(rep.agg(sum(col("n_docs"))).as[Long].head() === 3L)
    val bucket0 = rep.filter(col("score_bucket") === 0)
      .agg(sum(col("n_docs"))).as[Long].head()
    assert(bucket0 >= 1L, "the empty doc lands in bucket 0")
    // matrix-internal denominator: shares sum to 1e6 minus floor loss
    val ppm = rep.agg(sum(col("share_ppm"))).as[Long].head()
    assert(ppm === 999999L, "3 docs -> 333333 ppm each, floored")
  }
}
