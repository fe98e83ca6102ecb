package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The dedup-modality agreement matrix (r17 #5) on a hand-built
  * fixture with known overlap/disagreement counts — every cell,
  * including the subtraction-derived simhash-only cell, is asserted
  * exactly. */
class DedupAgreementSpec extends SparkSpec {
  import spark.implicits._

  test("agreementMatrix: exact 2x2x2 cells, class-space simhash-only subtraction") {
    // 8 docs, two sources; simhash classes: {1,2} share a hash
    // (class rep 1), everyone else distinct; the banded output
    // carries one cross-class pair (1,3) and the intra row for
    // class 1.
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
      (5L, "s2"), (6L, "s2"), (7L, "s2"), (8L, "s2"))
      .toDF("doc_id", "source")
    val hashes = Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 400L),
      (5L, 500L), (6L, 600L), (7L, 700L), (8L, 800L))
      .toDF("doc_id", "sh")
    val classPairs = Seq((1L, 3L), (1L, 1L)).toDF("doc_a", "doc_b")
    val mPairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val semPairs = Seq((2L, 1L), (5L, 6L)).toDF("vec_id", "removed_by")

    val out = Dedup.agreementMatrix(docs, mPairs, hashes, classPairs,
        semPairs)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSet

    // Union pairs: (1,2) minhash+semantic, same class -> (1,1,1);
    // (3,4) minhash only, reps 3/4 unpaired -> (1,0,0);
    // (5,6) semantic only -> (0,0,1).
    // Simhash totals for (s1,s1): intra class{1,2} C(2,2)=1 pair +
    // cross (1,3) expansion 2x1=2 pairs = 3; minus the 1 already in
    // the union -> simhash-only (0,1,0) = 2. Grand total 5 pairs.
    val want = Set(
      ("s1", "s1", 1L, 1L, 1L, 1L, 200000L),
      ("s1", "s1", 1L, 0L, 0L, 1L, 200000L),
      ("s2", "s2", 0L, 0L, 1L, 1L, 200000L),
      ("s1", "s1", 0L, 1L, 0L, 2L, 400000L))
    assert(out == want, s"got $out")
  }
}
