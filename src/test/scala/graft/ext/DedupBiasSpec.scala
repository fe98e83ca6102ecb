package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup quality-bias report: removal decisions crossed with score
  * buckets, over hand-built component labelings. */
class DedupBiasSpec extends SparkSpec {
  import spark.implicits._

  // long, stopword-rich -> high score bucket; terse symbol soup -> low
  private val good = ("the quick brown fox and the lazy dog of the " +
    "morning walked to a field and the day was long and the road " +
    "was dry and a bird sang to the sun of the south and the wind") // 40+ toks
  private val bad = "@@ ## $$ %% ^^ && ** (( ))"

  test("no duplicates: zero removals everywhere, shares reconcile") {
    val docs = Seq((1L, good), (2L, good + " extra"), (3L, bad))
      .toDF("doc_id", "text")
    val comp = Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("doc_id", "component")
    val got = Corpus.dedupBiasReport(docs, comp, col("doc_id"),
        col("text"))
      .select("score_bucket", "n_docs", "n_removed", "removed_ppm",
        "removal_share_ppm", "bucket_share_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._3).sum === 0L)
    assert(got.forall(_._5 === 0L), "no removals -> zero shares, not NaN")
    val docTotal = got.map(_._2).sum
    assert(docTotal === 3L)
    // floor-div shares reconcile to within one ppm per bucket
    assert(math.abs(got.map(_._6).sum - 1000000L) < got.length)
  }

  test("removals land in the duplicated stratum's bucket") {
    // the low-quality doc is re-uploaded 3x (one survives as the
    // component representative); the high-quality docs are unique
    val docs = Seq((1L, good), (2L, good + " tail"),
      (10L, bad), (11L, bad), (12L, bad)).toDF("doc_id", "text")
    val comp = Seq((1L, 1L), (2L, 2L), (10L, 10L), (11L, 10L),
      (12L, 10L)).toDF("doc_id", "component")
    val rows = Corpus.dedupBiasReport(docs, comp, col("doc_id"),
        col("text"))
      .select("score_bucket", "n_docs", "n_removed", "removed_ppm",
        "removal_share_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val lowBucket = rows.keys.min
    val highBucket = rows.keys.max
    assert(lowBucket !== highBucket,
      "fixture must separate the quality strata")
    assert(rows(lowBucket)._3 === 2L, "docs 11 and 12 are removed")
    assert(rows(lowBucket)._4 === 2000000L / 3L)
    assert(rows(lowBucket)._5 === 1000000L, "all removals in one bucket")
    assert(rows(highBucket)._3 === 0L)
  }
}
