package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom false-positive audit: the simulated filter's bit pattern is
  * fully deterministic (hex60 positions), so the spec replays the
  * WHOLE filter driver-side with [[TextOps.hex60Local]] and compares
  * exact counts — plus the structural Bloom guarantee (no false
  * negatives, ever). */
class BloomFprSpec extends SparkSpec {
  import spark.implicits._

  private def posOf(key: Long, k: Int, m: Int): Set[Long] =
    (1 to k).map(i => TextOps.hex60Local(s"$i:$key") % m).toSet

  test("members are always positive; negatives match the exact replay") {
    // small filter (m=64, k=2) so false positives actually occur
    val ins = (1L to 40L).toDF("key")
    val query = (1L to 200L).map(x => (x, x <= 40L))
      .toDF("key", "member")
    val got = Sketches.bloomFprReport(ins, query, "key", "member",
        m = 64, k = 2)
      .collect().head
    val bits = (1L to 40L).flatMap(posOf(_, 2, 64)).toSet
    val negFp = (41L to 200L).count(x => posOf(x, 2, 64).subsetOf(bits))
    assert(got.getAs[Long]("bits_set") === bits.size.toLong)
    assert(got.getAs[Long]("n_member_queries") === 40L)
    // the structural guarantee: EVERY member probes positive
    assert(got.getAs[Long]("n_member_pos") === 40L)
    assert(got.getAs[Long]("n_neg_queries") === 160L)
    assert(got.getAs[Long]("n_false_pos") === negFp.toLong)
    assert(negFp > 0, "fixture must exercise the false-positive path")
    assert(got.getAs[Long]("fpr_ppm") ===
      negFp.toLong * 1000000L / 160L)
    val bs = bits.size.toLong
    assert(got.getAs[Long]("fpr_occupancy_ppm") ===
      bs * bs * 1000000L / (64L * 64L))
  }

  test("registered query: no false negatives, occupancy formula holds") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.registry.ExtQueriesAnalytics
      .queries("sketch_bloom_fpr_report")(spark, dir).collect().head
    assert(got.getAs[Long]("n_member_pos") ===
      got.getAs[Long]("n_member_queries"))
    assert(got.getAs[Long]("n_neg_queries") > 0L,
      "the insert predicate must leave parts OUT of the filter")
    val bs = got.getAs[Long]("bits_set")
    assert(got.getAs[Long]("fpr_occupancy_ppm") ===
      bs * bs * bs * 1000000L / (4096L * 4096L * 4096L))
    assert(got.getAs[Long]("fpr_ppm") <= 1000000L)
  }
}
