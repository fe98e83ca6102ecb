package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guard-firing pins (VERDICT r15 #3): every scale guard is exercised
  * on a hostile fixture here — caps fire LOUDLY through GuardLog,
  * outputs stay bounded, and the cost is recall-only. The sf0.1-scale
  * twin is `tools/StressGate` (hostile derived corpus, committed
  * artifact STRESS_r16.json); these are the fast in-memory pins.
  */
class StressGuardsSpec extends SparkSpec {
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

  test("minhash hot-bucket cap: an identical-signature class drops loudly, output bounded") {
    val k = 1100 // > the 1024 default cap
    val text = (1 to 48).map(i => s"tok$i").mkString(" ")
    val docs = (1 to k).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text")
    // every band bucket holds the whole class (identical signatures):
    // all 8 buckets exceed the cap, the candidate join sees nothing —
    // 0 rows instead of k^2/2 ~ 600k
    assert(out.count() === 0L)
    assert(awaitGuard("minhash_hot_bucket").contains(8L * k),
      s"guard must count the dropped band rows; fired=${GuardLog.lastFired}")
  }

  test("simhash hot-bucket cap costs only CROSS-class recall: intra rows survive") {
    val docs = Seq(
      (1L, "spark query filter join group sort merge"),
      (2L, "spark query filter join group sort merge"),
      (3L, "spark query filter join group sort merge extra"))
      .toDF("doc_id", "text")
    // maxBucket = 0: EVERY band bucket drops (occupancy >= 1), so any
    // cross-class pair is lost (logged) regardless of where the two
    // hashes land — but the exact-duplicate intra row comes from the
    // CLASS table, not the bucket join, and must survive any cap
    val out = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucket = 0L)
      .select("doc_a", "doc_b", "hamming", "n_a", "n_b", "n_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 0L, 2L, 2L, 1L)), s"got $out")
    // two classes x four bands, all dropped and counted
    assert(awaitGuard("simhash_hot_bucket").contains(8L),
      s"fired=${GuardLog.lastFired}")
  }

  test("mega-basket cap: a degenerate order drops from the pair join, counted") {
    val dir = java.nio.file.Files.createTempDirectory("stress_li").toString
    val mega = (1 to 600).map(p => (1L, p.toLong))
    val pair = Seq((2L, 100L), (2L, 101L), (3L, 100L), (3L, 101L))
    (mega ++ pair).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.registry.ExtQueries.queries("analytics_basket_pairs")(
      spark, dir)
    val rows = out.select("part_a", "part_b")
      .as[(Long, Long)].collect().toSet
    // the mega order contributes NOTHING; the legitimate repeated
    // pair survives
    assert(rows === Set((100L, 101L)), s"got $rows")
    assert(awaitGuard("basket_pairs").contains(1L),
      s"one mega basket must be counted; fired=${GuardLog.lastFired}")
  }

  test("inverted-index df-cap records through GuardLog and bounds the join") {
    val docs = (1 to 600).map(i => (i.toLong, s"hot uniq$i only$i"))
      .toDF("doc_id", "text")
    // 'hot' has df 600 > 500: dropped (recall-only — the unique
    // tokens share nothing, so the pair join sees zero rows instead
    // of 600^2/2 candidates through the hot token)
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.1)
    assert(out.count() === 0L)
    assert(awaitGuard("df_cap").exists(_ >= 1L),
      s"df-cap drop must be recorded; fired=${GuardLog.lastFired}")
  }

  test("streaming gate's standing index is hot-bucket capped: degenerate corpus probes stay bounded") {
    val k = 1100 // > the 1024 default cap
    val text = (1 to 48).map(i => s"tok$i").mkString(" ")
    val corpus = (1 to k).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, col("doc_id"),
      col("text"), 3, 32)
    val arriving = Seq((999999L, text)).toDF("doc_id", "text")
    // without the cap this probe pays |bucket| = 1100 candidate rows
    // per band on EVERY micro-batch; with it the hot standing buckets
    // are dropped at staging (loud) and the probe sees nothing
    val out = graft.streaming.StreamOps.nearDupGate(arriving, sigs,
      "doc_id", "text")
    assert(out.count() === 0L)
    assert(awaitGuard("stream_neardup_corpus_hot_bucket").contains(8L * k),
      s"fired=${GuardLog.lastFired}")
  }
}
