package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The class-collapsed banded pair engine (r16): identical hashes
  * group to one representative row BEFORE the band self-join, hot
  * band buckets are capped loudly through GuardLog, and the emitted
  * n_pairs re-express the per-row pair count exactly. */
class BandedPairsSpec extends SparkSpec {
  import spark.implicits._

  /** Poll GuardLog for a guard name — listener delivery is async. */
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

  test("cross-class pairs carry class sizes; intra rows only for n >= 2") {
    // two classes within Hamming 2 of each other (bits 0 and 1
    // differ), one far singleton
    val rows = Seq(
      (10L, 0L), (11L, 0L), (12L, 0L),       // class A: n=3, rep 10
      (20L, 3L), (21L, 3L),                  // class B: n=2, rep 20
      (30L, 0x0F0F0F0FL))                    // far singleton
      .toDF("id", "h")
    val out = BandedPairs.classPairs(rows, "id", "h",
        nBands = 4, bandBits = 16, maxHamming = 3,
        maxBucket = 1000L, guardName = "bp_spec_basic")
      .select("doc_a", "doc_b", "hamming", "n_a", "n_b", "n_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 20L, 2L, 3L, 2L, 6L),   // cross: 3x2 doc pairs implied
      (10L, 10L, 0L, 3L, 3L, 3L),   // intra A: 3 choose 2
      (20L, 20L, 0L, 2L, 2L, 1L)),  // intra B: 2 choose 2
      s"got $out")
  }

  test("hot-bucket cap drops quadratic buckets LOUDLY and bounds the output") {
    val n = 64
    // hashes i << 16: band 1 keys all distinct (occupancy 1), bands
    // 0/2/3 all key 0 — three buckets of occupancy n each. Any two
    // hashes with bitCount(i^j) <= 3 are near-dups reachable ONLY
    // through the hot buckets.
    val rows = (1 to n).map(i => (i.toLong, i.toLong << 16))
      .toDF("id", "h")
    // uncapped: pairs exist (e.g. 1<<16 vs 2<<16 at Hamming 2)
    val open = BandedPairs.classPairs(rows, "id", "h", 4, 16, 3,
      maxBucket = 1000L, guardName = "bp_spec_open")
    assert(open.count() > 0, "uncapped fixture must produce pairs")
    assert(awaitGuard("bp_spec_open").isEmpty,
      "an under-cap fixture must not fire the guard")
    // capped at 8: the three occupancy-n buckets drop (3n class rows
    // counted), band 1 survives at occupancy 1, and no pair path
    // remains — output is BOUNDED instead of quadratic
    val capped = BandedPairs.classPairs(rows, "id", "h", 4, 16, 3,
      maxBucket = 8L, guardName = "bp_spec_hot")
    assert(capped.count() == 0)
    assert(awaitGuard("bp_spec_hot").contains(3L * n),
      s"guard must report the dropped class rows; fired=${GuardLog.lastFired}")
  }

  test("a size-k identical class emits one row through the whole engine") {
    val k = 500
    val rows = ((1 to k).map(i => (i.toLong, 42L)) :+ (9999L, 43L))
      .toDF("id", "h")
    val out = BandedPairs.classPairs(rows, "id", "h", 4, 16, 3,
        maxBucket = 1000L, guardName = "bp_spec_class")
      .select("doc_a", "doc_b", "hamming", "n_a", "n_b", "n_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // 42 vs 43 differ in bit 0 (Hamming 1): one cross row with the
    // k-size class, one intra row — 2 rows total for k+1 items
    assert(out == Set(
      (1L, 9999L, 1L, k.toLong, 1L, k.toLong),
      (1L, 1L, 0L, k.toLong, k.toLong, k.toLong * (k - 1) / 2)),
      s"got $out")
  }
}
