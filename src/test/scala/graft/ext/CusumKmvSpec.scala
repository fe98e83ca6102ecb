package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CUSUM change-point and KMV overlap sketch: closed form vs the
  * textbook recursion, shift-detection behavior, and the k >= |union|
  * exactness degeneracy. */
class CusumKmvSpec extends SparkSpec {
  import spark.implicits._

  private def tsOf(hour: Int): Timestamp =
    new Timestamp((1700000000L + hour * 3600L) * 1000L)

  /** n events in the given hour for key k. */
  private def hours(k: String, perHour: Seq[Int]): Seq[(String, Timestamp)] =
    perHour.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((k, tsOf(h)))
    }

  test("closed-form CUSUM equals the max(0, s + dev) recursion") {
    val series = Seq(3, 1, 2, 9, 0, 4, 4, 7, 1, 2)
    val df = hours("a", series).toDF("k", "ts")
    val got = Windows.cusumChangepoint(df, col("k"), col("ts"), lambda = 1L)
      .select("k", "n_hours", "n_events", "n_alarm_hours", "max_cusum")
      .as[(String, Long, Long, Long, Long)].head()
    // driver-side replay in the same H-scaled integer units
    val h = series.size.toLong
    val t = series.map(_.toLong).sum
    var s = 0L
    var maxS = 0L
    var alarms = 0L
    for (n <- series) {
      s = math.max(0L, s + (n * h - t))
      maxS = math.max(maxS, s)
      if (s > t * 1L) alarms += 1
    }
    assert(got === (("a", h, t, alarms, maxS)))
  }

  test("a sustained level shift alarms; the flat series never does") {
    val flat = hours("flat", Seq.fill(24)(5))
    // mean jumps 5 -> 15 at hour 12 and STAYS there: each post-shift
    // hour adds ~ (15 - 10) x H to the cusum, crossing lambda x T
    val shifted = hours("shift", Seq.fill(12)(5) ++ Seq.fill(12)(15))
    val df = (flat ++ shifted).toDF("k", "ts")
    val byK = Windows.cusumChangepoint(df, col("k"), col("ts"), lambda = 1L)
      .select("k", "n_alarm_hours", "first_alarm_epoch")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(byK("flat")._1 === 0L, "flat series must not alarm")
    assert(byK("shift")._1 > 0L, "sustained shift must alarm")
    // the change-point estimate lands at or after the true shift hour
    // (hour epochs are floored to the 3600 grid)
    val shiftEpoch = (1700000000L + 12 * 3600L) / 3600L * 3600L
    assert(byK("shift")._2.get >= shiftEpoch)
  }

  test("KMV estimate is EXACT when k covers the whole union") {
    // 3 classes over a tiny id space: sketches hold every distinct
    // hash, so the k-min sample IS the union and the estimate must
    // equal floor(I * 1e6 / U)
    val rows = (0 until 30).map(i => ("a", i)) ++
      (15 until 45).map(i => ("b", i)) ++
      (0 until 45 by 3).map(i => ("c", i))
    val df = rows.toDF("cls", "item")
    val got = Sketches.kmvJaccard(df, col("cls"), col("item"), k = 64)
      .select("cls_a", "cls_b", "kmv_jaccard_ppm", "exact_jaccard_ppm")
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, est, exact) =>
      assert(est === exact, s"($a,$b): est $est != exact $exact with k>=|U|")
    }
    // and the truth columns are right: |a ∩ b| = 15, |a ∪ b| = 45
    val ab = Sketches.kmvJaccard(df, col("cls"), col("item"), k = 64)
      .filter(col("cls_a") === "a" && col("cls_b") === "b")
      .select("n_inter", "n_a", "n_b").as[(Long, Long, Long)].head()
    assert(ab === ((15L, 30L, 30L)))
  }

  test("KMV at small k still lands near the exact overlap") {
    val rows = (0 until 2000).map(i => ("x", i)) ++
      (1000 until 3000).map(i => ("y", i))
    val df = rows.toDF("cls", "item")
    val r = Sketches.kmvJaccard(df, col("cls"), col("item"), k = 64)
      .select("kmv_jaccard_ppm", "exact_jaccard_ppm", "k_used")
      .as[(Long, Long, Long)].head()
    assert(r._3 === 64L, "merged sample must be cut to k")
    // exact J = 1000/3000 ≈ 333333 ppm; KMV with k=64 has sd ≈
    // sqrt(J(1-J)/k) ≈ 59k ppm — 4 sd is a deterministic-hash bound
    assert(math.abs(r._1 - r._2) < 240000,
      s"KMV estimate ${r._1} implausibly far from exact ${r._2}")
  }

  test("dedup_source_overlap_kmv: every pair inside the binomial error bound") {
    // the registered sketched overlap matrix on the driver corpus:
    // the k-min union sample is a uniform draw of the union, so
    // n_both ~ Binomial(k_used, J) and |est - exact| must sit within
    // 4 x sqrt(J(1-J)/k_used) (+1 ppm floor-div quantization, + a
    // small-J floor because 4 sd of a near-zero J underestimates the
    // discrete one-hit jump 1/k). A hash family that clumped (a
    // non-uniform sample) would blow through this on SOME of the
    // 190 source pairs.
    val rows = graft.registry.ExtQueriesDedup
      .queries("dedup_source_overlap_kmv")(spark, sf0001)
      .select("source_a", "source_b", "k_used", "kmv_jaccard_ppm",
        "exact_jaccard_ppm")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.length === 190, "20 sources -> 190 unordered pairs")
    rows.foreach { case (a, b, k, est, exact) =>
      assert(k > 0 && k <= 256)
      val j = exact.toDouble / 1e6
      val sd = math.sqrt(j * (1 - j) / k)
      val bound = 4 * sd * 1e6 + 1e6 / k + 1
      assert(math.abs(est - exact) <= bound,
        s"($a,$b): |$est - $exact| > 4sd bound ${bound.toLong} at k=$k")
    }
  }
}
