package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert: update wins, unmatched base survives, delete removes") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val upd = Seq((2L, "B", false), (3L, "c", true), (4L, "d", false))
      .toDF("k", "v", "del")
    val out = Merge.mergeUpsert(base, upd, Seq("k"), Some("del"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("aggState merge over any split equals the state of the full data") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("m", date_format(col("l_shipdate"), "yyyy-MM"))
    val full = Merge.aggState(li, Seq("m"), col("l_extendedprice"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    // 3-way split on an unrelated key: states must fold back exactly
    val parts = Seq(0, 1, 2).map(r =>
      Merge.aggState(li.filter(col("l_orderkey") % 3 === r), Seq("m"),
        col("l_extendedprice")))
    val merged = Merge.mergeAggStates(parts, Seq("m"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(merged === full, "merged states diverge from direct aggregation")
    // merging a single state is the identity
    val one = Merge.mergeAggStates(Seq(parts.head), Seq("m"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val direct = Merge.aggState(li.filter(col("l_orderkey") % 3 === 0),
        Seq("m"), col("l_extendedprice"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(one === direct)
  }

  test("mergeUpsert refuses ambiguous duplicate update keys") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val upd = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeUpsert(base, upd, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("mergeUpsert plan: base side joins without an exchange (broadcast keys)") {
    val base = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val upd = Seq((1L, "X")).toDF("k", "v")
    val plan = Merge.mergeUpsert(base, upd, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      plan.toLowerCase.contains("broadcast"),
      s"anti-join is not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"base side shuffles in a copy-on-write merge:\n$plan")
  }

  test("mergeUpsert re-apply is a fixed point (the crash-replay safety claim)") {
    // applyUpsertBatch documents that replaying a batch over a table
    // that already contains it is safe; this pins the algebra behind
    // that claim: mergeUpsert(mergeUpsert(base, u), u) == mergeUpsert(base, u)
    val base = (0 until 200).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val upd = Seq((5L, "X"), (150L, "Y"), (999L, "new")).toDF("k", "v")
    val once = Merge.mergeUpsert(base, upd, Seq("k"))
      .as[(Long, String)].collect().toSet
    val twice = Merge.mergeUpsert(
        Merge.mergeUpsert(base, upd, Seq("k")), upd, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(twice == once, "re-applying the same batch changed the table")
  }

  test("scd2: no-op replays collapse, intervals chain, version counts") {
    val changes = Seq(
      (1L, "LOW", 10L), (1L, "LOW", 20L),  // replay -> collapses to 10
      (1L, "HIGH", 30L), (1L, "LOW", 40L), // back-and-forth both survive
      (2L, "MED", 15L)
    ).toDF("id", "attr", "ord")
    val out = Merge.scd2(changes, Seq("id"), Seq("attr"), col("ord"))
      .select(col("id"), col("attr"), col("valid_from"), col("valid_to"),
        col("is_current"), col("version"))
      .as[(Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, "LOW", 10L, Some(30L), false, 1L),
      (1L, "HIGH", 30L, Some(40L), false, 2L),
      (1L, "LOW", 40L, None, true, 3L),
      (2L, "MED", 15L, None, true, 1L)))
  }
}
