package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the table-maintenance / ER family added
  * late in round 8: snapshot diff, compaction planning, exact-integer
  * outlier detection, and blocked fuzzy-name dedup.
  */
class MaintenanceOpsSpec extends SparkSpec {

  private def q(name: String) =
    graft.registry.ExtQueries.queries(name)(spark, sf0001)

  test("point-in-time SCD2 join: exactly one version per fact, the right one") {
    import spark.implicits._
    // crafted history: one customer, priority A from ord 10, B from 30
    val changes = Seq((7L, "A", 10L), (7L, "A", 20L), (7L, "B", 30L))
      .toDF("customer_id", "priority", "ord")
    val hist = graft.ops.Merge.scd2(changes, Seq("customer_id"),
      Seq("priority"), col("ord"))
    val facts = Seq((1L, 15L), (2L, 29L), (3L, 30L), (4L, 99L))
      .toDF("fact_id", "ford")
    val out = facts.join(hist,
        facts("ford") >= hist("valid_from") &&
          (hist("valid_to").isNull || facts("ford") < hist("valid_to")))
      .select(col("fact_id"), col("priority"))
      .as[(Long, String)].collect().toMap
    // 15 and 29 sit inside [10, 30) -> A; 30 and 99 in [30, inf) -> B;
    // the no-op change at ord 20 collapsed and cannot split the match
    assert(out == Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"),
      s"got $out")
    // corpus invariants: every shipment keeps exactly one row (left
    // join; half-open intervals admit at most one version), and the
    // pre-history shipments (this corpus does not force ship >= order)
    // surface as NULL versions rather than vanishing
    val pit = q("join_scd2_pointintime").cache()
    val n = pit.count()
    val lineitems = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    // a left join can only inflate the row count, so equality alone
    // proves every shipment ROW matched at most one version (the
    // synthetic lineitem's (orderkey, linenumber) is deliberately
    // NON-unique — the dedup family's fixture — so a distinct-key
    // check would be the wrong invariant here)
    assert(n == lineitems, s"$n rows for $lineitems shipments")
    val preHistory = pit.filter(col("version").isNull).count()
    assert(preHistory > 0 && preHistory < n,
      s"expected a mixed matched/pre-history split, got $preHistory of $n")
    pit.unpersist()
  }

  test("diff_snapshots classifies every mutated PK and only those") {
    val out = q("diff_snapshots").cache()
    try {
      val byType = out.groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = spark.read.parquet(s"$sf0001/customer.parquet")
      val n = base.count()
      val n0 = base.filter(col("c_custkey") % 10 === 0).count()
      val n1 = base.filter(col("c_custkey") % 10 === 1).count()
      val n2 = base.filter(col("c_custkey") % 10 === 2).count()
      assert(byType.getOrElse("changed", 0L) === n0)
      assert(byType.getOrElse("removed", 0L) === n1)
      assert(byType.getOrElse("added", 0L) === n2)
      // unchanged rows (the other 7 residues) never surface
      assert(out.count() === n0 + n1 + n2)
      assert(n0 + n1 + n2 < n)
      // changed rows carry both sides of the attribute
      val ch = out.filter(col("change_type") === "changed")
      assert(ch.filter(col("old_segment").isNull || col("new_segment").isNull)
        .count() === 0)
      assert(ch.filter(col("new_segment") =!= "SEGMENT_V2").count() === 0)
    } finally out.unpersist()
  }

  test("diff_snapshots plans one full-outer sort-merge/hash join, no window") {
    val plan = q("diff_snapshots").queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"not a full-outer join:\n$plan")
    assert(!plan.contains("Window "), s"window crept into the diff:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("sink_compaction_plan packs every shard and respects next-fit order") {
    val rows = q("sink_compaction_plan")
      .orderBy(col("size_bytes").desc, col("shard"))
      .collect()
    assert(rows.nonEmpty)
    // groups are nondecreasing along the packing order and start at 0
    val groups = rows.map(_.getLong(2))
    assert(groups.head === 0L)
    assert(groups.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // every group's cum-before stays within one shard of the target:
    // next-fit can overflow a bin by at most the incoming shard
    val sizes = rows.map(_.getLong(1))
    val cum = sizes.scanLeft(0L)(_ + _).init
    rows.indices.foreach { i =>
      assert(groups(i) === cum(i) / 8192L)
    }
  }

  test("quality_outlier_zscore matches a float z-score replay at 1.5 sd") {
    val out = q("quality_outlier_zscore")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("x"))
    val flagged = docs.groupBy("source")
      .agg(count(lit(1)).as("n"), avg(col("x")).as("mu"),
        stddev_pop(col("x")).as("sd"))
      .join(docs, Seq("source"))
      .filter(col("n") > 1 && col("sd") > 0 &&
        abs(col("x") - col("mu")) > lit(1.5) * col("sd"))
      .select(col("doc_id"))
    // the integer predicate is the exact form of the float one; on
    // data without razor-edge ties the two selections coincide
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = flagged.collect().map(_.getLong(0)).toSet
    assert(a === b, s"integer z-test diverged from float replay: ${a.diff(b)} / ${b.diff(a)}")
    assert(a.nonEmpty)
  }

  test("quality_outlier_zscore broadcasts the stats side") {
    val plan = q("quality_outlier_zscore").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source stats not broadcast:\n$plan")
  }

  test("dedup_fuzzy_names pairs only block-mates at distance 1..3") {
    val rows = q("dedup_fuzzy_names").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(na < nb, s"pair not canonically ordered: $na / $nb")
      assert(d >= 1 && d <= 3)
      assert(na.split(" ").head === nb.split(" ").head,
        s"pair crosses first-token blocks: $na / $nb")
      assert(na.length / 3 === nb.length / 3,
        s"pair crosses length bands: $na / $nb")
    }
    // distinct-name collapse happened: no pair repeats
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("z-order shards bound BOTH dimension spans simultaneously") {
    val rows = graft.registry.RetailQueries
      .queries("sink_zorder_layout")(spark, sf0001).collect()
    assert(rows.length > 1)
    val ckSpanGlobal = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val dySpanGlobal = rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min
    rows.foreach { r =>
      val (ckSpan, dySpan) = (r.getLong(3) - r.getLong(2),
        r.getLong(5) - r.getLong(4))
      // top-6-bit z-sharding fixes the top 3 bits of EACH normalized
      // dim: every shard spans ~1/8 of both ranges (1/6 with rounding
      // slack) — a 1-D sort can bound only one of these
      assert(ckSpan <= ckSpanGlobal / 6 + 1,
        s"shard ${r.getLong(0)} custkey span $ckSpan vs global $ckSpanGlobal")
      assert(dySpan <= dySpanGlobal / 6 + 1,
        s"shard ${r.getLong(0)} day span $dySpan vs global $dySpanGlobal")
    }
    // the audit partitions the table: shard counts sum to the row count
    val total = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum === total)
  }

  test("zone-map pricing is sound and ranks layouts as designed") {
    val rows = q("sink_zonemap_prune_report").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(rows.size == 6, s"3 layouts x 2 predicates, got ${rows.keySet}")
    val total = spark.read.parquet(s"$sf0001/orders.parquet").count()
    rows.foreach { case ((layout, pred),
        (nSh, shSc, rTot, rSc, ppm, matched)) =>
      // every layout partitions the table; pricing never exceeds it
      assert(rTot == total, s"$layout/$pred rows_total $rTot != $total")
      assert(nSh == 16 && shSc <= nSh)
      // SOUNDNESS: min/max pruning may over-read, never under-read —
      // every predicate-matching row sits in a scanned shard
      assert(rSc >= matched, s"$layout/$pred scans $rSc < matched $matched")
      assert(ppm == rSc * 1000000L / rTot)
    }
    def scanned(l: String, p: String) = rows((l, p))._4
    // the matrix's design claims: scatter prunes nothing it can avoid,
    // 1-D clustering wins its own dimension but cannot prune the
    // day-only band below z-order, z-order prunes under BOTH
    assert(scanned("range_ck", "box_2d") <= scanned("zorder_ck_day", "box_2d"))
    assert(scanned("zorder_ck_day", "box_2d") < scanned("scatter_hash", "box_2d"))
    assert(scanned("zorder_ck_day", "band_day") < scanned("range_ck", "band_day"))
    assert(scanned("zorder_ck_day", "band_day") < scanned("scatter_hash", "band_day"))
  }

  test("linear attribution conserves each purchase's credit up to floor loss") {
    val rows = q("attribution_linear").collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getLong(2)).sum
    // purchases with >=1 click in window (recompute independently)
    // Tables.events normalizes both corpus vintages (nanos-long and
    // micros-timestamp parquet) to a TimestampType; cast = epoch sec
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("sec"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("sec").as("csec"))
    val nPurch = p.join(c, col("user_id") === col("cu") &&
        col("csec") <= col("sec") && col("csec") >= col("sec") - 1800)
      .select("p_id").distinct().count()
    // each attributed purchase distributes 1e6 ppm minus < n_clicks
    // of integer-floor remainder
    assert(totalCredit <= 1000000L * nPurch)
    assert(totalCredit > 990000L * nPurch,
      s"credit $totalCredit vs $nPurch purchases")
  }

  test("rfm scores are quintiles within each segment") {
    val rows = q("analytics_rfm_scores").collect()
    assert(rows.nonEmpty)
    Seq(5, 6, 7).foreach { i =>
      assert(rows.forall(r => r.getLong(i) >= 1 && r.getLong(i) <= 5))
    }
    // quintiles are balanced per segment: max-min count <= 1
    rows.groupBy(_.getString(4)).foreach { case (seg, rs) =>
      val counts = rs.groupBy(_.getLong(5)).values.map(_.size)
      assert(counts.max - counts.min <= 1,
        s"unbalanced r_score quintiles in $seg: $counts")
    }
  }

  test("dedup_fuzzy_names joins on the block key, never cross-joins names") {
    val plan = q("dedup_fuzzy_names").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop pairing:\n$plan")
  }
}
