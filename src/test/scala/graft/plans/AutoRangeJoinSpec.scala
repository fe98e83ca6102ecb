package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The AutoRangeJoin optimizer rule: fires exactly on the naive
  * point-in-interval inner join (rewriting BNLJ to a bucketed hash
  * join), is transparent (identical rows, identical columns), and is
  * INERT on everything else — the property that lets it sit in a
  * session safely.
  */
class AutoRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Child session with the rule installed; the suite-wide session
    * stays rule-free so other specs see stock planning. */
  private lazy val rs: SparkSession = {
    val s = spark.newSession()
    AutoRangeJoin.install(s)
    s
  }

  private def points(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(-5L, 0L, 3L, 700L, 1000L, 4096L, 4500L).toDF("x")
  }
  private def intervals(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, -10L, 2L), (2L, 600L, 1200L), (3L, 4000L, 5000L),
      (4L, 9L, 5L), // degenerate: lo > hi, matches nothing
      (5L, 999L, 999L)).toDF("iid", "lo", "hi")
  }

  private def naive(s: SparkSession): DataFrame =
    points(s).join(intervals(s),
      col("x") >= col("lo") && col("x") <= col("hi"))

  test("rewrite fires: BNLJ becomes a bucketed hash join, rows unchanged") {
    val stock = naive(spark)
    assert(stock.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "fixture must plan BNLJ without the rule, or this spec tests nothing")
    val auto = naive(rs)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("Generate explode"), s"no bucket explode:\n$plan")
    val a = auto.orderBy("x", "iid").collect().toSeq
    val b = stock.orderBy("x", "iid").collect().toSeq
    assert(a == b, s"rewrite changed the result: $a vs $b")
    // the expected matches, by hand: -5 and 0 in [-10,2]; 700 and 1000
    // in [600,1200]; 4096 and 4500 in [4000,5000]; 999 absent from the
    // points so interval 5 matches nothing; interval 4 degenerate
    assert(b.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((-5L, 1L), (0L, 1L), (700L, 2L), (1000L, 2L),
        (4096L, 3L), (4500L, 3L)))
  }

  test("comparison orientation and side order do not matter") {
    val flipped = points(rs).join(intervals(rs),
      col("lo") <= col("x") && col("hi") >= col("x"))
    assert(!flipped.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(flipped.orderBy("x", "iid").collect().toSeq ==
      naive(spark).orderBy("x", "iid").collect().toSeq)
    // intervals on the left, points on the right
    val swapped = intervals(rs).join(points(rs),
      col("x") >= col("lo") && col("x") <= col("hi"))
    assert(!swapped.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(swapped.select("x", "iid").orderBy("x", "iid").collect().toSeq
      == naive(spark).select("x", "iid").orderBy("x", "iid")
        .collect().toSeq)
  }

  test("NULLs never match, with and without the rule") {
    import rs.implicits._
    val p = Seq(Some(5L), None).toDF("x")
    val iv = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(10L)))
      .toDF("iid", "lo", "hi")
    val out = p.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("x", "iid").collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1))) == Seq((5L, 1L)))
  }

  test("inert on every other join shape") {
    def planOf(df: DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    // equi conjunct present: SortMergeJoin territory, no bucket column
    val equi = points(rs).join(intervals(rs),
      col("x") === col("iid") && col("x") <= col("hi"))
    assert(!planOf(equi).contains("_graft_range_bucket"),
      s"rule fired on an equi join:\n${planOf(equi)}")
    // outer join: untouched
    val outer = points(rs).join(intervals(rs),
      col("x") >= col("lo") && col("x") <= col("hi"), "left")
    assert(!planOf(outer).contains("_graft_range_bucket"),
      s"rule fired on an outer join:\n${planOf(outer)}")
    // a third conjunct REFERENCING BOTH SIDES survives predicate
    // pushdown, leaving three conjuncts in the join: untouched
    val three = points(rs).join(intervals(rs),
      col("x") >= col("lo") && col("x") <= col("hi")
        && (col("x") + col("iid")) =!= 0L)
    assert(!planOf(three).contains("_graft_range_bucket"))
    // whereas a SINGLE-SIDED third conjunct gets pushed below the
    // join first — the condition the rule then sees is exactly the
    // two range conjuncts, and firing there is a feature
    val pushable = points(rs).join(intervals(rs),
      col("x") >= col("lo") && col("x") <= col("hi")
        && col("iid") =!= 4L)
    assert(planOf(pushable).contains("_graft_range_bucket"),
      s"pushdown should leave a rewritable range join:\n${planOf(pushable)}")
    assert(pushable.orderBy("x", "iid").collect().toSeq ==
      naive(spark).filter(col("iid") =!= 4L).orderBy("x", "iid")
        .collect().toSeq)
    // and the fixture's semantics are still right for all of them
    assert(equi.count() == points(rs).join(intervals(spark),
      col("x") === col("iid") && col("x") <= col("hi")).count())
  }

  test("bucket width conf is respected and result-invariant") {
    val s = spark.newSession()
    AutoRangeJoin.install(s)
    s.conf.set(AutoRangeJoin.WidthConf, "64")
    val narrow = points(s).join(intervals(s),
      col("x") >= col("lo") && col("x") <= col("hi"))
    assert(!narrow.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(narrow.orderBy("x", "iid").collect().toSeq ==
      naive(spark).orderBy("x", "iid").collect().toSeq)
    // a non-power-of-two width disables the rewrite instead of
    // producing a wrong floor division
    s.conf.set(AutoRangeJoin.WidthConf, "100")
    val off = points(s).join(intervals(s),
      col("x") >= col("lo") && col("x") <= col("hi"))
    assert(off.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // the enabled flag is a kill switch
    s.conf.set(AutoRangeJoin.WidthConf, "256")
    s.conf.set(AutoRangeJoin.EnabledConf, "false")
    val disabled = points(s).join(intervals(s),
      col("x") >= col("lo") && col("x") <= col("hi"))
    assert(disabled.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
