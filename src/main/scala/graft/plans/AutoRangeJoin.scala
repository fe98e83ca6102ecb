package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive point-in-interval INNER join into
  * the bucketed equi-join [[graft.ext.RangeJoin]] offers manually.
  *
  * Spark plans `p.x BETWEEN i.lo AND i.hi` (no equi conjunct) as
  * BroadcastNestedLoopJoin — or CartesianProduct when neither side
  * fits a broadcast — the quadratic shape that does not survive
  * scale. A user writing plain SQL gets that plan silently. This rule
  * makes the library's bucket rewrite AUTOMATIC for exactly that
  * query: bucket the point side by `x div W`, explode each interval
  * to the buckets it covers, equi-join on the bucket, and keep the
  * original range predicate as the exact post-filter. Output
  * attributes (ids included) and row multiset are identical to the
  * naive join's — the rewrite is transparent, which is why the
  * registered query can share the naive-SQL oracle.
  *
  * Narrow by design — the rule fires ONLY when:
  *  - the join is INNER with no join hint;
  *  - the condition is exactly two conjuncts forming `lo <= p AND
  *    p <= hi` (any comparison orientation; SQL BETWEEN parses to
  *    this), with `p` referencing one side only and both bounds the
  *    other side only;
  *  - all three expressions are INT/BIGINT and deterministic, and
  *    none embeds a subquery.
  * Joins with an equi conjunct (SortMergeJoin handles those), outer
  * joins, and every other shape pass through untouched — the
  * inertness the no-fire specs pin.
  *
  * Semantics notes: a NULL point or bound never matches in the naive
  * join; after the rewrite a NULL bucket key (or a NULL sequence,
  * generating no rows) drops the same rows. Negative values are safe:
  * the bucket map is an arithmetic shift (floor division), monotone
  * over the full long range, so `lo <= p <= hi` still implies
  * `bucket(p)` lies in the exploded range. The bucket width must be a
  * power of two (`spark.graft.rangeJoin.bucketWidth`, default 256) —
  * the div compiles to a shift. Width choice at scale: ~the median
  * interval span keeps replication ~2x (see RangeJoin's Scaladoc);
  * a pathologically wide interval costs span/W generated rows, which
  * is the linear price of not being quadratic.
  *
  * Deployment: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects it at session build; [[install]] adds it to a LIVE
  * session's `experimental.extraOptimizations` (idempotent) — the
  * path the registered `join_range_auto` query uses on a child
  * session so the shared registry session stays untouched.
  */
object AutoRangeJoin extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"
  val EnabledConf = "spark.graft.rangeJoin.enabled"

  /** Idempotently add the rule to a live session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(AutoRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoRangeJoin

  private def widthOpt: Option[Long] = {
    val w =
      try conf.getConfString(WidthConf, "256").toLong
      catch { case _: NumberFormatException => -1L }
    if (w > 0 && (w & (w - 1)) == 0) Some(w) else None
  }

  private def enabled: Boolean =
    try conf.getConfString(EnabledConf, "true").toBoolean
    catch { case _: IllegalArgumentException => false }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def clean(e: Expression): Boolean =
    e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]])

  /** (point, bound) from a lower-bound conjunct: bound <= point. */
  private def lowerOf(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(b, p)    => Some((p, b))
      case GreaterThanOrEqual(p, b) => Some((p, b))
      case _                        => None
    }

  /** (point, bound) from an upper-bound conjunct: point <= bound. */
  private def upperOf(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, b)    => Some((p, b))
      case GreaterThanOrEqual(b, p) => Some((p, b))
      case _                        => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(And(c1, c2)), hint)
          if hint == JoinHint.NONE =>
        val rewrites = for {
          (lc, uc) <- Seq((c1, c2), (c2, c1))
          (p1, lo) <- lowerOf(lc).toSeq
          (p2, hi) <- upperOf(uc).toSeq
          if p1.semanticEquals(p2)
          out <- rewrite(j, p1, lo, hi).toSeq
        } yield out
        rewrites.headOption.getOrElse(j)
    }

  private def rewrite(j: Join, point: Expression, lo: Expression,
                      hi: Expression): Option[LogicalPlan] = {
    val w = widthOpt.getOrElse(return None)
    if (!Seq(point, lo, hi).forall(e => integral(e) && clean(e)))
      return None
    val boundRefs = lo.references ++ hi.references
    if (point.references.isEmpty || boundRefs.isEmpty) return None
    val (pointSide, boundSide, pointIsLeft) =
      if (point.references.subsetOf(j.left.outputSet) &&
          boundRefs.subsetOf(j.right.outputSet))
        (j.left, j.right, true)
      else if (point.references.subsetOf(j.right.outputSet) &&
          boundRefs.subsetOf(j.left.outputSet))
        (j.right, j.left, false)
      else return None
    val shift = Literal(java.lang.Long.numberOfTrailingZeros(w))
    def bucketOf(e: Expression): Expression =
      ShiftRight(Cast(e, LongType), shift)
    // point side: project the bucket key alongside the full output
    val pBucket = Alias(bucketOf(point), "_graft_range_bucket")()
    val pPlan = Project(pointSide.output :+ pBucket, pointSide)
    // bound side: degenerate intervals (lo > hi) match nothing in
    // BETWEEN; filter them so the ascending sequence is well-defined
    val fPlan = Filter(LessThanOrEqual(lo, hi), boundSide)
    // Sequence is TimeZoneAwareExpression: without a zone it reports
    // unresolved and the optimizer's plan validator rejects the batch
    val seq = new Sequence(bucketOf(lo), bucketOf(hi), None)
      .withTimeZone(conf.sessionLocalTimeZone)
    val gen = Explode(seq)
    val genOut = AttributeReference("_graft_range_bucket",
      LongType, nullable = false)()
    val gPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(genOut), child = fPlan)
    val eq = EqualTo(pBucket.toAttribute, genOut)
    val (nl, nr) = if (pointIsLeft) (pPlan, gPlan) else (gPlan, pPlan)
    // keep the ORIGINAL condition beside the new equi-key: the planner
    // hash-joins on the bucket and applies the range as the exact
    // post-filter, and the final Project restores the original output
    val joined = Join(nl, nr, Inner,
      Some(And(eq, j.condition.get)), JoinHint.NONE)
    Some(Project(j.output, joined))
  }
}
