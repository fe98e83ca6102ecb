package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions.
  *
  * Deployment path: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the functions in every session at startup.
  * [[GraftFunctions.registerSql]] does the same on an already-running
  * session (used by specs and notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    // naive BETWEEN joins (BNLJ in stock Spark) -> bucketed equi-join
    e.injectOptimizerRule(_ => graft.plans.AutoRangeJoin)
  }
}

object GraftFunctions {

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$name expects $n arguments, got ${exprs.length}"))

  /** The k argument must be a foldable INT/BIGINT literal in Int range
    * (a bounded heap cannot be sized per-row). */
  private def literalK(exprs: Seq[Expression]): Int = {
    val e = exprs(2)
    def bad(msg: String) = throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"graft_topk k argument: $msg"))
    if (!e.foldable) bad("must be a literal, got a non-foldable expression")
    e.eval() match {
      case i: java.lang.Integer =>
        if (i < 1) bad(s"out of range: $i")
        i.intValue()
      case l: java.lang.Long =>
        if (l < 1L || l > Int.MaxValue) bad(s"out of range: $l")
        l.intValue()
      case null => bad("must not be NULL")
      case other => bad(s"must be INT or BIGINT, got $other")
    }
  }

  /** Evaluate a foldable INT literal argument (window sizes, shingle
    * widths) with a clear error otherwise. */
  private def literalInt(name: String, e: Expression): Int = {
    def bad(msg: String) = throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"$name: $msg"))
    if (!e.foldable) bad("argument must be a literal")
    e.eval() match {
      case i: java.lang.Integer =>
        if (i < 1) bad(s"out of range: $i")
        i.intValue()
      case l: java.lang.Long =>
        if (l < 1L || l > Int.MaxValue) bad(s"out of range: $l")
        l.intValue()
      case other => bad(s"must be INT, got $other")
    }
  }

  val descriptions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => { arity("graft_dot", exprs, 2)
      DotProduct(exprs(0), exprs(1)) }),
    "graft_simhash64" -> (exprs => { arity("graft_simhash64", exprs, 1)
      SimHash64(exprs.head) }),
    "graft_topk" -> (exprs => { arity("graft_topk", exprs, 3)
      TopKByScore(exprs(0), exprs(1), literalK(exprs)) }),
    "graft_shingle_hex60" -> (exprs => {
      arity("graft_shingle_hex60", exprs, 2)
      ShingleHex60(exprs(0),
        literalInt("graft_shingle_hex60 n", exprs(1))) }),
    "graft_rolling_minhash" -> (exprs => {
      arity("graft_rolling_minhash", exprs, 2)
      RollingMinHash(exprs(0),
        literalInt("graft_rolling_minhash window", exprs(1)),
        graft.ext.TextOps.RollBase, graft.ext.TextOps.RollMod) })
  )

  /** Register the functions on a live session. */
  def registerSql(spark: SparkSession): Unit =
    descriptions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
