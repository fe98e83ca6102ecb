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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

object GraftFunctions {
  val descriptions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
    "graft_topk" -> (exprs => TopKByScore(exprs(0), exprs(1),
      exprs(2).eval().asInstanceOf[Int]))
  )

  /** Register the functions on a live session. */
  def registerSql(spark: SparkSession): Unit =
    descriptions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
