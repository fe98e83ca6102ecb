package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Explicit runtime-filter (semi-join reduction) support: build a
  * Bloom filter over the small side's join keys, push a
  * might-contain predicate into the big side's SCAN, then run the
  * exact join on the survivors. False positives only cost extra rows
  * into the exact join — the OUTPUT is exactly the plain join's, which
  * is what lets the operator hash-match an ordinary join oracle.
  *
  * This is the pattern Spark's own runtime row-group filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies
  * opportunistically, surfaced as a first-class operator so a 100 TB
  * fact scan can be pruned BEFORE the shuffle regardless of what the
  * optimizer infers: at 1000 executors the bloom bytes ship once per
  * executor as a codegen reference object, and each task drops
  * non-joining rows at scan time instead of shuffling them.
  */
object Bloom {

  /** Hard cap on filter size: 2^27 bits = 16 MiB. Past the optimal
    * size for the requested fpp, the filter saturates and the false-
    * positive rate degrades GRACEFULLY (more rows reach the exact
    * join) — correctness never depends on the cap. */
  val MaxBits: Long = 1L << 27

  /** Build a Bloom filter over `build`'s long key column. The build
    * side is small by contract (the dimension side of the join); the
    * driver holds only the fixed-size filter, never the rows. One
    * bounded Spark job (the sketch aggregation). */
  def buildLongKeyFilter(build: DataFrame, keyCol: String,
                         expectedItems: Long,
                         fpp: Double = 0.01): BloomFilter = {
    val n = math.max(expectedItems, 1L)
    // standard optimal sizing m = -n ln p / (ln 2)^2, computed
    // arithmetically so a huge n clamps instead of failing allocation
    val optimal = math.ceil(
      -n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    build.stat.bloomFilter(keyCol, n,
      math.max(64L, math.min(optimal, MaxBits)))
  }

  /** The probe predicate: true iff `key` MIGHT be in the filter. */
  def mightContain(filter: BloomFilter, key: Column): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      filter.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      LongBloomMightContain(GraftColumnBridge.expression(key), bytes))
  }
}

/** `bloom.mightContainLong(child)` as a codegen'd predicate. The
  * filter deserializes ONCE per executor (lazy, from the serialized
  * bytes carried by the expression) and is referenced from generated
  * code as a constant — the probe stays inside whole-stage codegen.
  */
case class LongBloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain probes LONG keys, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
