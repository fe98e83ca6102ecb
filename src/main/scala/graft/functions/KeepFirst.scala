package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructType}

/** Mutable keep-first state: ONE UnsafeRow `[order, payload]` holding
  * the best row seen, deep-copied out of the (reused) input buffers.
  * A GenericInternalRow copy would be SHALLOW — its UTF8Strings keep
  * pointing into the iterator's reused row buffer and silently corrupt
  * — so the state is always a self-contained UnsafeRow byte image.
  * Empty (null) until the first update. */
final class KeepFirstBuffer {
  var row: UnsafeRow = null
}

/** Keep-first-by-order as a TypedImperativeAggregate: per group, the
  * payload struct of the row with the LEAST order struct (fields
  * ascending, NULLS FIRST — identical to `min_by(payload,
  * struct(order))`).
  *
  * Why not `min_by`: min_by is a DeclarativeAggregate whose buffer
  * holds the struct extremum, a type UnsafeRow cannot mutate in place —
  * so Spark plans it as a SortAggregate, sorting EVERY row by the
  * grouping key on both sides of the exchange. A typed-imperative
  * formulation is ObjectHashAggregate-eligible: groups hash-combine
  * map-side and nothing is ever sorted, which measured ~2x faster on
  * the dedup-heavy clean stage and removes the per-partition sorts
  * that dominate at 100 TB. Pair with
  * [[Tuning.sizeObjectHashAggregate]] — the engine-level default
  * fallback threshold (128 in-memory groups) would demote the hash map
  * to sort-based merging almost immediately.
  *
  * Tie and NULL semantics: a strictly-smaller order replaces the
  * current best, so ties keep the first-encountered row (same
  * task-order determinism class as min_by; callers needing total
  * determinism pass a total order). A NULL order value is skipped like
  * min_by's null ordering; the usual struct wrap makes the top level
  * non-null.
  */
case class KeepFirstByOrder(
    order: Expression, payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeepFirstBuffer] {

  private def orderType = order.dataType.asInstanceOf[StructType]
  private def payloadType = payload.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(order, payload)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(order.dataType)
  @transient private lazy val pairProj =
    UnsafeProjection.create(Array[DataType](order.dataType, payload.dataType))
  @transient private lazy val pairHolder = new Array[Any](2)

  override def createAggregationBuffer(): KeepFirstBuffer = new KeepFirstBuffer

  override def update(buf: KeepFirstBuffer, input: InternalRow): KeepFirstBuffer = {
    val o = order.eval(input).asInstanceOf[InternalRow]
    if (o != null &&
        (buf.row == null ||
          ordering.compare(o, buf.row.getStruct(0, orderType.size)) < 0)) {
      pairHolder(0) = o
      pairHolder(1) = payload.eval(input)
      // the projection's output row is reused — copy() owns the bytes
      buf.row = pairProj(new GenericInternalRow(pairHolder)).copy()
    }
    buf
  }

  override def merge(buf: KeepFirstBuffer, other: KeepFirstBuffer): KeepFirstBuffer = {
    if (other.row != null &&
        (buf.row == null ||
          ordering.compare(other.row.getStruct(0, orderType.size),
            buf.row.getStruct(0, orderType.size)) < 0)) {
      buf.row = other.row
    }
    buf
  }

  override def eval(buf: KeepFirstBuffer): Any =
    if (buf.row == null) null else buf.row.getStruct(1, payloadType.size)

  override def serialize(buf: KeepFirstBuffer): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): KeepFirstBuffer = {
    val buf = new KeepFirstBuffer
    if (bytes.nonEmpty) {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      buf.row = row
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KeepFirstByOrder =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KeepFirstByOrder =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(order = newChildren(0), payload = newChildren(1))
}

object KeepFirst {
  import org.apache.spark.sql.GraftColumnBridge

  /** Aggregate Column: payload struct of the row with the least order
    * struct. Both arguments must be struct-typed (wrap scalars with
    * `struct(...)`). */
  def keepFirst(order: Column, payload: Column): Column =
    GraftColumnBridge.column(
      KeepFirstByOrder(GraftColumnBridge.expression(order),
        GraftColumnBridge.expression(payload)).toAggregateExpression())
}

/** Session tuning the engine's hash-heavy aggregates depend on. */
object Tuning {

  /** Per-task budget for an ObjectHashAggregate's in-memory group map:
    * threshold (groups) x state width must stay well inside executor
    * task memory no matter the row width. */
  private val MapBytesPerTask = 64L << 20

  /** ObjectHashAggregate's sort-based fallback triggers at
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * IN-MEMORY GROUPS — default 128, sized for aggregates whose
    * per-group state is huge (collect_list). [[KeepFirstByOrder]]'s
    * state is one row copy, so 128 would demote virtually every real
    * dedup to the sort path it exists to avoid. Raise the default to
    * `64 MB / stateWidthBytes` groups (clamped to [8k, 4M]) so the
    * per-task map is bounded by construction — a 16-byte key dedup
    * gets millions of in-memory groups, a 4 KB document row only
    * ~16k, and past the threshold the aggregate degrades to
    * sort-based merging instead of OOMing.
    *
    * CAVEATS (deliberate, documented): the conf is SESSION-GLOBAL —
    * Spark has no per-query scope for it, and the caller's action
    * runs after this returns, so set-run-restore cannot bracket it.
    * Unrelated ObjectHashAggregates in the same session (e.g.
    * collect_list with large per-group state) inherit the raised
    * threshold; sessions mixing those with dedup should set the conf
    * explicitly — any non-default value is respected, and the FIRST
    * dedup's width estimate wins otherwise. `stateWidthBytes` comes
    * from Catalyst `defaultSize` (strings count 20 bytes), an
    * underestimate for long-text payloads — the clamp floor keeps
    * even a 100x underestimate inside task memory. */
  def sizeObjectHashAggregate(
      spark: org.apache.spark.sql.SparkSession,
      stateWidthBytes: Long): Unit = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.get(key, "128") == "128") {
      val t = math.max(1L << 13, math.min(1L << 22,
        MapBytesPerTask / math.max(stateWidthBytes, 1L)))
      spark.conf.set(key, t.toString)
    }
  }
}
