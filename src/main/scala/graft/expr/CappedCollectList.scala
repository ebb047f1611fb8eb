package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a HARD per-group size bound: accumulation stops at
  * `cap + 1` elements, so a group's aggregation buffer never holds more than
  * `cap + 1` values no matter how many rows feed it.
  *
  * This is the memory-shape guard for the banded dedup/LSH operators: they
  * drop buckets whose posting list exceeds `maxBucket` ANYWAY (a hot bucket is
  * O(B²) mostly-dissimilar pair work — the classic web-scale LSH blowup), but
  * a plain `collect_list` would still MATERIALIZE a multi-million-element
  * array for a degenerate bucket (a stop-shingle, near-zero vectors all
  * hashing to bucket 0) before the size filter discards it — an executor OOM
  * at 100× scale. With the cap inside the aggregate, an over-cap bucket costs
  * `cap + 1` slots and is then recognizably over-cap (`size > cap`) to the
  * downstream filter.
  *
  * Semantics: for groups with ≤ cap elements the result is exactly
  * `collect_list` (all elements, arrival order — callers `sort_array` for
  * determinism). For larger groups the result is SOME cap+1 elements — callers
  * must filter `size(...) <= cap` and discard those groups, which is the only
  * supported use. */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] {

  require(cap >= 1 && cap <= 65535,
    s"cap must be in [1, 65535] (posting-pair generation bounds), got $cap")

  override lazy val bufferElementType: DataType = child.dataType
  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "capped_collect_list"
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

object CappedCollectList {
  /** Column-API entry: `cappedCollectList(struct($"id", $"n"), maxBucket)`. */
  def apply(c: Column, cap: Int): Column =
    GraftSql.toColumn(
      CappedCollectList(GraftSql.toExpression(c), cap).toAggregateExpression())
}

/** `collect_set` with a HARD per-group size bound — a bounded-state EXACT
  * "distinct-if-small" sketch. Accumulation stops once the set holds `cap + 1`
  * DISTINCT values, so the aggregation buffer is O(cap) regardless of group
  * size or cardinality.
  *
  * Exactness argument: if the group's true distinct count is ≤ cap, no partial
  * buffer can ever exceed cap elements (each holds a subset of the true
  * distinct set), so no update/merge ever short-circuits and the union is the
  * exact distinct set. If the true count is > cap, at least one buffer reaches
  * cap + 1 and the final result has > cap elements — recognizably over-cap to
  * the caller, which must treat it as "too many to enumerate" (this is the
  * only supported use of an over-cap result; WHICH cap+1 values survive is
  * arrival-order-dependent).
  *
  * This powers enum inference in `SchemaInference`: a low-cardinality column
  * yields its exact value domain in ONE scan with constant memory, while a
  * high-cardinality column (doc ids, free text) costs cap+1 slots instead of
  * an unbounded `collect_set` buffer — the same memory-shape discipline as
  * [[CappedCollectList]] for LSH posting lists. */
case class CappedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]] {

  require(cap >= 1 && cap <= 65535, s"cap must be in [1, 65535], got $cap")

  override lazy val bufferElementType: DataType = child.dataType
  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override def update(buffer: mutable.HashSet[Any],
                      input: InternalRow): mutable.HashSet[Any] =
    if (buffer.size > cap) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.HashSet[Any],
                     other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (buffer.size <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "capped_collect_set"
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

object CappedCollectSet {
  /** Column-API entry: result order is undefined — `sort_array` for
    * determinism; results with `size > cap` mean "over cap", discard them. */
  def apply(c: Column, cap: Int): Column =
    GraftSql.toColumn(
      CappedCollectSet(GraftSql.toExpression(c), cap).toAggregateExpression())
}
