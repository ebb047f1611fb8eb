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
