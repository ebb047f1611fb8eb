package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Misra–Gries frequent-items summary (a.k.a. MG(k); mergeable per Agarwal
  * et al., "Mergeable Summaries", PODS 2012). O(k) state regardless of input
  * size or domain cardinality — the sketch that makes heavy-key (skew)
  * detection possible over a 10^12-row column whose domain is too large for
  * a full groupBy's partial-aggregation hash maps (URLs, doc ids, shingles).
  *
  * Guarantees, with n = total weight seen and D = total decrement offset:
  *   - for every tracked item: counter ≤ true_count ≤ counter + D
  *   - D ≤ n / (k + 1), so every item with true_count > n/(k+1) IS tracked
  *     (no false negatives above that threshold).
  * The reference has no dataset-scope machinery (SURVEY §2.6); this is the
  * skew-diagnosis generalization the north rule's "skew handled explicitly"
  * requires: find the heavy keys first, then salt exactly those.
  */
final class MGSummary(val k: Int) extends Serializable {
  private[functions] val counters = new mutable.HashMap[String, Long]()
  private[functions] var decrements: Long = 0L

  def add(item: String, weight: Long = 1L): Unit = {
    counters.get(item) match {
      case Some(c) => counters.update(item, c + weight)
      case None if counters.size < k => counters.update(item, weight)
      case None =>
        // decrement-all by the incoming weight (capped at the current
        // minimum so no counter goes negative in the weighted case)
        val dec = math.min(weight, counters.valuesIterator.min)
        decrements += dec
        val dead = mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - dec)
        counters.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(counters.remove)
        if (weight > dec) add(item, weight - dec)
    }
  }

  /** Mergeable-summaries combine: add counters, then trim back to k by
    * subtracting the (k+1)-largest value (counts that offset in D). */
  def merge(other: MGSummary): Unit = {
    decrements += other.decrements
    other.counters.foreach { case (item, c) =>
      counters.update(item, counters.getOrElse(item, 0L) + c)
    }
    if (counters.size > k) {
      val vals = counters.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - k - 1) // (k+1)-th largest
      decrements += t
      val dead = mutable.ArrayBuffer.empty[String]
      counters.mapValuesInPlace((_, c) => c - t)
      counters.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(counters.remove)
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(decrements)
    out.writeInt(counters.size)
    counters.foreach { case (item, c) => out.writeUTF(item); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    s.decrements = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { val item = in.readUTF(); s.counters.update(item, in.readLong()); i += 1 }
    s
  }
}

/** `mg_frequent_items(col, k)` — native `TypedImperativeAggregate`; the
  * partial/final shuffle carries one O(k) serialized summary per group.
  * Result: map<string, struct<count_lo, count_hi>> of tracked candidates
  * (count_lo = MG counter, count_hi = counter + total decrements — the
  * deterministic bounds above). */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(k >= 1, "mg_frequent_items: k must be >= 1")

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: MGSummary, input: MGSummary): MGSummary = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: MGSummary): Any = {
    // deterministic order: count desc, item asc — so the emitted map is
    // stable across runs and partition layouts
    val entries = buffer.counters.toSeq.sortBy { case (item, c) => (-c, item) }
    val keys = new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any])
    val vals = new GenericArrayData(entries.map { case (_, c) =>
      InternalRow(c, c + buffer.decrements)
    }.toArray[Any])
    new ArrayBasedMapData(keys, vals)
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(bytes)

  override def dataType: DataType = MapType(StringType,
    StructType(Seq(StructField("count_lo", LongType, nullable = false),
      StructField("count_hi", LongType, nullable = false))), valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "mg_frequent_items"
}

object MisraGries {
  /** Column-API entry: `MisraGries($"source", 64)`. */
  def apply(col: Column, k: Int): Column =
    GraftSql.toColumn(
      MisraGriesAgg(GraftSql.toExpression(col), k).toAggregateExpression())
}
