package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<double>` vectors — the k-means sufficient
  * statistic (per-cell Σ of member vectors). Constant-size mergeable state:
  * one `dim`-length double array per group regardless of member count, so the
  * corpus never shuffles for a centroid update — partial sums combine map-side
  * and only O(k · dim) doubles cross the exchange.
  *
  * Determinism note: over QuantizeVec'd (integer-valued) inputs every partial
  * and merged sum is exact while |Σ| < 2^53, so the result is independent of
  * partitioning and merge order — the property the engine-portable k-means
  * refinement step (Similarity.kmeansRefineStep) relies on. Over raw doubles
  * the sum is subject to fp-addition order like any distributed sum.
  *
  * Dimension is taken from the first non-null vector; a later mismatch throws
  * (a corpus with ragged embedding dims is a data error, not a mergeable
  * state). Empty group → null.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // buffer convention: Array.empty = "no vector seen yet"
  override def createAggregationBuffer(): Array[Double] = Array.empty

  private def addInto(buffer: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val acc = if (buffer.isEmpty) new Array[Double](n) else buffer
    if (acc.length != n)
      throw new IllegalStateException(
        s"vector_sum over ragged dims: ${acc.length} vs $n")
    var i = 0
    while (i < n) { if (!v.isNullAt(i)) acc(i) += v.getDouble(i); i += 1 }
    acc
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    if (buffer.length != other.length)
      throw new IllegalStateException(
        s"vector_sum merge over ragged dims: ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    var i = 0
    while (i < buffer.length) { out.writeDouble(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "vector_sum"
}

object VectorSum {
  /** Column-API entry: `VectorSum($"qv")` aggregates array<double> element-wise. */
  def apply(col: Column): Column =
    GraftSql.toColumn(
      VectorSumAgg(GraftSql.toExpression(col.cast("array<double>")))
        .toAggregateExpression())
}
