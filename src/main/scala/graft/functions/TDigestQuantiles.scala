package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles
  * Using t-Digests") — the quantile sketch the north star names for `n_tok`.
  * Constant-size mergeable state: ≤ O(compression) centroids regardless of
  * input size, so a 10^12-row aggregation carries kilobytes per group between
  * partial and final aggregation.
  *
  * The reference has no quantile machinery at all (SURVEY §2.6) — this is a
  * dataset-scope generalization; accuracy is pinned against exact quantiles in
  * TDigestSpec rather than against the reference.
  */
final class TDigest(val compression: Double) extends Serializable {

  // merged, sorted centroids
  private[functions] var means = new ArrayBuffer[Double]()
  private[functions] var weights = new ArrayBuffer[Double]()
  // unmerged incoming points (flushed on overflow / eval / serialize)
  private val pending = new ArrayBuffer[Double]()
  private var pendingLimit = 512

  def add(x: Double): Unit = {
    if (!x.isNaN) {
      pending += x
      if (pending.length >= pendingLimit) flush()
    }
  }

  def merge(other: TDigest): Unit = {
    other.flush()
    var i = 0
    while (i < other.means.length) {
      mergeInto(other.means(i), other.weights(i)); i += 1
    }
    flush()
  }

  private def mergeInto(mean: Double, weight: Double): Unit = {
    // queue as a weighted pseudo-point; compress handles weights uniformly
    flushIfNeededFor(1)
    queuedMeans += mean; queuedWeights += weight
  }

  // weighted queue for merge() input (distinct from unit-weight `pending`)
  private val queuedMeans = new ArrayBuffer[Double]()
  private val queuedWeights = new ArrayBuffer[Double]()
  private def flushIfNeededFor(n: Int): Unit =
    if (queuedMeans.length + n >= pendingLimit) flush()

  def flush(): Unit = {
    if (pending.isEmpty && queuedMeans.isEmpty) return
    val allM = new ArrayBuffer[Double](means.length + pending.length + queuedMeans.length)
    val allW = new ArrayBuffer[Double](allM.length)
    allM ++= means; allW ++= weights
    pending.foreach { x => allM += x; allW += 1.0 }
    allM ++= queuedMeans; allW ++= queuedWeights
    pending.clear(); queuedMeans.clear(); queuedWeights.clear()

    val idx = allM.indices.sortBy(allM(_))
    val total = allW.sum
    val outM = new ArrayBuffer[Double](); val outW = new ArrayBuffer[Double]()
    var curM = allM(idx.head); var curW = allW(idx.head)
    var wSoFar = 0.0
    idx.tail.foreach { j =>
      val m = allM(j); val w = allW(j)
      val q = (wSoFar + (curW + w) / 2) / total
      val limit = 4.0 * total * q * (1.0 - q) / compression
      if (curW + w <= math.max(limit, 1.0)) {
        // weighted-average merge into the current centroid
        curM = (curM * curW + m * w) / (curW + w); curW += w
      } else {
        outM += curM; outW += curW; wSoFar += curW
        curM = m; curW = w
      }
    }
    outM += curM; outW += curW
    means = outM; weights = outW
  }

  def totalWeight: Double = { flush(); weights.sum }

  /** Interpolated quantile over centroid midpoints. */
  def quantile(p: Double): Double = {
    flush()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means.head
    val total = weights.sum
    val t = p * total
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = means.head
    while (i < means.length) {
      val mid = cum + weights(i) / 2
      if (t < mid) {
        if (i == 0) return means.head
        val frac = (t - prevMid) / (mid - prevMid)
        return prevMean + frac * (means(i) - prevMean)
      }
      prevMid = mid; prevMean = means(i); cum += weights(i); i += 1
    }
    means.last
  }

  def serialize(): Array[Byte] = {
    flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeInt(means.length)
    var i = 0
    while (i < means.length) { out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1 }
    out.flush(); bos.toByteArray
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readDouble())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val m = in.readDouble(); val w = in.readDouble()
      d.means += m; d.weights += w; i += 1
    }
    d
  }
}

/** `tdigest_quantiles(col, probs...)` — a native Catalyst
  * `TypedImperativeAggregate` (SURVEY §7.3: the one custom physical piece the
  * engine needs beyond built-ins). Partial aggregation ships the serialized
  * digest, so the shuffle carries O(compression) bytes per group. */
case class TDigestQuantileAgg(
    child: Expression,
    probabilities: Seq[Double],
    compression: Double = 100.0,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case LongType => v.asInstanceOf[Long].toDouble
      case ShortType => v.asInstanceOf[Short].toDouble
      case ByteType => v.asInstanceOf[Byte].toDouble
      case dt => throw new IllegalStateException(s"tdigest over non-numeric $dt")
    })
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0) null
    else new GenericArrayData(probabilities.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_quantiles"
}

object TDigestQuantiles {
  /** Column-API entry: `tdigestQuantiles($"n_tok", Seq(0.5, 0.95, 0.99))`. */
  def apply(col: Column, probs: Seq[Double], compression: Double = 100.0): Column =
    GraftSql.toColumn(
      TDigestQuantileAgg(GraftSql.toExpression(col), probs, compression)
        .toAggregateExpression())
}

/** `tdigest_sketch(col)` — same aggregation as [[TDigestQuantileAgg]] but the
  * RESULT is the serialized digest itself (BinaryType). This is what makes
  * per-partition quantile state mergeable ACROSS runs: an incremental
  * revalidation persists each partition's digest in the state table and later
  * merges it with the delta's digest ([[TDigestMergeBytes]]) instead of
  * rescanning 100 TB of already-validated rows. */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double = 100.0,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case LongType => v.asInstanceOf[Long].toDouble
      case ShortType => v.asInstanceOf[Short].toDouble
      case ByteType => v.asInstanceOf[Byte].toDouble
      case dt => throw new IllegalStateException(s"tdigest over non-numeric $dt")
    })
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  // an empty digest still serializes (0 centroids) — callers distinguish
  // "no rows" by row_count, not by a null sketch
  override def eval(buffer: TDigest): Any = buffer.serialize()

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_sketch"
}

object TDigestSketch {
  def apply(col: Column, compression: Double = 100.0): Column =
    GraftSql.toColumn(
      TDigestSketchAgg(GraftSql.toExpression(col), compression)
        .toAggregateExpression())
}

/** `tdigest_merge(sketchCol)` — aggregate MERGE of serialized digests
  * (BinaryType in, BinaryType out). This is the cross-run combine of the
  * incremental path: per-run per-partition digests from the state table fold
  * into one digest per partition without touching any raw row. */
case class TDigestMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def createAggregationBuffer(): TDigest = new TDigest(100.0)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.merge(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TDigest): Any = buffer.serialize()
  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_merge"
}

object TDigestMerge {
  def apply(col: Column): Column =
    GraftSql.toColumn(
      TDigestMergeAgg(GraftSql.toExpression(col)).toAggregateExpression())
}

/** Scalar helpers over serialized digests. Used on MANIFEST-sized tables
  * (one row per partition), so interpreted evaluation is irrelevant to the
  * 100 TB path — the heavy lifting happened inside the sketch aggregates. */
object TDigestBytes {
  /** Merge two serialized digests (either side null → the other). */
  val merge2: (Array[Byte], Array[Byte]) => Array[Byte] = (a, b) =>
    if (a == null) b
    else if (b == null) a
    else {
      val d = TDigest.deserialize(a)
      d.merge(TDigest.deserialize(b))
      d.serialize()
    }

  /** Quantile of a serialized digest (null/empty digest → null). */
  def quantile(bytes: Array[Byte], p: Double): java.lang.Double =
    if (bytes == null) null
    else {
      val d = TDigest.deserialize(bytes)
      if (d.totalWeight == 0) null else java.lang.Double.valueOf(d.quantile(p))
    }
}
