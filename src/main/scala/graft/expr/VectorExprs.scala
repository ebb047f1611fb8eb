package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector primitives for the similarity/ANN family. The HOF forms
  * (`zip_with` + `aggregate`) are CodegenFallback and re-enter the
  * interpreter per element; these run as tight JVM loops inside whole-stage
  * codegen. Numerics match the HOF forms exactly: sequential left-to-right
  * double accumulation, null element or length mismatch → null result
  * (`zip_with` pads with null, null poisons the fold). */
object VectorUtil {
  /** Dot product of two double arrays; null on length mismatch / null elems. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** All ordered in-bucket pairs meeting the cosine threshold; see
    * CosinePairs. Elements: struct(id, v: array<double>, n: double). */
  def cosinePairs(items: ArrayData, idT: DataType,
                  minCosine: Double): ArrayData = {
    val m = items.numElements()
    val ids = new Array[Any](m)
    val vecs = new Array[ArrayData](m)
    val norms = new Array[Double](m)
    var i = 0
    while (i < m) {
      val s = items.getStruct(i, 3)
      ids(i) = s.get(0, idT)
      vecs(i) = s.getArray(1)
      norms(i) = s.getDouble(2)
      i += 1
    }
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(idT)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val d = dot(vecs(i), vecs(j))
        if (d != null) {
          val c = d.doubleValue() / (norms(i) * norms(j))
          if (c >= minCosine) {
            val (a, b) = if (ord.lt(ids(i), ids(j))) (ids(i), ids(j)) else (ids(j), ids(i))
            out += org.apache.spark.sql.catalyst.InternalRow(a, b, c)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Grid quantization: round(x·scale) half-away-from-zero per component.
    * Null element → null vector (see QuantizeVec). */
  def quantize(v: ArrayData, scale: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i) * scale
      out(i) = if (x >= 0) Math.floor(x + 0.5) else Math.ceil(x - 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Argmin cell by squared L2 against k flattened centroids; ties to the
    * smaller cell id; null elems / dim mismatch → null (see NearestCell). */
  def nearestCell(v: ArrayData, cents: Array[Double], k: Int): java.lang.Integer = {
    val dim = cents.length / k
    val n = v.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < k) {
      var acc = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) {
        val diff = v.getDouble(d) - cents(off + d)
        acc += diff * diff
        d += 1
      }
      if (acc < bestDist) { bestDist = acc; best = c }
      c += 1
    }
    best
  }

  /** Sign-LSH bucket id over `numPlanes` hyperplanes (flattened row-major):
    * bit i set iff dot(v, plane_i) > 0. A null/short vector sets no bit for
    * that plane (null projection compares false), same as the Column form. */
  def lshBucket(v: ArrayData, planes: Array[Double], numPlanes: Int): Long = {
    val dim = planes.length / numPlanes
    val n = v.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var d = 0
      val off = p * dim
      while (d < dim) { acc += v.getDouble(d) * planes(off + d); d += 1 }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Bucket-local near-dup verification: input `array<struct<id, v:array<double>,
  * n:double>>` (one LSH bucket's members), output
  * `array<struct<id_a, id_b, cosine:double>>` — every ordered pair whose
  * cosine (dot/(n_a·n_b)) meets the threshold. All O(B²) dot products run
  * INSIDE this codegen'd expression on co-located data; only survivors are
  * ever emitted, so nothing but (id, id, cosine) survivors reach a shuffle —
  * no candidate-pair materialization, no vector join-back. */
case class CosinePairs(child: Expression, minCosine: Double) extends UnaryExpression {
  private def elemStruct: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def idT: DataType = elemStruct(0).dataType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", idT), StructField("id_b", idT),
    StructField("cosine", DoubleType))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.cosinePairs(v.asInstanceOf[ArrayData], idT, minCosine)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idRef = ctx.addReferenceObj("cpIdType", idT, "org.apache.spark.sql.types.DataType")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.VectorUtil.cosinePairs($c, $idRef, $minCosine)")
  }
  override protected def withNewChildInternal(c: Expression): CosinePairs = copy(child = c)
}

/** `array<double> × array<double> → double` dot product (codegen'd). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""java.lang.Double $tmp = graft.expr.VectorUtil.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `array<double> → bigint` sign-LSH bucket id (codegen'd); the plane matrix
  * rides along as a reference object, not per-row literals. */
case class SignLshBucket(child: Expression, planes: Array[Double], numPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.lshBucket(v.asInstanceOf[ArrayData], planes, numPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorUtil.lshBucket($c, $pRef, $numPlanes)")
  }
  override def equals(o: Any): Boolean = o match {
    case s: SignLshBucket => s.child == child && s.numPlanes == numPlanes &&
      java.util.Arrays.equals(s.planes, planes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(planes)) + numPlanes
  override protected def withNewChildInternal(c: Expression): SignLshBucket = copy(child = c)
}

/** `array<float|double> → array<double>` grid quantization: each component
  * becomes round(x·scale) — an INTEGER-valued double (exact in IEEE754 while
  * |x·scale| < 2^53), so every downstream distance / sum over quantized
  * vectors is exact integer arithmetic: deterministic across partitioning,
  * aggregation order, and engines (the DuckDB oracle replays it bit-for-bit).
  * Rounding is half-away-from-zero, matching Spark's `round` and DuckDB's
  * `round`. Null elements poison the vector to null. */
case class QuantizeVec(child: Expression, scale: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // may return null for a NON-null child (null element): without this
  // override codegen folds ev.isNull to the constant "false" and the
  // generated assignment fails to compile (silent interpreter fallback)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.quantize(v.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("qvRes")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.expr.VectorUtil.quantize($c, $scale);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): QuantizeVec = copy(child = c)
}

/** `array<double> → int` nearest-centroid cell id: argmin over the k flattened
  * centroids of the squared L2 distance, ties to the smallest cell id. Over
  * quantized (integer-valued) inputs the distances are exact, so the argmin is
  * deterministic and engine-portable. The centroid matrix rides along as one
  * reference object (k·dim doubles), not per-row literals — one codegen'd
  * projection assigns the whole corpus, nothing shuffles. Null / dim-mismatch
  * vectors → null. */
case class NearestCell(child: Expression, centsFlat: Array[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // null on dim mismatch / null elems
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.nearestCell(v.asInstanceOf[ArrayData], centsFlat, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("kmCents", centsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cellRes")
      s"""java.lang.Integer $tmp = graft.expr.VectorUtil.nearestCell($c, $cRef, $k);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  }
  override def equals(o: Any): Boolean = o match {
    case s: NearestCell => s.child == child && s.k == k &&
      java.util.Arrays.equals(s.centsFlat, centsFlat)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(centsFlat)) + k
  override protected def withNewChildInternal(c: Expression): NearestCell = copy(child = c)
}

object VectorExprs {
  private def asDoubleArray(c: Column): Column = c.cast("array<double>")
  def dot(a: Column, b: Column): Column =
    GraftSql.toColumn(DotProduct(GraftSql.toExpression(asDoubleArray(a)),
      GraftSql.toExpression(asDoubleArray(b))))
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    GraftSql.toColumn(SignLshBucket(GraftSql.toExpression(asDoubleArray(v)),
      planes.flatten, planes.length))
  def cosinePairs(items: Column, minCosine: Double): Column =
    GraftSql.toColumn(CosinePairs(GraftSql.toExpression(items), minCosine))
  def quantize(v: Column, scale: Double): Column =
    GraftSql.toColumn(QuantizeVec(GraftSql.toExpression(asDoubleArray(v)), scale))
  def nearestCell(qv: Column, cents: Array[Array[Double]]): Column =
    GraftSql.toColumn(NearestCell(GraftSql.toExpression(qv), cents.flatten, cents.length))
}
