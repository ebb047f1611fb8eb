package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup family's hot path.
  *
  * The HOF formulation (`sequence` + `transform` + `array_distinct`, then an
  * `aggregate`/`zip_with` fold for MinHash) is CodegenFallback: ONE such
  * expression anywhere in a projection knocks the whole operator out of
  * whole-stage codegen into interpreted eval (~30× slower, measured in
  * round 1). These expressions compute the identical results inside codegen
  * via tight JVM loops, so the surrounding scan → project → explode pipeline
  * stays fused.
  *
  * Semantics are bit-identical to the Column versions (and to the DuckDB
  * oracle SQL): shingle s_i = t_i·2^24 + t_{i+1}·2^12 + t_{i+2} over longs,
  * distinct with FIRST-occurrence order, null token → null shingle element;
  * minhash_j = min over shingles of (a_j·(s mod P) + b_j) mod P with null
  * shingles skipped, P = 2^31 − 1.
  */
object ShingleUtil {
  val P: Long = 2147483647L

  /** Distinct 3-gram shingles of an int-token array, first-occurrence order. */
  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](n - 2)
    val seen = new java.util.HashSet[Long]()
    var seenNull = false
    var i = 0
    while (i < n - 2) {
      if (tokens.isNullAt(i) || tokens.isNullAt(i + 1) || tokens.isNullAt(i + 2)) {
        if (!seenNull) { out += null; seenNull = true }
      } else {
        val s = tokens.getInt(i).toLong * 16777216L +
          tokens.getInt(i + 1).toLong * 4096L + tokens.getInt(i + 2).toLong
        if (seen.add(s)) out += s
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 32-bit SimHash over an int-token array: bit b of the signature is the
    * sign of Σ_tokens (bit b of h(t) ? +1 : −1), h(t) = (a·t + b) mod P.
    * Null tokens hash to a null contribution — skipped, like the HOF fold
    * (which would null-poison; callers filter null tokens upstream, and the
    * canonical token arrays are non-null by construction). */
  def simhash32(tokens: ArrayData, a: Long, b: Long): Long = {
    val counts = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = (tokens.getInt(i).toLong * a + b) % P
        var bit = 0
        while (bit < 32) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 32) { if (counts(bit) > 0) sig |= (1L << bit); bit += 1 }
    sig
  }

  /** Ordered co-occurrence pairs from a sorted (id, n) posting list; the
    * element types ride along so any id type works. */
  def postingPairs(ids: ArrayData, idT: DataType, nT: DataType): ArrayData = {
    val n = ids.numElements()
    // n·(n−1)/2 as Int overflows (→ negative array size) past 65535 elements;
    // callers cap posting lists well below this, but a raised maxBucket /
    // maxDocFreq must fail with an actionable message, not a crash
    require(n <= 65535,
      s"posting list of $n elements would emit ${n.toLong * (n - 1) / 2} pairs; " +
        "cap the bucket (maxBucket/maxDocFreq <= 65535) before pair generation")
    val out = new Array[Any](n * (n - 1) / 2)
    var w = 0
    var i = 0
    while (i < n) {
      val a = ids.getStruct(i, 2)
      val aId = a.get(0, idT); val aN = a.get(1, nT)
      var j = i + 1
      while (j < n) {
        val b = ids.getStruct(j, 2)
        out(w) = org.apache.spark.sql.catalyst.InternalRow(
          aId, aN, b.get(0, idT), b.get(1, nT))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** K running minima of (a_j·(s mod P) + b_j) mod P over the shingle array;
    * null shingle elements are skipped (parity with `least` null handling). */
  def minhash(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val acc = Array.fill(k)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getLong(i)
        val sm = ((s % P) + P) % P
        var j = 0
        while (j < k) {
          val h = (sm * a(j) + b(j)) % P
          if (h < acc(j)) acc(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc.map(x => x: Any))
  }
}

/** `array<int>` tokens → `array<long>` distinct 3-gram shingles (codegen'd). */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles3(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.shingles3($c)")
  override protected def withNewChildInternal(c: Expression): Shingles3 = copy(child = c)
}

/** `array<long>` shingles → `array<long>` K-wide MinHash signature (codegen'd).
  * Coefficients ride along as reference objects, not per-row literals. */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length, "coefficient arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.minhash(v.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhCoeffA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhCoeffB", b, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.minhash($c, $aRef, $bRef)")
  }
  // Array fields compare by reference under case-class equality; compare by
  // content so structurally identical signatures unify (CSE, canonicalization)
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSignature =>
      m.child == child && java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(a)) + java.util.Arrays.hashCode(b)
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** `array<struct<id,n>>` posting list → `array<struct<id_a,n_a,id_b,n_b>>`
  * of ordered co-occurrence pairs (i < j over the sorted list) — codegen'd.
  * The nested transform/flatten HOF formulation ran interpreted. */
case class PostingPairs(child: Expression) extends UnaryExpression {
  private def elemStruct: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def idT: DataType = elemStruct(0).dataType
  private def nT: DataType = elemStruct(1).dataType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", idT), StructField("n_a", nT),
    StructField("id_b", idT), StructField("n_b", nT))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.postingPairs(v.asInstanceOf[ArrayData], idT, nT)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idRef = ctx.addReferenceObj("ppIdType", idT, "org.apache.spark.sql.types.DataType")
    val nRef = ctx.addReferenceObj("ppNType", nT, "org.apache.spark.sql.types.DataType")
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.postingPairs($c, $idRef, $nRef)")
  }
  override protected def withNewChildInternal(c: Expression): PostingPairs = copy(child = c)
}

/** `array<int>` tokens → 32-bit SimHash signature as bigint (codegen'd). */
case class SimHash32(child: Expression, a: Long, b: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.simhash32(v.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleUtil.simhash32($c, ${a}L, ${b}L)")
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
}

object ShingleExprs {
  def shingles3(tokens: Column): Column =
    GraftSql.toColumn(Shingles3(GraftSql.toExpression(tokens)))
  def simhash32(tokens: Column, a: Long, b: Long): Column =
    GraftSql.toColumn(SimHash32(GraftSql.toExpression(tokens), a, b))
  def postingPairs(postings: Column): Column =
    GraftSql.toColumn(PostingPairs(GraftSql.toExpression(postings)))
  def minhashSignature(shingles: Column, coeffs: Seq[(Long, Long)]): Column =
    GraftSql.toColumn(MinHashSignature(GraftSql.toExpression(shingles),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray))
}
