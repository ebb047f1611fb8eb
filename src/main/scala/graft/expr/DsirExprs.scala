package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native primitives for DSIR-style importance weighting (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): documents
  * are featurized as hashed token-bigram bucket counts; the importance weight
  * is Σ over the document's bigrams of log(p̂_target(b)/q̂_raw(b)).
  *
  * Engine portability: the bucket hash is plain integer arithmetic
  * (((t_i·32768 + t_{i+1}) mod B + B) mod B) and the log-ratio table is
  * PRE-SCALED to integers (⌊10^6·Δlog + 0.5⌋) on the driver, so the per-doc
  * score is an exact integer sum — independent of partitioning and
  * aggregation order, replayed bit-for-bit by the DuckDB oracle
  * (q_dsir_weights). */
object DsirUtil {
  @inline private def bucketOf(a: Int, b: Int, buckets: Int): Int = {
    val h = (a.toLong * 32768L + b.toLong) % buckets
    (if (h < 0) h + buckets else h).toInt
  }

  /** Hashed-bigram bucket ids, one per adjacent token pair (n−1 entries; 0
    * for docs under 2 tokens). Null elements poison the array to null. */
  def bigramBuckets(tokens: ArrayData, buckets: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      if (tokens.isNullAt(i) || tokens.isNullAt(i + 1)) return null
      out(i) = bucketOf(tokens.getInt(i), tokens.getInt(i + 1), buckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ table(bucket(t_i, t_{i+1})) over the document — the scaled DSIR log
    * weight. Exact long arithmetic; <2 tokens → 0. */
  def bigramLogSum(tokens: ArrayData, table: Array[Long], buckets: Int): java.lang.Long = {
    val n = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < n - 1) {
      if (tokens.isNullAt(i) || tokens.isNullAt(i + 1)) return null
      acc += table(bucketOf(tokens.getInt(i), tokens.getInt(i + 1), buckets))
      i += 1
    }
    acc
  }
}

/** `array<int> → array<int>` hashed-bigram bucket ids (codegen'd) — the
  * featurization pass that fits the target/raw bucket distributions. */
case class BigramBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null elements poison to null
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    DsirUtil.bigramBuckets(v.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("bbRes")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.expr.DsirUtil.bigramBuckets($c, $buckets);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): BigramBuckets = copy(child = c)
}

/** `array<int> → bigint` scaled DSIR log weight (codegen'd); the integer
  * log-ratio table rides along as ONE reference object, so scoring the whole
  * corpus is a single projection — no join against the ratio table, nothing
  * shuffles. */
case class BigramLogSum(child: Expression, table: Array[Long], buckets: Int)
    extends UnaryExpression {
  require(table.length == buckets, s"table size ${table.length} != buckets $buckets")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null elements poison to null
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    DsirUtil.bigramLogSum(v.asInstanceOf[ArrayData], table, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("dsirTable", table, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("blsRes")
      s"""java.lang.Long $tmp = graft.expr.DsirUtil.bigramLogSum($c, $tRef, $buckets);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin
    })
  }
  override def equals(o: Any): Boolean = o match {
    case s: BigramLogSum => s.child == child && s.buckets == buckets &&
      java.util.Arrays.equals(s.table, table)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(table)) + buckets
  override protected def withNewChildInternal(c: Expression): BigramLogSum = copy(child = c)
}

object DsirExprs {
  def bigramBuckets(tokens: Column, buckets: Int): Column =
    GraftSql.toColumn(BigramBuckets(GraftSql.toExpression(tokens), buckets))
  def bigramLogSum(tokens: Column, table: Array[Long], buckets: Int): Column =
    GraftSql.toColumn(BigramLogSum(GraftSql.toExpression(tokens), table, buckets))
}
