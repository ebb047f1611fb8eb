package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for exact-substring (repeated-span) dedup —
  * the token-level analogue of Lee et al. 2022 ("Deduplicating Training Data
  * Makes Language Models Better"): every length-L token window whose content
  * occurs earlier in the corpus marks its tokens for removal.
  *
  * All three expressions are codegen'd tight loops (the HOF formulation —
  * `transform(sequence(...), i -> slice(...))` per window — is
  * CodegenFallback and would also materialize every window's CONTENT;
  * here each window costs O(1) via a rolling hash, so a document's windows
  * cost O(n_tok) total).
  *
  * The rolling hash is a degree-(L−1) polynomial in B = 1000003 over Z/2^64
  * (Java long wrap-around). B is odd, so multiplication by B is a bijection
  * on Z/2^64 and single-token changes always change the hash; cross-window
  * collisions are the standard 64-bit content-hash trade (negligible below
  * ~10^9 distinct windows, same caveat as [[graft.table.Dedup.exactDuplicates]]
  * phase 1 — and the DuckDB oracle groups by the actual window content, so
  * any collision would surface as a correctness diff, not hide in one).
  */
object SpanUtil {
  val B: Long = 1000003L

  /** Null array elements participate as this sentinel value — outside the
    * int32 token range, so a null can never alias a real token. */
  private val NullTok: Long = 1L << 33

  private def tokAt(tokens: ArrayData, i: Int): Long =
    if (tokens.isNullAt(i)) NullTok else tokens.getInt(i).toLong

  /** Rolling hashes of every length-L window: out(i) = hash(tokens[i, i+L)),
    * length max(0, n−L+1) so `posexplode` yields (pos, hash) directly. */
  def windowHashes(tokens: ArrayData, L: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < L) return new GenericArrayData(Array.empty[Any])
    // B^(L-1) wrapping — the coefficient of the outgoing token
    var bl = 1L
    var k = 1
    while (k < L) { bl *= B; k += 1 }
    val out = new Array[Any](n - L + 1)
    var h = 0L
    var i = 0
    while (i < L) { h = h * B + tokAt(tokens, i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - L) {
      h = (h - tokAt(tokens, i - 1) * bl) * B + tokAt(tokens, i + L - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MurmurHash3 64-bit finalizer — avalanches the polynomial hash so the
    * winnowing minimum is over uniformly distributed values (raw polynomial
    * hashes of overlapping windows correlate, which would bias selection). */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Winnowing (Schleimer et al., SIGMOD 2003): from the n−L+1 window hashes,
    * select in every w consecutive positions the minimum finalized hash
    * (ties → rightmost), deduplicating repeats of the same selection.
    * Selection depends only on content, so it is self-synchronizing: any two
    * occurrences of a repeated substring of length ≥ L + w − 1 select at
    * least one anchor at the SAME content offset — the detection guarantee.
    * Expected density ≈ 2/(w+1) of positions. Returns
    * array<struct<pos:int, h:long>> of selected (position, finalized hash). */
  def winnowedAnchors(tokens: ArrayData, L: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n - L + 1 // window count
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // finalized window hashes, computed rolling like windowHashes
    val hs = new Array[Long](m)
    var bl = 1L
    var k = 1
    while (k < L) { bl *= B; k += 1 }
    var h = 0L
    var i = 0
    while (i < L) { h = h * B + tokAt(tokens, i); i += 1 }
    hs(0) = fmix64(h)
    i = 1
    while (i < m) {
      h = (h - tokAt(tokens, i - 1) * bl) * B + tokAt(tokens, i + L - 1)
      hs(i) = fmix64(h)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](m / math.max(w, 1) + 2)
    var lastSel = -1
    // each length-w band of positions [i, i+w) selects its min (rightmost tie)
    var start = 0
    while (start + w <= m || (start == 0 && m < w)) {
      val end = math.min(start + w, m)
      var best = start
      var j = start + 1
      while (j < end) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != lastSel) {
        out += InternalRow(best, hs(best))
        lastSel = best
      }
      start += 1
      if (m < w) start = m // single short band: emit once, stop
    }
    new GenericArrayData(out.toArray)
  }

  /** Remove every token covered by a length-L window starting at any of the
    * (sorted ascending) `loserStarts` positions UNLESS also covered by one
    * starting at a `winnerStarts` position (first occurrences of repeated
    * windows — their coverage is exempt, so every repeated window's content
    * survives at least once; without the exemption a periodic self-repeat
    * would erode even its own first occurrence below window length).
    * Returns struct<clean_tokens: array<int>, n_removed: int>. Empty
    * loserStarts → the input array unchanged (no copy) — the overwhelmingly
    * common row. */
  def removeCovered(tokens: ArrayData, loserStarts: ArrayData,
                    winnerStarts: ArrayData, L: Int): InternalRow = {
    val k = loserStarts.numElements()
    if (k == 0) return InternalRow(tokens, 0)
    val kw = winnerStarts.numElements()
    val n = tokens.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var lEnd = -1 // last loser-covered position so far
    var wEnd = -1 // last winner-covered position so far
    var li = 0
    var wi = 0
    var i = 0
    while (i < n) {
      while (li < k && loserStarts.getInt(li) <= i) {
        val e = loserStarts.getInt(li) + L - 1
        if (e > lEnd) lEnd = e
        li += 1
      }
      while (wi < kw && winnerStarts.getInt(wi) <= i) {
        val e = winnerStarts.getInt(wi) + L - 1
        if (e > wEnd) wEnd = e
        wi += 1
      }
      if (i > lEnd || i <= wEnd) {
        out += (if (tokens.isNullAt(i)) null else tokens.getInt(i))
      }
      i += 1
    }
    InternalRow(new GenericArrayData(out.toArray), n - out.length)
  }
}

/** `array<int>` tokens → `array<long>` rolling hash per length-L window
  * (index = window start position) — codegen'd. */
case class WindowHashes(child: Expression, winLen: Int) extends UnaryExpression {
  require(winLen >= 1, "window length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    SpanUtil.windowHashes(v.asInstanceOf[ArrayData], winLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SpanUtil.windowHashes($c, $winLen)")
  override protected def withNewChildInternal(c: Expression): WindowHashes = copy(child = c)
}

/** `array<int>` tokens → `array<struct<pos:int, h:long>>` winnowed anchor
  * fingerprints (window length L, winnowing window w) — codegen'd. */
case class WinnowedAnchors(child: Expression, winLen: Int, winnowW: Int)
    extends UnaryExpression {
  require(winLen >= 1 && winnowW >= 1, "window and winnow lengths must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    SpanUtil.winnowedAnchors(v.asInstanceOf[ArrayData], winLen, winnowW)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SpanUtil.winnowedAnchors($c, $winLen, $winnowW)")
  override protected def withNewChildInternal(c: Expression): WinnowedAnchors =
    copy(child = c)
}

/** (tokens: array<int>, loserStarts: array<int> sorted, winnerStarts:
  * array<int> sorted) → struct<clean_tokens: array<int>, n_removed: int> —
  * cut every token covered by a loser window and not by a winner window —
  * codegen'd. */
case class RemoveCoveredSpans(first: Expression, second: Expression,
                              third: Expression, winLen: Int)
    extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean_tokens",
      first.dataType.asInstanceOf[ArrayType].copy(containsNull = true)),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, l: Any, w: Any): Any =
    SpanUtil.removeCovered(t.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      w.asInstanceOf[ArrayData], winLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, l, w) => s"graft.expr.SpanUtil.removeCovered($t, $l, $w, $winLen)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RemoveCoveredSpans =
    copy(first = f, second = s, third = t)
}

object SpanExprs {
  def windowHashes(tokens: Column, winLen: Int): Column =
    GraftSql.toColumn(WindowHashes(GraftSql.toExpression(tokens), winLen))
  def winnowedAnchors(tokens: Column, winLen: Int, winnowW: Int): Column =
    GraftSql.toColumn(WinnowedAnchors(GraftSql.toExpression(tokens), winLen, winnowW))
  def removeCoveredSpans(tokens: Column, loserStarts: Column,
                         winnerStarts: Column, winLen: Int): Column =
    GraftSql.toColumn(RemoveCoveredSpans(
      GraftSql.toExpression(tokens), GraftSql.toExpression(loserStarts),
      GraftSql.toExpression(winnerStarts), winLen))
}
