package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True iff the double child is a FINITE integral value, with the reference's
  * exact float semantics at both call sites (`internal/validator/
  * validator.go:807` for `type: integer`, `:906-907` for the multipleOf
  * quotient): Go `math.Trunc(f) == f && !math.IsInf(f, 0)` — so `Inf` is NOT
  * integral (the multipleOf quotient 1e308/1e-308 = Inf must FAIL) and `NaN`
  * is NOT (NaN != NaN). `Math.floor(v) == v && !isInfinite(v)` reproduces
  * both. Codegen'd so it stays inside whole-stage codegen on the hot path. */
case class IsIntegral(child: Expression) extends UnaryExpression with Predicate {
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    java.lang.Math.floor(d) == d && !java.lang.Double.isInfinite(d)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"(java.lang.Math.floor($c) == $c && !java.lang.Double.isInfinite($c))")
  override protected def withNewChildInternal(c: Expression): IsIntegral = copy(child = c)
}

/** Go `strconv.ParseFloat` acceptance, exactly — the parse the reference's
  * numeric-keywords-on-strings quirk runs through (`internal/validator/
  * validator.go:1275-1281`). Spark's `CAST(s AS DOUBLE)` is the WRONG parser
  * for that quirk: it trims whitespace, accepts Java float suffixes
  * (`"1.5f"`), and silently overflows `"1e309"` to Infinity — in all three
  * cases the reference treats the string as NOT a number and SKIPS the
  * keyword. This helper mirrors Go's grammar (strconv/atof.go `readFloat`,
  * `special`, `underscoreOK`):
  *   - no whitespace trimming, no Java `d`/`f` suffixes;
  *   - specials: optional-signed `inf`/`infinity` and UNSIGNED `nan`,
  *     case-insensitive (atof.go `special` — the sign switch falls through
  *     only to the 'i' arm, so `+nan` is a syntax error);
  *   - decimal mantissa with optional `.` and optional `e±ddd` exponent;
  *     hex `0x` mantissa with MANDATORY `p±ddd` exponent;
  *   - `_` digit separators allowed per Go literal rules (between digits or
  *     right after the `0x` prefix), validated whole-string;
  *   - syntactic overflow to ±Inf is `ErrRange` → the reference's
  *     `instanceFloat` returns !ok → here `null` (keyword skipped);
  *   - decimal underflow returns ±0 with NO error (atof.go `floatBits`'
  *     `d.dp < -330` path) → a real 0.0 here; hex underflow is `ErrRange`
  *     (atofHex) → `null`.
  * Numeric value construction is delegated to `Double.parseDouble` on the
  * underscore-stripped string — IEEE-754 nearest-even, same as Go. */
object GoFloatUtil {
  private def lower(c: Char): Char = (c | 0x20).toChar

  /** null ⇔ Go returns a non-nil error (syntax or range). */
  def parse(u: UTF8String): java.lang.Double = {
    if (u == null) return null
    val s = u.toString
    if (s.isEmpty) return null
    // specials (atof.go special): sign only falls through to inf/infinity
    val signed = s.charAt(0) == '+' || s.charAt(0) == '-'
    val body = if (signed) s.substring(1) else s
    val bodyLower = body.toLowerCase(java.util.Locale.ROOT)
    if (bodyLower == "inf" || bodyLower == "infinity")
      return java.lang.Double.valueOf(
        if (s.charAt(0) == '-') Double.NegativeInfinity else Double.PositiveInfinity)
    if (!signed && bodyLower == "nan") return java.lang.Double.valueOf(Double.NaN)

    // grammar walk (atof.go readFloat)
    var i = if (signed) 1 else 0
    var hex = false
    if (i + 2 <= s.length && s.charAt(i) == '0' &&
        (i + 1 < s.length) && lower(s.charAt(i + 1)) == 'x') { hex = true; i += 2 }
    val expChar = if (hex) 'p' else 'e'
    var sawDot = false
    var sawDigits = false
    var underscores = false
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      if (c == '_') { underscores = true; i += 1 }
      else if (c == '.') {
        if (sawDot) done = true else { sawDot = true; i += 1 }
      }
      else if ('0' <= c && c <= '9') { sawDigits = true; i += 1 }
      else if (hex && 'a' <= lower(c) && lower(c) <= 'f') { sawDigits = true; i += 1 }
      else done = true
    }
    if (!sawDigits) return null
    // exponent: optional for decimal, mandatory for hex
    var sawExp = false
    if (i < s.length && lower(s.charAt(i)) == expChar) {
      i += 1
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var expDigits = false
      var stop = false
      while (i < s.length && !stop) {
        val c = s.charAt(i)
        if (c == '_') { underscores = true; i += 1 }
        else if ('0' <= c && c <= '9') { expDigits = true; i += 1 }
        else stop = true
      }
      if (!expDigits) return null
      sawExp = true
    }
    if (hex && !sawExp) return null
    if (i != s.length) return null // trailing garbage
    if (underscores && !underscoreOK(s)) return null

    val cleaned = if (underscores) s.replace("_", "") else s
    // Java parseDouble handles sign, decimals with optional dot/exponent, and
    // hex-with-p — the exact surface the grammar above admits.
    val d =
      try java.lang.Double.parseDouble(cleaned)
      catch { case _: NumberFormatException => return null }
    if (java.lang.Double.isInfinite(d)) return null // Go ErrRange on overflow
    if (hex && d == 0.0 && hexMantissaNonZero(cleaned))
      return null // atofHex underflow-to-zero is ErrRange
    java.lang.Double.valueOf(d)
  }

  /** Any nonzero hex digit in the mantissa (between 0x and p)? */
  private def hexMantissaNonZero(s: String): Boolean = {
    val start = s.indexOf('x') max s.indexOf('X')
    var i = start + 1
    while (i < s.length && lower(s.charAt(i)) != 'p') {
      val c = lower(s.charAt(i))
      if (('1' <= c && c <= '9') || ('a' <= c && c <= 'f')) return true
      i += 1
    }
    false
  }

  /** strconv's underscoreOK: `_` only between digits or after a base prefix. */
  private def underscoreOK(s0: String): Boolean = {
    var saw = '^'
    var s = s0
    if (s.nonEmpty && (s.charAt(0) == '-' || s.charAt(0) == '+')) s = s.substring(1)
    var i = 0
    var hex = false
    if (s.length >= 2 && s.charAt(0) == '0' &&
        (lower(s.charAt(1)) == 'b' || lower(s.charAt(1)) == 'o' || lower(s.charAt(1)) == 'x')) {
      i = 2
      saw = '0' // base prefix counts as a digit for separator purposes
      hex = lower(s.charAt(1)) == 'x'
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (('0' <= c && c <= '9') || (hex && 'a' <= lower(c) && lower(c) <= 'f')) saw = '0'
      else if (c == '_') {
        if (saw != '0') return false
        saw = '_'
      } else {
        if (saw == '_') return false
        saw = '!'
      }
      i += 1
    }
    saw != '_'
  }
}

/** String → Double via [[GoFloatUtil.parse]]; null when Go's ParseFloat
  * errors. Codegen'd (static helper call) so the conformance quirk stays
  * inside whole-stage codegen. */
case class GoParseFloat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = GoFloatUtil.parse(v.asInstanceOf[UTF8String])
      if (r == null) null else r.doubleValue()
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val r = ctx.freshName("goFloat")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        java.lang.Double $r = graft.expr.GoFloatUtil.parse(${c.value});
        if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.doubleValue(); }
      }""")
  }
  override protected def withNewChildInternal(c: Expression): GoParseFloat = copy(child = c)
}

object NumericExprs {
  /** Column wrapper: is this (double-valued) column an integral number? */
  def isIntegral(c: Column): Column =
    GraftSql.toColumn(IsIntegral(GraftSql.toExpression(c.cast("double"))))

  /** Column wrapper: Go-ParseFloat a string column (null = unparseable). */
  def goParseFloat(c: Column): Column =
    GraftSql.toColumn(GoParseFloat(GraftSql.toExpression(c)))
}
