package graft

import graft.expr.{GoFloatUtil, NumericExprs}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GoFloatUtil.parse]] to Go's `strconv.ParseFloat` acceptance — the
  * parser behind the reference's numeric-keywords-on-strings quirk
  * (`internal/validator/validator.go:1275-1281`). Expected values derive
  * from the documented strconv grammar (atof.go readFloat / special /
  * underscoreOK): see each case's comment. Also proves codegen and
  * interpreted paths agree through a real Spark plan. */
class GoFloatSpec extends SparkSpec {

  private def p(s: String): Option[Double] =
    Option(GoFloatUtil.parse(UTF8String.fromString(s))).map(_.doubleValue())

  test("plain decimals parse like Go") {
    assert(p("42") === Some(42.0))
    assert(p("-0.5") === Some(-0.5))
    assert(p("+3") === Some(3.0))
    assert(p("1.") === Some(1.0))       // trailing dot is a valid Go literal
    assert(p(".5") === Some(0.5))       // leading dot likewise
    assert(p("012") === Some(12.0))     // readFloat ignores leading zeros
    assert(p("1e3") === Some(1000.0))
    assert(p("1E+3") === Some(1000.0))
    assert(p("1e-3") === Some(0.001))
  }

  test("Go rejects what Java's parseDouble/Spark's CAST accept") {
    assert(p(" 1") === None)      // no whitespace trimming in ParseFloat
    assert(p("1 ") === None)
    assert(p("1.5f") === None)    // Java float suffix is Go trailing garbage
    assert(p("1.5d") === None)
    assert(p("") === None)
    assert(p(".") === None)       // no digits
    assert(p("e5") === None)
    assert(p("1e") === None)      // exponent needs >=1 digit
    assert(p("1e+") === None)
    assert(p("1.2.3") === None)   // second dot is trailing garbage
    assert(p("--1") === None)
  }

  test("syntactic overflow is ErrRange -> unparseable (instanceFloat !ok)") {
    assert(p("1e309") === None)     // Java: Infinity; Go: ErrRange
    assert(p("-1e309") === None)
    assert(p("1e1000000") === None) // huge exponent, same path
    assert(p("1e308") === Some(1e308))
    // decimal underflow returns 0 with NO error (floatBits d.dp < -330 path)
    assert(p("1e-1000") === Some(0.0))
  }

  test("specials: signed inf/infinity, unsigned nan, case-insensitive") {
    assert(p("inf") === Some(Double.PositiveInfinity))
    assert(p("Infinity") === Some(Double.PositiveInfinity))
    assert(p("-INF") === Some(Double.NegativeInfinity))
    assert(p("+iNfInItY") === Some(Double.PositiveInfinity))
    assert(p("NaN").exists(_.isNaN))
    assert(p("nan").exists(_.isNaN))
    assert(p("+nan") === None)    // special()'s sign switch skips the 'n' arm
    assert(p("-NaN") === None)
    assert(p("infx") === None)    // partial special is a syntax error
    assert(p("infinit") === None)
  }

  test("hex floats need the p exponent; hex underflow is ErrRange") {
    assert(p("0x1.8p1") === Some(3.0))
    assert(p("0X1P2") === Some(4.0))
    assert(p("0x.8p1") === Some(1.0))
    assert(p("-0x1p-1") === Some(-0.5))
    assert(p("0x1.8") === None)   // missing mandatory p exponent
    assert(p("0x") === None)
    assert(p("0x1p") === None)
    assert(p("0x1p2000") === None)  // hex overflow -> ErrRange
    assert(p("0x1p-2000") === None) // hex underflow -> ErrRange (atofHex)
    assert(p("0x0p-2000") === Some(0.0)) // true zero mantissa is fine
  }

  test("underscore separators follow Go literal placement rules") {
    assert(p("1_000") === Some(1000.0))
    assert(p("1_000.000_1") === Some(1000.0001))
    assert(p("1e1_0") === Some(1e10))
    assert(p("0x_1p0") === Some(1.0)) // allowed right after the base prefix
    assert(p("_1") === None)
    assert(p("1_") === None)
    assert(p("1__0") === None)
    assert(p("1_.5") === None)  // must sit between digits
    assert(p("1._5") === None)
    assert(p("1_e5") === None)
  }

  test("codegen and interpreted paths agree through a Spark plan") {
    import spark.implicits._
    val inputs = Seq("42", "1e309", " 1", "1.5f", "inf", "NaN", "+nan",
      "0x1.8p1", "1_000", "1__0", "1e-1000", "0x1p-2000", ".5", "abc")
    val df = inputs.toDF("s")
      .withColumn("d", NumericExprs.goParseFloat(col("s")))
    val got = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    inputs.foreach { s =>
      val expect = p(s)
      val g = got(s)
      assert((g, expect) match {
        case (Some(a), Some(b)) => (a.isNaN && b.isNaN) || a == b
        case (a, b) => a == b
      }, s"input '$s': plan=$g direct=$expect")
    }
  }

  test("bound keywords skip overflow strings and pass NaN like the reference") {
    import graft.compile.CompileOpts
    import graft.row.RowValidator
    def valid(schema: String, data: String): Boolean = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(data)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType, nullable = true))))
      df.select(RowValidator.validColumn(df, schema,
        opts = CompileOpts(nullIsAbsent = false)).as("ok")).collect()(0).getBoolean(0)
    }
    // "1e309" is not a float to Go -> maximum skipped -> valid
    assert(valid("""{"maximum": 100}""", "1e309"))
    // "200" IS a float -> maximum applies -> invalid
    assert(!valid("""{"maximum": 100}""", "200"))
    // Go float comparisons never fire on NaN: all four bounds pass
    assert(valid("""{"maximum": 100}""", "NaN"))
    assert(valid("""{"minimum": 100}""", "NaN"))
    assert(valid("""{"exclusiveMaximum": 100}""", "NaN"))
    assert(valid("""{"exclusiveMinimum": 100}""", "NaN"))
    // ...but the NaN quotient fails multipleOf (Trunc(NaN) != NaN)
    assert(!valid("""{"multipleOf": 2}""", "NaN"))
    // Inf IS a float to Go ("inf" special): maximum fails, minimum passes
    assert(!valid("""{"maximum": 100}""", "inf"))
    assert(valid("""{"minimum": 100}""", "inf"))
    // and an Inf multipleOf quotient is rejected (validator.go:907 IsInf)
    assert(!valid("""{"multipleOf": 2}""", "inf"))
  }
}
