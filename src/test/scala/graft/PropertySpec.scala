package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}

/** Property-based row-level oracle (SURVEY §5): the compiled Column predicate
  * must agree with a direct Scala reimplementation of the keyword semantics
  * on generated data — including the reference's quirks (numeric keywords on
  * parseable strings, validator.go:1275-1281; float-division multipleOf,
  * :906-907; rune-count lengths, :977,992).
  *
  * One DataFrame per (keyword, type) pair: all generated values evaluated in
  * a single Spark action, then compared row-for-row against the oracle.
  */
class PropertySpec extends SparkSpec {

  private val N = 400
  private def sample[A](g: Gen[A], seed: Long): Vector[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate((rng.Seed(seed), Vector.empty[A])) { case (s, acc) =>
      val (v, s2) = (g.pureApply(params, s), s.next)
      (s2, acc :+ v)
    }.drop(N).next()._2
  }

  private def checkColumn(dt: DataType, values: Seq[Any], schemaJson: String,
                          oracle: Any => Boolean): Unit = {
    val schema = StructType(Seq(StructField("value", dt, nullable = true)))
    val rows = values.map(v => Row(v))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val got = df.select(RowValidator.validColumn(df, schemaJson,
      opts = CompileOpts(nullIsAbsent = false)).as("ok")).collect().map(_.getBoolean(0))
    values.zip(got).foreach { case (v, g) =>
      assert(g === oracle(v), s"value=$v schema=$schemaJson got=$g")
    }
  }

  private val doubles: Gen[Any] = Gen.frequency(
    (5, Gen.chooseNum(-100.0, 100.0)),
    (2, Gen.chooseNum(-5, 5).map(_.toDouble)),
    (1, Gen.const(null)),
    (1, Gen.oneOf[Any](0.0, -0.0, 1e-9, 99.999999, Double.MinPositiveValue)))

  private val strings: Gen[Any] = Gen.frequency(
    (4, Gen.alphaNumStr.map(s => s.take(12): Any)),
    (2, Gen.chooseNum(-100.0, 100.0).map(_.toString: Any)),
    (2, Gen.chooseNum(-50, 50).map(_.toString: Any)),
    (1, Gen.const(null)),
    (1, Gen.oneOf[Any]("", " ", "NaN", "1e3", "0x10", "héllo wörld")))

  /** Mirror of Spark's string→double try-cast (accepts "NaN"/"Infinity"
    * like Go's ParseFloat; engine semantics then apply Spark's NaN ordering —
    * NaN sorts above every value — where Go would compare IEEE-false). */
  private def parses(s: String): Option[Double] =
    try Some(s.trim.toDouble)
    catch { case _: NumberFormatException => None }

  test("minimum/maximum on doubles match the scalar oracle") {
    val vs = sample(doubles, 1L)
    checkColumn(DoubleType, vs, """{"minimum": -10.5}""",
      v => v == null || v.asInstanceOf[Double] >= -10.5)
    checkColumn(DoubleType, vs, """{"maximum": 42}""",
      v => v == null || v.asInstanceOf[Double] <= 42.0)
    checkColumn(DoubleType, vs, """{"exclusiveMinimum": 0}""",
      v => v == null || v.asInstanceOf[Double] > 0.0)
  }

  test("numeric keywords on strings reproduce the parseable-string quirk") {
    val vs = sample(strings, 2L)
    checkColumn(StringType, vs, """{"minimum": 0}""", {
      case null => true
      case s: String => parses(s).forall(d => d.isNaN || d >= 0.0) // Spark NaN ordering
    })
    checkColumn(StringType, vs, """{"multipleOf": 2}""", {
      case null => true
      case s: String => parses(s).forall { d =>
        val q = d / 2.0
        !q.isNaN && !q.isInfinite && q == math.floor(q)
      }
    })
  }

  test("multipleOf on doubles matches float-division semantics") {
    val vs = sample(doubles, 3L)
    checkColumn(DoubleType, vs, """{"multipleOf": 0.5}""", {
      case null => true
      case d: Double => (d / 0.5) == math.floor(d / 0.5)
    })
  }

  test("minLength/maxLength count characters like rune counting") {
    val vs = sample(strings, 4L)
    def runes(s: String) = s.codePointCount(0, s.length)
    checkColumn(StringType, vs, """{"minLength": 3}""", {
      case null => true
      case s: String => runes(s) >= 3
    })
    checkColumn(StringType, vs, """{"maxLength": 6}""", {
      case null => true
      case s: String => runes(s) <= 6
    })
  }

  test("pattern matches anywhere in the string (RE2-common subset)") {
    val vs = sample(strings, 5L)
    checkColumn(StringType, vs, """{"pattern": "[0-9]"}""", {
      case null => true
      case s: String => "[0-9]".r.findFirstIn(s).isDefined
    })
  }

  test("enum/const deep equality on doubles") {
    val vs = sample(doubles, 6L)
    checkColumn(DoubleType, vs, """{"enum": [0, 1.5, -3]}""", {
      case null => false // enum without null member rejects JSON null
      case d: Double => d == 0.0 || d == 1.5 || d == -3.0
    })
    checkColumn(DoubleType, vs, """{"const": 1.5}""", {
      case null => false
      case d: Double => d == 1.5
    })
  }

  test("array keyword composition on generated int arrays") {
    val arrGen: Gen[Any] = Gen.frequency(
      (5, Gen.listOfN(8, Gen.chooseNum(-5, 20)).map(_.toArray: Any)),
      (2, Gen.const(Array.empty[Int]: Any)),
      (1, Gen.const(null)),
      (2, Gen.listOfN(3, Gen.chooseNum(0, 10)).map(_.toArray: Any)))
    val vs = sample(arrGen, 7L)
    val schema =
      """{"items": {"minimum": 0, "maximum": 15}, "minItems": 1, "uniqueItems": true}"""
    checkColumn(ArrayType(IntegerType, containsNull = true), vs, schema, {
      case null => true
      case a: Array[Int] =>
        a.nonEmpty && a.forall(x => x >= 0 && x <= 15) && a.distinct.length == a.length
    })
  }
}
