package graft

import graft.compile.{CompileOpts, ConstraintCompiler, RegexDialect}
import graft.model.SchemaParser
import graft.row.RowValidator
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-mode (nullIsAbsent) edge semantics pinned after the round-5 core
  * review: absent-property skips for `false` subschemas and propertyNames,
  * canonical-text string semantics for date/timestamp/binary columns,
  * MapType const, and Go-float equality (NaN) in items bounds and
  * uniqueItems. */
class TableModeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def validFlags(df: org.apache.spark.sql.DataFrame, schema: String,
                         conf: Boolean = false): Seq[Boolean] = {
    val opts = CompileOpts(nullIsAbsent = !conf)
    val asObj = df.select(struct(df.columns.map(col).toIndexedSeq: _*).as("value"))
    asObj.select(RowValidator.validColumn(asObj, schema, opts = opts).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("a false subschema skips absent (null) optional properties in table mode") {
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "legacy")
    val schema = """{"properties": {"legacy": false}}"""
    // present → banned; absent → fine
    assert(validFlags(df, schema) == Seq(false, true))
  }

  test("propertyNames only constrains rows where the bad-named field is present") {
    val df = Seq((1L, Some(5)), (2L, None)).toDF("ok", "waytoolongname")
    val schema = """{"propertyNames": {"maxLength": 6}}"""
    assert(validFlags(df, schema) == Seq(false, true))
  }

  test("date/timestamp/binary columns behave as their canonical string text") {
    val df = Seq(
      (java.sql.Date.valueOf("2024-01-01"), "a"),
      (java.sql.Date.valueOf("2025-12-31"), "b")).toDF("d", "tag")
    // const matches the ISO text; type:"string" agrees; minLength applies
    val constSchema = """{"properties": {"d": {"const": "2024-01-01"}}}"""
    assert(validFlags(df, constSchema) == Seq(true, false))
    val strSchema =
      """{"properties": {"d": {"type": "string", "minLength": 10, "maxLength": 10,
                               "pattern": "^\\d{4}-\\d{2}-\\d{2}$"}}}"""
    assert(validFlags(df, strSchema) == Seq(true, true))
    val bin = Seq(Tuple1("abc".getBytes("UTF-8"))).toDF("b")
    assert(validFlags(bin, """{"properties": {"b": {"const": "abc"}}}""") == Seq(true))
    assert(validFlags(bin, """{"properties": {"b": {"minLength": 4}}}""") == Seq(false))
  }

  test("const object literal compares against MapType columns") {
    val df = Seq(
      Map("a" -> 1.0, "b" -> 2.0),
      Map("a" -> 1.0, "b" -> 3.0),
      Map("a" -> 1.0),
      Map("a" -> 1.0, "b" -> 2.0, "c" -> 9.0)).toDF("value")
    val c = ConstraintCompiler.compile(
      SchemaParser.parse("""{"const": {"a": 1, "b": 2}}"""),
      col("value"), df.schema("value").dataType)
    val got = df.select(c.valid.as("ok")).collect().map(_.getBoolean(0)).toSeq
    // exact keys and values; missing key and extra key both differ
    assert(got == Seq(true, false, false, false))
  }

  test("items bounds over double arrays pass NaN like the scalar path") {
    val df = Seq(
      Tuple1(Seq(1.0, 2.0)),
      Tuple1(Seq(Double.NaN)),        // NaN passes bound keywords (Go quirk)
      Tuple1(Seq(Double.NaN, 10.0)),  // the real violation is still caught
      Tuple1(Seq(7.0))).toDF("value")
    val c = ConstraintCompiler.compile(
      SchemaParser.parse("""{"items": {"maximum": 5}}"""),
      col("value"), df.schema("value").dataType)
    val got = df.select(c.valid.as("ok")).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, false))
  }

  test("uniqueItems uses Go-map float equality: NaN never collides, -0.0 == 0.0") {
    val df = Seq(
      Tuple1(Seq(Double.NaN, Double.NaN)), // NaN != NaN → unique
      Tuple1(Seq(0.0, -0.0)),              // -0.0 == 0.0 → duplicate
      Tuple1(Seq(1.0, 1.0)),
      Tuple1(Seq(1.0, 2.0))).toDF("value")
    val c = ConstraintCompiler.compile(
      SchemaParser.parse("""{"uniqueItems": true}"""),
      col("value"), df.schema("value").dataType)
    val got = df.select(c.valid.as("ok")).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, true))
  }

  test("null MapType instances skip patternProperties/additionalProperties") {
    val mt = MapType(StringType, DoubleType)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Map("apple" -> 1.0)), Row(null)),
      StructType(Seq(StructField("value", mt, nullable = true))))
    val schema =
      """{"patternProperties": {"^a": {"type": "number"}},
          "additionalProperties": false}"""
    val c = ConstraintCompiler.compile(SchemaParser.parse(schema),
      col("value"), mt, CompileOpts(nullIsAbsent = true))
    val got = df.select(c.valid.as("ok")).collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true)) // null map = absent instance → skip
  }

  test("POSIX classes inside a character class do not end the class early") {
    import RegexDialect.re2Incompatibilities
    // "(?=)" here is LITERAL class content after the POSIX class — valid RE2
    assert(re2Incompatibilities("[[:alpha:](?=)]+").isEmpty)
    assert(re2Incompatibilities("[[:^digit:]x]*").isEmpty)
    // a real top-level lookahead after the class still flags
    assert(re2Incompatibilities("[[:alpha:]](?=x)").exists(_.contains("lookahead")))
  }
}
