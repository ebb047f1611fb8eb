package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.apache.spark.sql.functions._

/** Object keywords over MapType columns — the dynamic-key path (SURVEY §2.2
  * "MapType gets the dynamic-key treatment via map_* higher-order functions"). */
class MapTypeSpec extends SparkSpec {

  private def mapDf(pairs: Map[String, Int]) = {
    import spark.implicits._
    Seq(pairs).toDF("value")
  }

  private def valid(df: org.apache.spark.sql.DataFrame, schema: String): Boolean =
    df.select(RowValidator.validColumn(df, schema,
      opts = CompileOpts(nullIsAbsent = false)).as("ok")).collect()(0).getBoolean(0)

  test("required over map keys via map_contains_key") {
    val s = """{"required": ["a", "b"]}"""
    assert(valid(mapDf(Map("a" -> 1, "b" -> 2)), s))
    assert(!valid(mapDf(Map("a" -> 1)), s))
  }

  test("min/maxProperties count map entries") {
    val s = """{"minProperties": 2, "maxProperties": 3}"""
    assert(!valid(mapDf(Map("a" -> 1)), s))
    assert(valid(mapDf(Map("a" -> 1, "b" -> 2)), s))
    assert(!valid(mapDf(Map("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4)), s))
  }

  test("properties + additionalProperties over map values") {
    val s = """{"properties": {"a": {"minimum": 0}}, "additionalProperties": {"maximum": 10}}"""
    assert(valid(mapDf(Map("a" -> 5, "x" -> 9)), s))
    assert(!valid(mapDf(Map("a" -> -1)), s))       // named property violated
    assert(!valid(mapDf(Map("a" -> 5, "x" -> 11)), s)) // additional violated
  }

  test("patternProperties over map keys") {
    val s = """{"patternProperties": {"^n_": {"minimum": 0}}}"""
    assert(valid(mapDf(Map("n_tok" -> 3, "other" -> -5)), s))
    assert(!valid(mapDf(Map("n_tok" -> -3)), s))
  }

  test("propertyNames over map keys") {
    val s = """{"propertyNames": {"pattern": "^[a-z]+$"}}"""
    assert(valid(mapDf(Map("abc" -> 1)), s))
    assert(!valid(mapDf(Map("Bad-Key" -> 1)), s))
  }

  test("dependentRequired over map keys") {
    val s = """{"dependentRequired": {"credit": ["billing"]}}"""
    assert(valid(mapDf(Map("name" -> 1)), s))                       // trigger absent
    assert(valid(mapDf(Map("credit" -> 1, "billing" -> 2)), s))     // satisfied
    assert(!valid(mapDf(Map("credit" -> 1)), s))                    // missing dep
  }

  test("dependentSchemas over map keys") {
    val s = """{"dependentSchemas": {"credit": {"required": ["billing"], "minProperties": 2}}}"""
    assert(valid(mapDf(Map("name" -> 1)), s))
    assert(valid(mapDf(Map("credit" -> 1, "billing" -> 2)), s))
    assert(!valid(mapDf(Map("credit" -> 1)), s))
  }

  test("unevaluatedProperties over maps: uncovered keys checked") {
    val s = """{"properties": {"a": {}}, "unevaluatedProperties": {"maximum": 5}}"""
    assert(valid(mapDf(Map("a" -> 99, "x" -> 3)), s))
    assert(!valid(mapDf(Map("a" -> 99, "x" -> 7)), s))
  }

  test("unevaluatedProperties over maps sees through allOf") {
    val s = """{"allOf": [{"properties": {"a": {}}}],
               "properties": {"b": {}},
               "unevaluatedProperties": false}"""
    assert(valid(mapDf(Map("a" -> 1, "b" -> 2)), s))      // both covered
    assert(!valid(mapDf(Map("a" -> 1, "c" -> 3)), s))     // c unevaluated
  }

  test("unevaluatedProperties over maps: if/then branch coverage is conditional") {
    val s = """{
      "if": {"required": ["kind"]},
      "then": {"properties": {"alpha": {}}},
      "else": {"properties": {"beta": {}}},
      "properties": {"kind": {}},
      "unevaluatedProperties": false}"""
    assert(valid(mapDf(Map("kind" -> 1, "alpha" -> 2)), s))  // then-branch covers alpha
    assert(!valid(mapDf(Map("kind" -> 1, "beta" -> 2)), s))  // beta only covered in else
    assert(valid(mapDf(Map("beta" -> 2)), s))                // else-branch covers beta
  }

  test("unevaluatedProperties over maps: failing anyOf branch contributes no coverage") {
    val s = """{"anyOf": [{"required": ["z"], "properties": {"x": {}}}, {"required": ["a"]}],
               "properties": {"a": {}},
               "unevaluatedProperties": false}"""
    // first branch fails (no z) so its properties.x coverage must NOT apply
    assert(!valid(mapDf(Map("a" -> 1, "x" -> 2)), s))
    assert(valid(mapDf(Map("a" -> 1)), s))
  }

  test("unevaluatedProperties over maps: nested unevaluatedProperties in allOf covers all") {
    val s = """{"allOf": [{"unevaluatedProperties": true}],
               "unevaluatedProperties": false}"""
    assert(valid(mapDf(Map("anything" -> 1, "goes" -> 2)), s))
  }

  test("unevaluatedProperties over maps: additionalProperties in a branch covers") {
    val s = """{"allOf": [{"additionalProperties": {"maximum": 10}}],
               "unevaluatedProperties": false}"""
    assert(valid(mapDf(Map("k" -> 3)), s))
    // branch fails on the value -> whole schema fails (coverage moot)
    assert(!valid(mapDf(Map("k" -> 30)), s))
  }

  test("unevaluatedProperties over maps: annotations do not escape `not`") {
    val s = """{"not": {"not": {"properties": {"a": {}}}},
               "unevaluatedProperties": false}"""
    // the inner double-negated properties MUST NOT cover key a
    assert(!valid(mapDf(Map("a" -> 1)), s))
  }
}
