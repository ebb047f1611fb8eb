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

  test("unevaluatedProperties over maps: uncovered keys checked") {
    val s = """{"properties": {"a": {}}, "unevaluatedProperties": {"maximum": 5}}"""
    assert(valid(mapDf(Map("a" -> 99, "x" -> 3)), s))
    assert(!valid(mapDf(Map("a" -> 99, "x" -> 7)), s))
  }
}
