package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.json4s.jackson.JsonMethods

/** Validates SCHEMA DOCUMENTS (as data) against the full bundled draft
  * 2020-12 meta-schema — the canonical recursive-$dynamicRef workload: the
  * meta-schema's applicator/validation vocabularies route every subschema
  * position through `{"$dynamicRef": "#meta"}` (bookended by
  * `$dynamicAnchor: meta` at each vocab root), so validating a nested schema
  * document exercises dynamic-scope resolution recursing through the
  * instance's finite DataType — the shape round 3 rejected and round 4's
  * bounded unrolling enables. Reference behavior: `SchemaSchemaJSON`
  * validation through the same anchor stack
  * (`pkg/draft202012/meta.go`, `validate.go:84-182`). */
class MetaSchemaValidationSpec extends SparkSpec {

  private val metaRef = """{"$ref": "https://json-schema.org/draft/2020-12/schema"}"""

  private def validOf(instanceJson: String): Boolean = {
    val df = JsonInstances.toDf(spark, JsonMethods.parse(instanceJson))
    df.select(RowValidator.validColumn(df, metaRef,
      opts = CompileOpts(nullIsAbsent = false)).as("ok"))
      .collect()(0).getBoolean(0)
  }

  test("a well-formed nested schema document validates against the meta-schema") {
    assert(validOf(
      """{"type": "object",
         "properties": {"a": {"type": "number", "minimum": 0.0},
                        "b": {"type": "array", "items": {"type": "string"}}},
         "required": ["a"]}"""))
  }

  test("type must be a simple-type name: a numeric `type` fails") {
    assert(!validOf("""{"type": 5}"""))
  }

  test("a NESTED malformed subschema fails through the $dynamicRef recursion") {
    // properties/a/minimum must be a number; the violation is two dynamic
    // hops deep (root meta -> properties -> additionalProperties dynamicRef)
    assert(!validOf(
      """{"type": "object",
         "properties": {"a": {"minimum": "not-a-number"}}}"""))
  }

  test("boolean-valued schema positions are legal (items: true analogue)") {
    assert(validOf("""{"properties": {"a": true, "b": false}}"""))
  }

  test("enum must be an array: an object-valued enum fails") {
    assert(!validOf("""{"enum": {"a": 1}}"""))
  }

  test("required must be an array of strings") {
    assert(validOf("""{"required": ["x", "y"]}"""))
    assert(!validOf("""{"required": [1.0, 2.0]}"""))
  }
}
