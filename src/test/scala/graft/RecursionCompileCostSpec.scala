package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.json4s.jackson.JsonMethods

/** Compile-cost guard for recursive-schema unrolling: the inlining compiler
  * re-expands the referenced schema at every data level, so the compiled
  * plan must grow LINEARLY in instance-type depth, not exponentially. Pins
  * wall-clock budgets for (a) the extended-tree $dynamicRef shape at depth 8
  * and (b) a schema document nested 5 `properties` levels deep validated
  * against the full 2020-12 meta-schema. Budgets are deliberately loose
  * (shared host) — they exist to catch a blowup regression, which would
  * overshoot by orders of magnitude, not percent. */
class RecursionCompileCostSpec extends SparkSpec {

  private def timeValid(schemaJson: String, instanceJson: String): (Boolean, Double) = {
    val df = JsonInstances.toDf(spark, JsonMethods.parse(instanceJson))
    val t0 = System.nanoTime()
    val ok = df.select(RowValidator.validColumn(df, schemaJson,
      opts = CompileOpts(nullIsAbsent = false)).as("ok"))
      .collect()(0).getBoolean(0)
    (ok, (System.nanoTime() - t0) / 1e9)
  }

  test("extended-tree $dynamicRef at instance depth 8 compiles in bounded time") {
    val schema =
      """{"$id": "https://example.test/cost/ext",
         "$dynamicAnchor": "node",
         "$ref": "tree",
         "properties": {"data": {"type": "number"}},
         "$defs": {"tree": {"$id": "tree", "$dynamicAnchor": "node",
                            "type": "object",
                            "properties": {
                              "data": true,
                              "children": {"type": "array",
                                           "items": {"$dynamicRef": "#node"}}}}}}"""
    def nest(d: Int): String =
      if (d == 0) """{"data": 1.0}"""
      else s"""{"data": ${d.toDouble}, "children": [${nest(d - 1)}]}"""
    val (ok, sec) = timeValid(schema, nest(8))
    assert(ok)
    assert(sec < 30.0, s"depth-8 dynamic tree took $sec s — unroll blowup?")
    // and a violation at the deepest level still surfaces
    val deepBad = nest(8).replace("""{"data": 1.0}""", """{"data": "x"}""")
    assert(!timeValid(schema, deepBad)._1)
  }

  test("5-level-nested schema document against the FULL meta-schema compiles in bounded time") {
    val metaRef = """{"$ref": "https://json-schema.org/draft/2020-12/schema"}"""
    def nested(d: Int): String =
      if (d == 0) """{"type": "number", "minimum": 0.0}"""
      else s"""{"type": "object", "properties": {"p$d": ${nested(d - 1)}}}"""
    val (ok, sec) = timeValid(metaRef, nested(5))
    assert(ok)
    assert(sec < 120.0, s"meta-schema at depth 5 took $sec s — unroll blowup?")
    info(f"meta-schema depth-5 validation: $sec%.1f s")
  }
}
