package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Pins the bounded-unrolling + least-fixpoint semantics for `$ref` /
  * `$dynamicRef` cycles with NO intervening data descent
  * (ConstraintCompiler.MaxNoDescentUnroll).
  *
  * Documented deviation from the reference: the reference evaluates every
  * applicator branch with no short-circuit
  * (`internal/validator/validator.go:88-120`), so ANY same-instance cycle
  * recurses to the depth guard (`pkg/types/schema/schema.go:1088`) and the
  * whole validation errors out. Graft instead closes the cycle with the
  * least fixpoint and returns a per-row verdict: valid exactly when some
  * finite unfolding validates the instance, otherwise invalid with a
  * depth-guard violation row — at 10^12 rows, aborting the job on a
  * recursive schema is not an option. Recursion THROUGH data (strict-tree,
  * linked lists) never takes this path and stays reference-exact
  * (ConformanceSpec cases11/cases20). */
class RecursiveSchemaSpec extends SparkSpec {

  private def validOf(schemaJson: String, data: org.json4s.JValue): Boolean = {
    val df = JsonInstances.toDf(spark, data)
    df.select(RowValidator.validColumn(df, schemaJson,
      opts = CompileOpts(nullIsAbsent = false)).as("ok"))
      .collect()(0).getBoolean(0)
  }

  private def violationsOf(schemaJson: String, data: org.json4s.JValue): Seq[String] = {
    val df = JsonInstances.toDf(spark, data)
    import org.apache.spark.sql.functions._
    df.select(explode(RowValidator.violationsColumn(df, schemaJson,
        opts = CompileOpts(nullIsAbsent = false))).as("v"))
      .select(col("v.keyword"), col("v.message"))
      .collect().map(r => s"${r.getString(0)}: ${r.getString(1)}").toSeq
  }

  private val anyOfSelf =
    """{"anyOf": [{"type": "string"}, {"$ref": "#"}]}"""

  test("anyOf self-cycle: a branch that matches makes the row valid (least fixpoint)") {
    assert(validOf(anyOfSelf, org.json4s.JString("x")))
  }

  test("anyOf self-cycle: no finite unfolding matches -> invalid") {
    assert(!validOf(anyOfSelf, org.json4s.JDouble(5.0)))
    // the anyOf wrapper reports its own violation (branch violations are
    // not propagated — engine-wide applicator behavior)
    val vs = violationsOf(anyOfSelf, org.json4s.JDouble(5.0))
    assert(vs.exists(_.startsWith("anyOf")), vs.mkString("; "))
  }

  test("bare top-level cycle surfaces the depth-guard violation row") {
    val s = """{"$ref": "#"}"""
    assert(!validOf(s, org.json4s.JDouble(5.0)))
    val vs = violationsOf(s, org.json4s.JDouble(5.0))
    assert(vs.exists(_.contains("no-progress depth guard")), vs.mkString("; "))
  }

  test("allOf self-cycle: a failing sibling member decides invalid") {
    val s = """{"allOf": [{"type": "string"}, {"$ref": "#"}]}"""
    assert(!validOf(s, org.json4s.JDouble(5.0)))
  }

  test("mutually recursive pair through anyOf settles to the least fixpoint") {
    val s =
      """{"$ref": "#/$defs/a",
         "$defs": {
           "a": {"anyOf": [{"type": "number"}, {"$ref": "#/$defs/b"}]},
           "b": {"anyOf": [{"type": "string"}, {"$ref": "#/$defs/a"}]}}}"""
    assert(validOf(s, org.json4s.JDouble(1.0)))
    assert(validOf(s, org.json4s.JString("x")))
    assert(!validOf(s, org.json4s.JBool(true)))
  }

  test("$dynamicRef self-cycle gets the same treatment") {
    val s =
      """{"$id": "https://example.test/rec/dynself",
         "$dynamicAnchor": "self",
         "anyOf": [{"type": "string"}, {"$dynamicRef": "#self"}]}"""
    assert(validOf(s, org.json4s.JString("x")))
    assert(!validOf(s, org.json4s.JDouble(2.0)))
  }

  test("cycle budget resets on data descent: deep recursion through data stays exact") {
    // 5-deep linked list against a 2-keyword node schema: every level
    // descends into `next`, so the no-descent budget is never consumed.
    val s =
      """{"$ref": "#/$defs/node",
         "$defs": {"node": {"type": "object",
           "properties": {"v": {"type": "number"}, "next": {"$ref": "#/$defs/node"}},
           "required": ["v"]}}}"""
    def chain(depth: Int, breakAt: Int): org.json4s.JValue = {
      val leaf: org.json4s.JObject = ("v" -> 0.0): org.json4s.JObject
      (1 until depth).foldLeft(leaf) { (acc, i) =>
        if (i == breakAt) ("next" -> acc): org.json4s.JObject // missing v
        else ((("v" -> i.toDouble) ~ ("next" -> acc))): org.json4s.JObject
      }
    }
    assert(validOf(s, chain(5, -1)))
    assert(!validOf(s, chain(5, 3)))
  }
}
