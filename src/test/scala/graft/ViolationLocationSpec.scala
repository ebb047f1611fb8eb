package graft

import graft.compile.CompileOpts
import graft.row.RowValidator
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Output-format parity: exact `keywordLocation` / `instanceLocation` /
  * `keyword` triples for nested applicator failures — the translation of the
  * reference's location-composition tests
  * (`/root/reference/pkg/errors/errors.go:65-135` AddError pointer
  * composition, `pkg/types/schema/schema.go:1147-1164`
  * EnsureInstanceLocation, `internal/validator/validator.go:520-526`
  * properties instance tokens).
  *
  * Reference composition rules mirrored here:
  *  - a leaf keyword failure gets its keyword name as the location tail
  *    (`#/type`), composed outward through named applicators
  *    (`#/properties/a/type`, `#/allOf/1/...`);
  *  - `properties` contributes `properties/<name>` to the keyword location
  *    AND `<name>` to the instance location;
  *  - `anyOf`/`oneOf` report their own single violation (branch errors are
  *    not propagated), `allOf` propagates member errors under `allOf/<i>`;
  *  - `$ref` traversal is transparent in the reference's location output.
  * Documented graft enrichment: array element failures carry the element
  * INDEX in the instance location (`#/tokens/17`) — the reference never
  * pushes array indices (only `ValidateProperties` pushes instance tokens),
  * so its items failures reuse the enclosing instance location. The richer
  * pointer is strictly more debuggable at 10^12 rows and is pinned here as
  * the engine contract. */
class ViolationLocationSpec extends SparkSpec {

  private def rows(schemaJson: String, data: JValue): Set[(String, String, String)] = {
    val df = JsonInstances.toDf(spark, data)
    df.select(explode(RowValidator.violationsColumn(df, schemaJson,
        opts = CompileOpts(nullIsAbsent = false))).as("v"))
      .select(col("v.keyword"), col("v.keywordLocation"), col("v.instanceLocation"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  private def j(s: String): JValue = JsonMethods.parse(s)

  /** (name, schema, instance, expected (keyword, keywordLocation,
    * instanceLocation) triples — the EXACT violation set). */
  private val pinned: Seq[(String, String, String, Set[(String, String, String)])] = Seq(
    ("top-level type", """{"type": "string"}""", """5""",
      Set(("type", "#/type", "#"))),
    ("top-level two failures", """{"type": "integer", "minimum": 10}""", """5.5""",
      Set(("type", "#/type", "#"), ("minimum", "#/minimum", "#"))),
    ("property leaf", """{"properties": {"a": {"type": "string"}}}""", """{"a": 5}""",
      Set(("type", "#/properties/a/type", "#/a"))),
    ("nested property leaf",
      """{"properties": {"a": {"properties": {"b": {"type": "string"}}}}}""",
      """{"a": {"b": 5}}""",
      Set(("type", "#/properties/a/properties/b/type", "#/a/b"))),
    ("required", """{"required": ["miss"]}""", """{"a": 1}""",
      Set(("required", "#/required", "#"))),
    ("items element index enrichment",
      """{"properties": {"tokens": {"items": {"type": "number"}}}}""",
      """{"tokens": ["x", "y"]}""",
      Set(("type", "#/properties/tokens/items/type", "#/tokens/0"),
          ("type", "#/properties/tokens/items/type", "#/tokens/1"))),
    ("items bounds per offending index",
      """{"properties": {"tokens": {"items": {"minimum": 10}}}}""",
      """{"tokens": [1, 20, 2]}""",
      Set(("minimum", "#/properties/tokens/items/minimum", "#/tokens/0"),
          ("minimum", "#/properties/tokens/items/minimum", "#/tokens/2"))),
    ("prefixItems positional", """{"prefixItems": [{"type": "string"}, {"type": "number"}]}""",
      """[5, 6]""",
      Set(("type", "#/prefixItems/0/type", "#/0"))),
    ("allOf member errors propagate under allOf/<i>",
      """{"allOf": [{"type": "number"}, {"minimum": 10}]}""", """5""",
      Set(("minimum", "#/allOf/1/minimum", "#"))),
    ("anyOf reports one violation, branches not propagated",
      """{"anyOf": [{"type": "string"}, {"minimum": 10}]}""", """5""",
      Set(("anyOf", "#/anyOf", "#"))),
    ("oneOf zero matches", """{"oneOf": [{"type": "string"}, {"minimum": 10}]}""", """5""",
      Set(("oneOf", "#/oneOf", "#"))),
    ("oneOf too many matches", """{"oneOf": [{"type": "number"}, {"minimum": 1}]}""", """5""",
      Set(("oneOf", "#/oneOf", "#"))),
    ("not", """{"not": {"type": "number"}}""", """5""",
      Set(("not", "#/not", "#"))),
    ("then errors under #/then", """{"if": {"type": "number"}, "then": {"minimum": 10}}""",
      """5""", Set(("minimum", "#/then/minimum", "#"))),
    ("else errors under #/else", """{"if": {"type": "string"}, "else": {"minimum": 10}}""",
      """5""", Set(("minimum", "#/else/minimum", "#"))),
    ("$ref segment is explicit (2020-12 output format; the reference's AddError is ref-transparent)",
      """{"$ref": "#/$defs/s", "$defs": {"s": {"type": "string"}}}""", """5""",
      Set(("type", "#/$ref/type", "#"))),
    ("$ref under a property",
      """{"properties": {"a": {"$ref": "#/$defs/s"}}, "$defs": {"s": {"type": "string"}}}""",
      """{"a": 5}""",
      Set(("type", "#/properties/a/$ref/type", "#/a"))),
    ("additionalProperties names the offending key",
      """{"properties": {"a": true}, "additionalProperties": {"type": "string"}}""",
      """{"a": 1, "b": 2}""",
      Set(("type", "#/additionalProperties/type", "#/b"))),
    ("patternProperties carries the pattern in the location",
      """{"patternProperties": {"^a": {"type": "string"}}}""", """{"ax": 5}""",
      Set(("type", "#/patternProperties/^a/type", "#/ax"))),
    ("propertyNames", """{"propertyNames": {"maxLength": 1}}""", """{"long": 1}""",
      Set(("propertyNames", "#/propertyNames", "#"))),
    ("unevaluatedProperties points at the uncovered key",
      """{"properties": {"a": true}, "unevaluatedProperties": false}""",
      """{"a": 1, "b": 2}""",
      Set(("unevaluatedProperties", "#/unevaluatedProperties", "#/b"))),
    ("contains", """{"contains": {"type": "string"}}""", """[1, 2]""",
      Set(("contains", "#/contains", "#"))),
    ("uniqueItems", """{"uniqueItems": true}""", """[1, 1]""",
      Set(("uniqueItems", "#/uniqueItems", "#"))),
    ("applicator chain through object and allOf",
      """{"properties": {"o": {"allOf": [{"properties": {"x": {"type": "string"}}}]}}}""",
      """{"o": {"x": 5}}""",
      Set(("type", "#/properties/o/allOf/0/properties/x/type", "#/o/x"))),
    ("dependentRequired", """{"dependentRequired": {"a": ["b"]}}""", """{"a": 1}""",
      Set(("dependentRequired", "#/dependentRequired", "#"))),
    ("dependentSchemas member errors compose",
      """{"dependentSchemas": {"a": {"properties": {"b": {"type": "string"}}}}}""",
      """{"a": 1, "b": 2}""",
      Set(("type", "#/dependentSchemas/a/properties/b/type", "#/b"))),
    ("maxItems", """{"maxItems": 1}""", """[1, 2]""",
      Set(("maxItems", "#/maxItems", "#"))),
    ("minLength under a property", """{"properties": {"a": {"minLength": 5}}}""",
      """{"a": "x"}""", Set(("minLength", "#/properties/a/minLength", "#/a"))),
    ("pattern under a property", """{"properties": {"a": {"pattern": "^z"}}}""",
      """{"a": "x"}""", Set(("pattern", "#/properties/a/pattern", "#/a"))),
    ("enum under a property", """{"properties": {"a": {"enum": ["p", "q"]}}}""",
      """{"a": "x"}""", Set(("enum", "#/properties/a/enum", "#/a"))),
    ("const", """{"const": 3}""", """5""", Set(("const", "#/const", "#"))),
    ("multipleOf", """{"multipleOf": 2}""", """5""",
      Set(("multipleOf", "#/multipleOf", "#"))),
    ("nested arrays compose indices",
      """{"items": {"items": {"type": "number"}}}""", """[["x"]]""",
      Set(("type", "#/items/items/type", "#/0/0"))),
    ("unevaluatedItems", """{"prefixItems": [true], "unevaluatedItems": false}""",
      """[1, 2]""", Set(("unevaluatedItems", "#/unevaluatedItems", "#"))),
    ("minProperties", """{"minProperties": 2}""", """{"a": 1}""",
      Set(("minProperties", "#/minProperties", "#"))),
    ("then nested under a property",
      """{"properties": {"a": {"if": {"type": "number"}, "then": {"minimum": 9}}}}""",
      """{"a": 5}""",
      Set(("minimum", "#/properties/a/then/minimum", "#/a"))),
    ("allOf inside items: keyword location keeps both, instance keeps the index",
      """{"items": {"allOf": [{"type": "number"}, {"maximum": 1}]}}""", """[5]""",
      Set(("maximum", "#/items/allOf/1/maximum", "#/0"))),
    ("$dynamicRef segment is explicit",
      """{"$id": "https://example.test/loc/r", "type": "array",
         "items": {"$dynamicRef": "#it"},
         "$defs": {"f": {"$dynamicAnchor": "it", "type": "string"}}}""",
      """[5]""",
      Set(("type", "#/items/$dynamicRef/type", "#/0"))))

  /** Multi-violation documents: the full violation SET of a document with
    * several simultaneous failures at different depths, as the flagship
    * validation pipeline emits it (one row per (keyword, locations)). */
  private val multi: Seq[(String, String, String, Set[(String, String, String)])] = Seq(
    ("tokenized-sequence document shape (the north-star row contract)",
      """{"type": "object",
         "required": ["doc_id", "tokens", "n_tok", "source"],
         "properties": {
           "doc_id": {"type": "string", "minLength": 1},
           "tokens": {"type": "array", "items": {"type": "number", "minimum": 0, "maximum": 4095}},
           "n_tok": {"type": "number", "minimum": 1, "maximum": 80},
           "source": {"enum": ["src0", "src1"]}}}""",
      """{"doc_id": "", "tokens": [1, -3, 9999], "n_tok": 81, "source": "srcX"}""",
      Set(
        ("minLength", "#/properties/doc_id/minLength", "#/doc_id"),
        ("minimum", "#/properties/tokens/items/minimum", "#/tokens/1"),
        ("maximum", "#/properties/tokens/items/maximum", "#/tokens/2"),
        ("maximum", "#/properties/n_tok/maximum", "#/n_tok"),
        ("enum", "#/properties/source/enum", "#/source"))),
    ("nested object + array + conditional failures in one document",
      """{"properties": {
           "meta": {"properties": {"v": {"type": "number"}},
                    "required": ["id"]},
           "rows": {"items": {"properties": {"k": {"minLength": 2}}}},
           "mode": {"if": {"const": "strict"}, "then": {"enum": ["never"]}}}}""",
      """{"meta": {"v": "x"}, "rows": [{"k": "a"}, {"k": "ok"}, {"k": "b"}], "mode": "strict"}""",
      Set(
        ("type", "#/properties/meta/properties/v/type", "#/meta/v"),
        ("required", "#/properties/meta/required", "#/meta"),
        ("minLength", "#/properties/rows/items/properties/k/minLength", "#/rows/0/k"),
        ("minLength", "#/properties/rows/items/properties/k/minLength", "#/rows/2/k"),
        ("enum", "#/properties/mode/then/enum", "#/mode"))))

  test("pinned multi-violation documents (" + multi.map(_._4.size).sum + " rows)") {
    val bad = multi.flatMap { case (name, s, d, want) =>
      val got = rows(s, j(d))
      if (got != want) Some(s"[$name]\n  want ${want.toSeq.sorted}\n  got  ${got.toSeq.sorted}")
      else None
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("pinned keywordLocation/instanceLocation composition (" +
      pinned.map(_._4.size).sum + " violation rows)") {
    val bad = pinned.flatMap { case (name, s, d, want) =>
      val got = rows(s, j(d))
      if (got != want) Some(s"[$name]\n  want ${want.toSeq.sorted}\n  got  ${got.toSeq.sorted}")
      else None
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  /** MapType (dynamic-key) instances: locations for the runtime-key paths.
    * Key-specific keywords that iterate the map at runtime aggregate the
    * offending keys into the MESSAGE (instance location stays at the map)
    * except additionalProperties/patternProperties value checks, which
    * pin to the failing entry like the struct path. */
  test("pinned MapType locations") {
    import org.apache.spark.sql.functions.{col => c}
    def mapRows(schemaJson: String, pairs: (String, Long)*): Set[(String, String, String, String)] = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(pairs.toMap)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType)))))
      df.select(explode(RowValidator.violationsColumn(df, schemaJson,
          opts = CompileOpts(nullIsAbsent = false))).as("v"))
        .select(c("v.keyword"), c("v.keywordLocation"), c("v.instanceLocation"),
          c("v.message"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet
    }
    assert(mapRows("""{"required": ["miss"]}""", "a" -> 1L) ===
      Set(("required", "#/required", "#", "missing required property \"miss\"")))
    assert(mapRows(
      """{"properties": {"a": true}, "unevaluatedProperties": false}""",
      "a" -> 1L, "b" -> 2L, "z" -> 3L) ===
      Set(("unevaluatedProperties", "#/unevaluatedProperties", "#",
        "unevaluated properties: b,z")))
    assert(mapRows("""{"minProperties": 3}""", "a" -> 1L) ===
      Set(("minProperties", "#/minProperties", "#",
        "object has fewer than 3 properties")))
  }

  // PROBE MODE (kept for future additions): print the actual triples.
  ignore("probe: dump location triples") {
    val scenarios: Seq[(String, String, String)] = Seq(
      ("top-level type", """{"type": "string"}""", """5"""),
      ("top-level two failures", """{"type": "integer", "minimum": 10}""", """5.5"""),
      ("property leaf", """{"properties": {"a": {"type": "string"}}}""", """{"a": 5}"""),
      ("nested property leaf",
        """{"properties": {"a": {"properties": {"b": {"type": "string"}}}}}""",
        """{"a": {"b": 5}}"""),
      ("required", """{"required": ["miss"]}""", """{"a": 1}"""),
      ("items element",
        """{"properties": {"tokens": {"items": {"type": "number"}}}}""",
        """{"tokens": ["x", "y"]}"""),
      ("items bounds",
        """{"properties": {"tokens": {"items": {"minimum": 10}}}}""",
        """{"tokens": [1, 20, 2]}"""),
      ("prefixItems", """{"prefixItems": [{"type": "string"}, {"type": "number"}]}""",
        """[5, 6]"""),
      ("allOf member", """{"allOf": [{"type": "number"}, {"minimum": 10}]}""", """5"""),
      ("anyOf none", """{"anyOf": [{"type": "string"}, {"minimum": 10}]}""", """5"""),
      ("oneOf none", """{"oneOf": [{"type": "string"}, {"minimum": 10}]}""", """5"""),
      ("oneOf too many", """{"oneOf": [{"type": "number"}, {"minimum": 1}]}""", """5"""),
      ("not", """{"not": {"type": "number"}}""", """5"""),
      ("if-then", """{"if": {"type": "number"}, "then": {"minimum": 10}}""", """5"""),
      ("if-else", """{"if": {"type": "string"}, "else": {"minimum": 10}}""", """5"""),
      ("ref leaf", """{"$ref": "#/$defs/s", "$defs": {"s": {"type": "string"}}}""", """5"""),
      ("ref property",
        """{"properties": {"a": {"$ref": "#/$defs/s"}}, "$defs": {"s": {"type": "string"}}}""",
        """{"a": 5}"""),
      ("additionalProperties",
        """{"properties": {"a": true}, "additionalProperties": {"type": "string"}}""",
        """{"a": 1, "b": 2}"""),
      ("patternProperties",
        """{"patternProperties": {"^a": {"type": "string"}}}""", """{"ax": 5}"""),
      ("propertyNames", """{"propertyNames": {"maxLength": 1}}""", """{"long": 1}"""),
      ("unevaluatedProperties",
        """{"properties": {"a": true}, "unevaluatedProperties": false}""",
        """{"a": 1, "b": 2}"""),
      ("contains", """{"contains": {"type": "string"}}""", """[1, 2]"""),
      ("uniqueItems", """{"uniqueItems": true}""", """[1, 1]"""),
      ("deep mix",
        """{"properties": {"o": {"allOf": [{"properties": {"x": {"type": "string"}}}]}}}""",
        """{"o": {"x": 5}}"""),
      ("dependentRequired", """{"dependentRequired": {"a": ["b"]}}""", """{"a": 1}"""),
      ("dependentSchemas leaf",
        """{"dependentSchemas": {"a": {"properties": {"b": {"type": "string"}}}}}""",
        """{"a": 1, "b": 2}"""),
      ("maxItems", """{"maxItems": 1}""", """[1, 2]"""),
      ("minLength property", """{"properties": {"a": {"minLength": 5}}}""", """{"a": "x"}"""),
      ("pattern property", """{"properties": {"a": {"pattern": "^z"}}}""", """{"a": "x"}"""),
      ("enum property", """{"properties": {"a": {"enum": ["p", "q"]}}}""", """{"a": "x"}"""),
      ("const", """{"const": 3}""", """5"""),
      ("multipleOf", """{"multipleOf": 2}""", """5"""),
      ("nested items", """{"items": {"items": {"type": "number"}}}""", """[["x"]]"""),
      ("unevaluatedItems", """{"prefixItems": [true], "unevaluatedItems": false}""",
        """[1, 2]"""),
      ("minProperties", """{"minProperties": 2}""", """{"a": 1}"""),
      ("then through properties",
        """{"properties": {"a": {"if": {"type": "number"}, "then": {"minimum": 9}}}}""",
        """{"a": 5}"""),
      ("allOf inside items",
        """{"items": {"allOf": [{"type": "number"}, {"maximum": 1}]}}""", """[5]"""),
      ("dynamicRef leaf",
        """{"$id": "https://example.test/loc/r", "type": "array",
           "items": {"$dynamicRef": "#it"},
           "$defs": {"f": {"$dynamicAnchor": "it", "type": "string"}}}""",
        """[5]"""))
    scenarios.foreach { case (name, s, d) =>
      info(s"== $name")
      rows(s, j(d)).toSeq.sorted.foreach { case (k, kl, il) =>
        info(s"   ($k, $kl, $il)")
      }
    }
  }
}
