#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases24.json — round-5 batch #2:
the official suite's ANNOTATION-INDEPENDENCE families (additionalProperties
and items must NOT see inside allOf — only unevaluated* keywords read
cross-schema annotations), $ref-mediated annotation flow for unevaluated*,
boolean dependentSchemas, and assorted canonical edges cases23 did not
cover. Same authoring caveat as gen_cases23.py (official suite not
fetchable offline; shapes re-authored from its well-known cases).
Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# --------------------------------------------- annotation independence
g("additionalProperties does not see inside allOf (strictly local)",
  {"allOf": [{"properties": {"foo": {}}}], "additionalProperties": False},
  [("property known only to the allOf branch is still additional",
    {"foo": 1}, False),
   ("empty object ok", {}, True)])

g("additionalProperties sees only same-schema properties/patternProperties",
  {"properties": {"foo": {}},
   "allOf": [{"properties": {"bar": {}}}],
   "additionalProperties": False},
  [("local property ok", {"foo": 1}, True),
   ("allOf-only property rejected by local additionalProperties",
    {"foo": 1, "bar": 2}, False)])

g("items does not see allOf prefixItems (applies from index 0)",
  {"allOf": [{"prefixItems": [{"type": "number"}]}],
   "items": {"type": "string"}},
  [("element 0 must satisfy BOTH the branch prefix and local items",
    [1.5], False),
   ("strings fail the branch's number prefix", ["x"], False),
   ("empty passes both", [], True)])

g("unevaluatedProperties DOES see inside allOf (the counterpart)",
  {"allOf": [{"properties": {"foo": {}}}],
   "unevaluatedProperties": False},
  [("allOf-evaluated property is not unevaluated", {"foo": 1}, True)])

# ------------------------------------------- unevaluated* through $ref
g("unevaluatedProperties sees properties evaluated through $ref",
  {"$defs": {"base": {"properties": {"foo": {}}}},
   "$ref": "#/$defs/base",
   "unevaluatedProperties": False},
  [("ref-evaluated", {"foo": 1}, True),
   ("not evaluated anywhere", {"foo": 1, "bar": 2}, False)])

g("unevaluatedItems sees prefixItems evaluated through $ref",
  {"$defs": {"base": {"prefixItems": [{"type": "number"}]}},
   "$ref": "#/$defs/base",
   "unevaluatedItems": False},
  [("covered by the ref's prefix", [1], True),
   ("tail uncovered", [1, 2], False)])

g("unevaluatedProperties with additionalProperties true evaluates all",
  {"properties": {"foo": {}}, "additionalProperties": True,
   "unevaluatedProperties": False},
  [("additionalProperties true covers the rest", {"foo": 1, "bar": 2}, True)])

g("unevaluatedProperties with patternProperties coverage",
  {"patternProperties": {"^v": {}}, "unevaluatedProperties": False},
  [("pattern-covered", {"vroom": 1}, True),
   ("uncovered", {"bar": 1}, False),
   ("mixed", {"vroom": 1, "bar": 2}, False)])

# ------------------------------------------------- boolean subschemas
g("dependentSchemas with boolean subschemas",
  {"dependentSchemas": {"foo": False, "bar": True}},
  [("foo present triggers false schema", {"foo": 1}, False),
   ("bar present triggers true schema", {"bar": 1}, True),
   ("neither trigger", {"baz": 1}, True)])

g("propertyNames with pattern",
  {"propertyNames": {"pattern": "^a"}},
  [("all keys match", {"alpha": 1, "apex": 2}, True),
   ("one key does not", {"alpha": 1, "beta": 2}, False)])

g("additionalProperties schema form validates the extras",
  {"properties": {"foo": {}},
   "additionalProperties": {"type": "number"}},
  [("extra is a number", {"foo": "x", "bar": 2}, True),
   ("extra is a string", {"foo": "x", "bar": "y"}, False)])

# ------------------------------------------------------ const / enum
g("const empty object and empty array are specific values",
  {"properties": {"o": {"const": {}}, "a": {"const": []}}},
  [("exact empties", {"o": {}, "a": []}, True),
   ("non-empty array", {"o": {}, "a": [1]}, False)])

g("enum containing null",
  {"enum": [None, "x"]},
  [("null member", None, True), ("string member", "x", True),
   ("other", "y", False)])

# ----------------------------------------------------------- numeric
g("multipleOf integer factor on float data",
  {"multipleOf": 2},
  [("4.0 ok", 4.0, True), ("5.0 fails", 5.0, False),
   ("4.5 fails", 4.5, False)])

g("minItems/maxItems window; string keywords ignore arrays",
  {"minItems": 1, "maxItems": 2, "minLength": 100},
  [("one ok (minLength ignores arrays)", [1], True),
   ("empty fails", [], False),
   ("three fails", [1, 2, 3], False)])

# --------------------------------------------------------- combinators
g("oneOf nested inside not",
  {"not": {"oneOf": [{"type": "integer"}, {"minimum": 2}]}},
  [("both-match input passes the not", 3, True),
   ("neither-match input passes the not", 1.5, True),
   ("exactly-one fails the not", 1, False)])

g("allOf of boolean schemas",
  {"allOf": [True, {"type": "number"}]},
  [("number", 1, True), ("string", "x", False)])

g("anyOf with a false branch",
  {"anyOf": [False, {"type": "number"}]},
  [("number via the live branch", 1, True),
   ("string fails both", "x", False)])

g("oneOf with a true and a false branch",
  {"oneOf": [True, False]},
  [("exactly the true branch matches", "anything", True)])

# ------------------------------------------------------- if/then chains
g("if/then inside allOf branches compose",
  {"allOf": [
      {"if": {"minimum": 10}, "then": {"multipleOf": 2}},
      {"if": {"minimum": 100}, "then": {"multipleOf": 5}}]},
  [("small number: no branch triggers", 3, True),
   ("mid: first branch only", 12, True),
   ("mid odd fails first then", 13, False),
   ("large: both trigger, 110 ok", 110, True),
   ("large: 112 fails the second then", 112, False)])

g("if with $ref condition",
  {"$defs": {"isNum": {"type": "number"}},
   "if": {"$ref": "#/$defs/isNum"}, "then": {"minimum": 0},
   "else": {"type": "string"}},
  [("number routes to then", 1, True),
   ("negative number fails then", -1, False),
   ("string routes to else", "x", True),
   ("boolean fails else", True, False)])

# -------------------------------------------------------- deep nesting
g("contains with object element schema",
  {"contains": {"properties": {"v": {"minimum": 5}}, "required": ["v"]}},
  [("one element passes the subschema", [{"v": 6}, {"v": 1}], True),
   ("no element passes", [{"v": 1}, {"v": 2}], False)])

g("patternProperties multiple overlapping patterns both apply",
  {"patternProperties": {"^a": {"type": "number"}, "o$": {"maximum": 3}}},
  [("both patterns match 'ao': must be number <= 3", {"ao": 2}, True),
   ("violates the maximum pattern", {"ao": 5}, False),
   ("only first pattern", {"ax": 7}, True),
   ("only second pattern", {"xo": 2}, True)])

g("items schema applies to every element",
  {"items": {"type": "number", "minimum": 0}},
  [("all pass", [0, 1, 2.5], True), ("one negative", [0, -1], False),
   ("empty ok", [], True)])

g("required multiple keys",
  {"required": ["a", "b"]},
  [("both", {"a": 1, "b": 2}, True), ("one missing", {"a": 1}, False),
   ("extra keys fine", {"a": 1, "b": 2, "c": 3}, True)])

with open("src/test/resources/conformance/cases24.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
