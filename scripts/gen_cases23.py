#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases23.json — round-5 batch:
adversarial groups reproduced from the official draft2020-12 required
suite's canonical shapes (the reference vendors that suite,
internal/cmd/testgen/testgen.go:21-44; this sandbox has no network, so the
groups are re-authored here from the suite's well-known cases rather than
vendored verbatim — BASELINE.md discloses the difference). Instances whose
data is a heterogeneous array ([1, "foo"]) are structurally inapplicable
(Spark arrays are homogeneous) and are skipped at authoring time with the
other skip-list reasons noted inline. Deterministic; run and commit the
output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# ------------------------------------------------------------- boolean schemas
g("boolean schema true accepts everything",
  True,
  [("number", 1, True), ("string", "foo", True), ("object", {"a": 1}, True),
   ("null", None, True), ("array", [1], True)])

g("boolean schema false rejects everything",
  False,
  [("number", 1, False), ("empty object", {}, False), ("null", None, False)])

g("not with empty schema rejects everything",
  {"not": {}},
  [("number", 1, False), ("string", "x", False)])

g("not with false schema accepts everything",
  {"not": False},
  [("number", 1, True), ("object", {"a": 1}, True)])

g("double negation",
  {"not": {"not": {"type": "number"}}},
  [("number ok", 3.5, True), ("string fails", "x", False)])

# ----------------------------------------------------------------------- type
g("union type integer-or-string",
  {"type": ["integer", "string"]},
  [("integer ok", 1, True), ("string ok", "x", True),
   ("float fails", 1.5, False), ("boolean fails", True, False),
   ("null fails", None, False)])

g("a float with zero fractional part is an integer",
  {"type": "integer"},
  [("1.0 is an integer", 1.0, True), ("1.5 is not", 1.5, False)])

g("type boolean is not 0/1, type null only null",
  {"properties": {"b": {"type": "boolean"}, "n": {"type": "null"}}},
  [("real boolean", {"b": True, "n": None}, True),
   ("zero is not boolean", {"b": 0, "n": None}, False)])

# ----------------------------------------------------------------- enum/const
g("enum numeric membership crosses int/float representation",
  {"enum": [0, 2.5]},
  [("0 matches", 0, True), ("0.0 matches", 0.0, True),
   ("2.5 matches", 2.5, True), ("false does not match enum 0", False, False),
   ("1 does not", 1, False)])

g("enum with object member uses deep equality",
  {"enum": [{"a": 1}]},
  [("equal object", {"a": 1}, True), ("different value", {"a": 2}, False)])

g("enum with array member",
  {"enum": [["a"]]},
  [("equal array", ["a"], True), ("longer array", ["a", "b"], False)])

g("const 2 matches 2.0 (JSON number equality)",
  {"const": 2},
  [("2 ok", 2, True), ("2.0 ok", 2.0, True), ("3 fails", 3, False),
   ("true is not 1-ish", True, False)])

g("const object is field-order independent",
  {"const": {"a": 1, "b": 2}},
  [("same order", {"a": 1, "b": 2}, True),
   ("reversed order", {"b": 2, "a": 1}, True),
   ("different value", {"a": 1, "b": 3}, False)])

g("const null and const false are distinct from 0",
  {"properties": {"n": {"const": None}, "f": {"const": False}}},
  [("exact", {"n": None, "f": False}, True),
   ("zero is not false", {"n": None, "f": 0}, False)])

g("const nested array deep equality",
  {"const": [[1, 2]]},
  [("equal", [[1, 2]], True), ("inner differs", [[1, 3]], False)])

# -------------------------------------------------------------------- numeric
g("multipleOf half",
  {"multipleOf": 0.5},
  [("4.5 ok", 4.5, True), ("4.75 fails", 4.75, False),
   ("ignores non-numbers", "x", True)])

g("exclusive bounds",
  {"exclusiveMinimum": 1.1, "exclusiveMaximum": 3.0},
  [("interior ok", 2.2, True), ("lower boundary fails", 1.1, False),
   ("upper boundary fails", 3.0, False)])

g("minimum matches its own boundary",
  {"minimum": -2},
  [("boundary ok", -2.0, True), ("below fails", -2.5, False)])

# -------------------------------------------------------------------- strings
g("length counts code points, not UTF-16 units",
  {"minLength": 2, "maxLength": 2},
  [("two ascii", "ab", True),
   ("one supplementary code point is not long enough", "\U0001F4A9", False),
   ("two supplementary code points", "\U0001F4A9\U0001F4A9", True),
   ("three fails", "abc", False)])

g("pattern is unanchored and applies only to strings",
  {"pattern": "a+"},
  [("match inside", "xaay", True), ("no match", "xyz", False),
   ("non-string ignored", 1, True)])

# --------------------------------------------------------------------- arrays
g("prefixItems positional constraints",
  {"prefixItems": [{"minimum": 3}, {"maximum": 2}]},
  [("both satisfied", [4, 1], True), ("first violated", [2, 1], False),
   ("second violated", [4, 5], False),
   ("shorter array only checks present positions", [4], True),
   ("extra items unconstrained", [4, 1, 99], True)])

g("items false with prefixItems forbids extra items",
  {"prefixItems": [{"type": "number"}], "items": False},
  [("exactly the prefix", [1], True), ("one extra", [1, 2], False),
   ("empty ok", [], True)])

g("contains basics",
  {"contains": {"minimum": 5}},
  [("has a match", [3, 4, 5], True), ("no match", [1, 2], False),
   ("empty has no match", [], False)])

g("minContains 0 makes empty valid; maxContains caps matches",
  {"contains": {"minimum": 5}, "minContains": 0, "maxContains": 1},
  [("empty ok with minContains 0", [], True),
   ("one match ok", [5, 1], True),
   ("two matches exceed maxContains", [5, 6], False)])

g("uniqueItems crosses numeric representation and nests",
  {"uniqueItems": True},
  [("1 and 1.0 are duplicates", [1, 1.0], False),
   ("distinct numbers", [1, 2], True),
   ("duplicate objects", [{"a": 1}, {"a": 1}], False),
   ("distinct objects", [{"a": 1}, {"a": 2}], True),
   ("duplicate nested arrays", [[1], [1]], False)])

g("unevaluatedItems with prefixItems",
  {"prefixItems": [{"type": "number"}], "unevaluatedItems": False},
  [("covered", [1], True), ("uncovered tail", [1, 2], False)])

g("contains-matched items are evaluated for unevaluatedItems",
  {"contains": {"minimum": 5}, "unevaluatedItems": False},
  [("all items match contains", [5, 6], True),
   ("non-matching item is unevaluated", [5, 1], False)])

# -------------------------------------------------------------------- objects
g("properties, patternProperties, additionalProperties interaction",
  {"properties": {"foo": {}},
   "patternProperties": {"^v": {"type": "number"}},
   "additionalProperties": False},
  [("known property", {"foo": 1}, True),
   ("pattern property ok", {"vroom": 2}, True),
   ("pattern property wrong type", {"vroom": "x"}, False),
   ("unknown property", {"bar": 1}, False)])

g("propertyNames constrains keys",
  {"propertyNames": {"maxLength": 3}},
  [("short keys", {"foo": 1}, True), ("long key", {"foooo": 1}, False),
   ("ignores non-objects", [1], True)])

g("required ignores non-objects; dependentRequired triggers on presence",
  {"required": ["a"], "dependentRequired": {"bar": ["foo"]}},
  [("non-object ok", 1, True),
   ("bar brings foo", {"a": 1, "bar": 2, "foo": 3}, True),
   ("bar without foo", {"a": 1, "bar": 2}, False),
   ("foo alone fine", {"a": 1, "foo": 2}, True),
   ("missing required a", {"foo": 2}, False)])

g("dependentSchemas applies its schema when the key is present",
  {"dependentSchemas": {"bar": {"properties": {"foo": {"minimum": 5}}}}},
  [("no trigger", {"foo": 1}, True),
   ("trigger satisfied", {"bar": 1, "foo": 7}, True),
   ("trigger violated", {"bar": 1, "foo": 1}, False)])

g("maxProperties 0 means empty object",
  {"maxProperties": 0},
  [("empty ok", {}, True), ("one property", {"a": 1}, False)])

g("min/maxProperties window",
  {"minProperties": 1, "maxProperties": 2},
  [("one ok", {"a": 1}, True), ("empty fails", {}, False),
   ("three fails", {"a": 1, "b": 2, "c": 3}, False)])

# --------------------------------------------------------- unevaluated combos
g("unevaluatedProperties with adjacent properties",
  {"properties": {"foo": {"type": "string"}}, "unevaluatedProperties": False},
  [("only known", {"foo": "a"}, True),
   ("extra property", {"foo": "a", "bar": 1}, False)])

g("unevaluatedProperties sees through allOf",
  {"allOf": [{"properties": {"foo": {}}}], "unevaluatedProperties": False},
  [("covered by the allOf branch", {"foo": 1}, True),
   ("uncovered", {"foo": 1, "bar": 2}, False)])

g("unevaluatedProperties counts only VALID anyOf branches",
  {"anyOf": [
      {"required": ["foo"], "properties": {"foo": {"type": "number"}}},
      {"required": ["bar"], "properties": {"bar": {"type": "number"}}}],
   "unevaluatedProperties": False},
  [("first branch covers foo", {"foo": 1}, True),
   ("both branches valid cover both", {"foo": 1, "bar": 2}, True),
   ("bar fails its branch so stays unevaluated", {"foo": 1, "bar": "x"}, False)])

g("unevaluatedProperties with if/then/else annotation flow",
  {"if": {"properties": {"foo": {"type": "number"}}, "required": ["foo"]},
   "then": {"properties": {"bar": {}}},
   "else": {"properties": {"baz": {}}},
   "unevaluatedProperties": False},
  [("if+then cover foo and bar", {"foo": 1, "bar": 2}, True),
   ("baz is unevaluated when then applies", {"foo": 1, "baz": 2}, False),
   ("else covers baz when if fails", {"baz": 1}, True),
   ("failed if contributes no annotations", {"foo": "s", "bar": 1}, False)])

g("nested unevaluatedProperties, outer false inner true",
  {"allOf": [{"unevaluatedProperties": True}],
   "unevaluatedProperties": False},
  [("inner true evaluates everything", {"foo": 1}, True),
   ("empty object trivially ok", {}, True)])

g("oneOf exactly-one with unevaluatedProperties",
  {"oneOf": [
      {"properties": {"a": {}}, "required": ["a"]},
      {"properties": {"b": {}}, "required": ["b"]}],
   "unevaluatedProperties": False},
  [("first branch only", {"a": 1}, True),
   ("both branches valid fails oneOf itself", {"a": 1, "b": 2}, False)])

# ---------------------------------------------------------------- combinators
g("oneOf requires exactly one branch",
  {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
  [("integer below 2: first only", 1, True),
   ("non-integer above 2: second only", 2.5, True),
   ("both match fails", 3, False),
   ("neither matches fails", 1.5, False)])

g("allOf combines with sibling keywords",
  {"properties": {"bar": {"type": "number"}}, "required": ["bar"],
   "allOf": [{"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
  [("both present", {"foo": "x", "bar": 1}, True),
   ("base missing", {"foo": "x"}, False),
   ("branch missing", {"bar": 1}, False)])

g("anyOf short-circuits nothing semantically",
  {"anyOf": [{"minimum": 4}, {"multipleOf": 2}]},
  [("first", 5, True), ("second", 2, True), ("both", 6, True),
   ("neither", 1.5, False)])

g("not over a union",
  {"not": {"type": ["integer", "boolean"]}},
  [("float ok", 1.5, True), ("string ok", "x", True),
   ("integer fails", 1, False), ("boolean fails", True, False)])

# ---------------------------------------------------------------- if/then/else
g("if alone has no effect",
  {"if": {"const": 0}},
  [("matching", 0, True), ("non-matching", 1, True)])

g("then/else without if are ignored",
  {"then": {"const": 0}, "else": {"const": 0}},
  [("anything", 7, True)])

g("boolean if selects the branch",
  {"if": True, "then": {"const": "yes"}, "else": {"const": "no"}},
  [("then applies", "yes", True), ("else ignored", "no", False)])

g("if false always takes else",
  {"if": False, "then": {"const": "yes"}, "else": {"const": "no"}},
  [("else applies", "no", True), ("then ignored", "yes", False)])

# ------------------------------------------------------------------------ ref
g("$ref with sibling keywords applies both (2020-12)",
  {"$defs": {"r": {"type": "number"}},
   "$ref": "#/$defs/r", "minimum": 5},
  [("both satisfied", 6, True), ("sibling violated", 4, False),
   ("ref violated", "x", False)])

g("$ref through $ref chains",
  {"$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"type": "number"}},
   "$ref": "#/$defs/a"},
  [("number ok", 1, True), ("string fails", "x", False)])

g("pointer escapes: ~0 ~1 and percent tokens",
  {"$defs": {"tilde~field": {"type": "integer"},
             "slash/field": {"type": "string"},
             "percent%field": {"type": "boolean"}},
   "properties": {
       "t": {"$ref": "#/$defs/tilde~0field"},
       "s": {"$ref": "#/$defs/slash~1field"},
       "p": {"$ref": "#/$defs/percent%25field"}}},
  [("all resolved", {"t": 1, "s": "x", "p": True}, True),
   ("tilde target enforces integer", {"t": 1.5, "s": "x", "p": True}, False),
   ("slash target enforces string", {"t": 1, "s": 2, "p": True}, False)])

g("$ref into a keyword subschema location",
  {"properties": {"a": {"type": "number", "minimum": 3}},
   "additionalProperties": {"$ref": "#/properties/a"}},
  [("both routed through the same subschema", {"a": 4, "b": 5}, True),
   ("additional below minimum", {"a": 4, "b": 1}, False)])

# ---------------------------------------------------------- annotations only
g("annotation keywords never validate",
  {"title": "t", "description": "d", "default": 42, "examples": [1, 2],
   "readOnly": True, "writeOnly": True, "deprecated": True,
   "$comment": "ignored"},
  [("anything goes", "whatever", True), ("numbers too", 0, True)])

g("unknown keywords are ignored",
  {"fooBarUnknownKeyword": {"type": "string"}, "type": "number"},
  [("known keyword still applies", 1, True),
   ("unknown never rejects", "x", False)])  # fails type, not the unknown kw

# ------------------------------------------------------ nested applicators
g("deeply nested applicator mix",
  {"allOf": [
      {"anyOf": [{"type": "number"}, {"type": "string"}]},
      {"not": {"type": "boolean"}},
      {"if": {"type": "number"}, "then": {"minimum": 0}}]},
  [("positive number", 1, True), ("string", "x", True),
   ("negative number trips then", -1, False)])

g("properties recursion through arrays of objects",
  {"properties": {
      "rows": {"type": "array",
               "items": {"type": "object",
                         "properties": {"v": {"minimum": 0}},
                         "required": ["v"]}}}},
  [("all rows valid", {"rows": [{"v": 1}, {"v": 2}]}, True),
   ("one row negative", {"rows": [{"v": 1}, {"v": -2}]}, False),
   ("empty rows", {"rows": []}, True)])

with open("src/test/resources/conformance/cases23.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
