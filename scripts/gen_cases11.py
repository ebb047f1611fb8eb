#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases11.json — round-3 batch #2:
annotation-only content* keywords (reference: ValidateTrue,
pkg/draft202012/keywords.go:344-363), the official suite's strict-tree
$dynamicRef case, `not` compositions, array-bound edges, cross-type equality
in enum/const/uniqueItems (reference compares JSON values numerically,
never across types), propertyNames compositions, numeric boundary semantics,
and lone if/then/else members. Deterministic; run and commit the output."""
import json

groups = []

def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})

# ------------------------------------------------- content* never assert
g("contentEncoding is annotation-only (keywords.go:344-349 ValidateTrue)",
  {"type": "string", "contentEncoding": "base64"},
  [("valid base64", "aGVsbG8=", True),
   ("NOT base64 still valid", "not-base-64!!", True),
   ("non-string fails type, not content", 12, False)])
g("contentMediaType + contentSchema are annotation-only (keywords.go:351-363)",
  {"contentMediaType": "application/json",
   "contentSchema": {"type": "object", "required": ["k"]}},
  [("valid embedded json", "{\"k\": 1}", True),
   ("invalid per contentSchema still valid", "{}", True),
   ("not even json still valid", "{", True),
   ("non-string is fine too (no type here)", 5, True)])

# ------------------------------------------------- strict-tree ($dynamicRef)
g("strict-tree: $dynamicAnchor overrides extended tree ($dynamicRef + unevaluatedProperties)",
  {"$id": "https://example.com/strict-tree",
   "$dynamicAnchor": "node",
   "$ref": "tree",
   "unevaluatedProperties": False,
   "$defs": {
       "tree": {
           "$id": "https://example.com/tree",
           "$dynamicAnchor": "node",
           "type": "object",
           "properties": {
               "data": True,
               "children": {"type": "array",
                            "items": {"$dynamicRef": "#node"}}}}}},
  [("plain tree instance", {"data": 1, "children": []}, True),
   ("nested child ok", {"data": 1, "children": [{"data": 2, "children": []}]}, True),
   ("extra property at root rejected by the strict override",
    {"data": 1, "daat": 1, "children": []}, False),
   ("extra property in a NESTED node rejected (dynamic scope reaches down)",
    {"data": 1, "children": [{"daat": 2, "children": []}]}, False)])

# ------------------------------------------------- not compositions
g("double negation not(not(type)) asserts the inner type",
  {"not": {"not": {"type": "integer"}}},
  [("integer passes", 3, True), ("string fails", "x", False)])
g("not with boolean schema true = nothing valid",
  {"not": True},
  [("int", 1, False), ("null", None, False), ("object", {}, False)])
g("not with boolean schema false = everything valid",
  {"not": False},
  [("int", 1, True), ("null", None, True)])
g("not over if/then: negation sees the conditional outcome",
  {"not": {"if": {"type": "integer"}, "then": {"minimum": 10}}},
  [("integer >= 10 satisfies inner, so not fails", 12, False),
   ("integer < 10 fails inner then, so not passes", 3, True),
   ("non-integer vacuously satisfies inner (if false, no else), not fails", "s", False)])
g("not combined with sibling assertion: both must hold",
  {"type": "integer", "not": {"multipleOf": 3}},
  [("non-multiple ok", 4, True), ("multiple rejected", 9, False),
   ("wrong type rejected by sibling", "x", False)])

# ------------------------------------------------- array bound edges
g("minItems 0 / maxItems 0 pin the empty array",
  {"minItems": 0, "maxItems": 0},
  [("empty ok", [], True), ("one item too many", [1], False),
   ("non-array ignored", "xx", True)])
g("equal min/maxItems = exact length",
  {"minItems": 3, "maxItems": 3},
  [("exactly 3", [1, 2, 3], True), ("2 too short", [1, 2], False),
   ("4 too long", [1, 2, 3, 4], False)])
g("uniqueItems: numeric equality is value-based (1 == 1.0)",
  {"uniqueItems": True},
  [("1 and 1.0 are duplicates", [1, 1.0], False),
   ("0 and -0 are duplicates", [0, -0.0], False),
   ("nested arrays compared deep", [[1, 2], [1, 2]], False),
   ("objects compared deep", [{"a": 1, "b": 2}, {"a": 1, "b": 2}], False),
   ("objects differing in one value ok", [{"a": 1, "b": 2}, {"a": 1, "b": 3}], True),
   ("distinct nested ok", [[1, 2], [2, 1]], True),
   ("empty array trivially unique", [], True)])

# ------------------------------------------------- propertyNames compositions
g("propertyNames with maxLength and pattern combined",
  {"propertyNames": {"maxLength": 3, "pattern": "^[a-z]+$"}},
  [("short lowercase keys ok", {"abc": 1, "de": 2}, True),
   ("too-long key", {"abcd": 1}, False),
   ("uppercase key", {"ABC": 1}, False),
   ("empty object ok", {}, True),
   ("non-object ignored", [1], True)])
g("propertyNames with enum restricts keys to a fixed set",
  {"propertyNames": {"enum": ["a", "b"]}},
  [("allowed keys", {"a": 1, "b": 2}, True),
   ("stray key", {"c": 3}, False)])

# ------------------------------------------------- numeric boundary semantics
g("minimum/maximum are inclusive at the boundary",
  {"minimum": 2.5, "maximum": 7.5},
  [("at min", 2.5, True), ("at max", 7.5, True),
   ("below", 2.4999, False), ("above", 7.5001, False)])
g("exclusiveMinimum/Maximum reject the boundary itself",
  {"exclusiveMinimum": 2, "exclusiveMaximum": 7},
  [("at exclusive min", 2, False), ("at exclusive max", 7, False),
   ("inside", 3, True)])
g("minimum 0 accepts -0 (numeric equality)",
  {"minimum": 0},
  [("-0.0 equals 0", -0.0, True), ("tiny negative fails", -1e-9, False)])
g("multipleOf with binary-exact float divisor",
  {"multipleOf": 1.5},
  [("exact multiple", 4.5, True), ("not a multiple", 4.0, False),
   ("zero is a multiple", 0, True),
   ("integer-typed multiple", 3, True)])
g("integer type accepts integral-valued floats (reference float64 model)",
  {"type": "integer"},
  [("1.0 is integral", 1.0, True), ("1e2 is integral", 1e2, True),
   ("1.5 is not", 1.5, False)])

# ------------------------------------------------- enum/const cross-type equality
g("enum numeric equality crosses int/float but never bool",
  {"enum": [1, "x", [2, 3]]},
  [("1.0 matches enum value 1", 1.0, True),
   ("true does not match 1", True, False),
   ("deep array match", [2, 3], True),
   ("deep array order matters", [3, 2], False),
   ("string match", "x", True),
   ("near miss", "y", False)])
g("const object compares deep",
  {"const": {"a": [{"b": 2}, {"b": 4}]}},
  [("same structure", {"a": [{"b": 2}, {"b": 4}]}, True),
   ("nested value differs", {"a": [{"b": 2}, {"b": 3}]}, False),
   ("extra key", {"a": [{"b": 2}, {"b": 4}], "c": 0}, False)])
g("const 0 equals -0 and 0.0",
  {"const": 0},
  [("0.0", 0.0, True), ("-0.0", -0.0, True), ("false is not 0", False, False)])

# ------------------------------------------------- required/empty-vector edges
g("required [] asserts nothing",
  {"type": "object", "required": []},
  [("empty object", {}, True), ("any object", {"x": 1}, True)])
g("required is case-sensitive",
  {"required": ["Key"]},
  [("exact case present", {"Key": 1}, True),
   ("wrong case absent", {"key": 1}, False)])

# ------------------------------------------------- lone conditional members
g("then without if is annotation-only",
  {"then": {"minimum": 100}},
  [("value violating the orphan then is still valid", 5, True)])
g("else without if is annotation-only",
  {"else": {"minimum": 100}},
  [("value violating the orphan else is still valid", 5, True)])
g("if without then/else asserts nothing but still evaluates (coverage)",
  {"if": {"properties": {"a": {"type": "integer"}}},
   "unevaluatedProperties": {"type": "string"}},
  [("if-branch passes: a is covered by the if subschema",
    {"a": 1, "b": "s"}, True),
   ("if-branch fails: a is NOT covered, must satisfy unevaluated string",
    {"a": "not-int"}, True),
   ("if-branch fails: integer b must satisfy unevaluated string",
    {"a": "not-int", "b": 2}, False)])

# ------------------------------------------------- $defs-in-$defs anchors
g("$ref to a $defs schema nested inside another $defs schema",
  {"$ref": "#/$defs/outer/$defs/inner",
   "$defs": {"outer": {"$defs": {"inner": {"type": "boolean"}}}}},
  [("boolean ok", True, True), ("string not", "x", False)])
g("$anchor defined deep in $defs is addressable from the root",
  {"$ref": "#deep",
   "$defs": {"a": {"$defs": {"b": {"$anchor": "deep", "const": 42}}}}},
  [("const match", 42, True), ("mismatch", 41, False)])

out = {"groups": groups}
n = sum(len(x["tests"]) for x in groups)
print(f"{len(groups)} groups, {n} instances")
with open("src/test/resources/conformance/cases11.json", "w") as f:
    json.dump(groups, f, indent=1)
