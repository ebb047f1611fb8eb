#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases25.json — round-5 batch #3:
numeric representation edges (-0.0, near-max doubles), minContains > 1,
contains/prefixItems/unevaluatedItems triple interplay, annotations never
escaping a failed (`not`-wrapped) schema, deep $id/anchor composition,
per-element if/then, and no-op keyword forms. Same authoring caveat as
gen_cases23.py. Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# ------------------------------------------------------ numeric edges
g("negative zero equals zero for numeric keywords",
  {"properties": {"c": {"const": 0}, "m": {"minimum": 0}}},
  [("-0.0 is const-equal and bound-equal to 0", {"c": -0.0, "m": -0.0}, True),
   ("positive zero too", {"c": 0.0, "m": 0.0}, True)])

g("bounds near the double max",
  {"maximum": 1.0e308},
  [("under", 9.9e307, True), ("over", 1.5e308, False)])

g("exclusiveMinimum crosses int/float representation",
  {"exclusiveMinimum": 2},
  [("2.0 is the boundary, excluded", 2.0, False),
   ("2.5 ok", 2.5, True)])

# ---------------------------------------------------- contains family
g("minContains 2 requires two matches",
  {"contains": {"minimum": 5}, "minContains": 2},
  [("two matches", [5, 6, 1], True), ("one match", [5, 1], False),
   ("none", [1, 2], False)])

g("maxContains without contains is a no-op",
  {"maxContains": 1},
  [("many elements fine", [1, 2, 3], True)])

g("contains + prefixItems + unevaluatedItems triple interplay",
  {"prefixItems": [{"type": "number"}],
   "contains": {"minimum": 100},
   "unevaluatedItems": False},
  [("prefix covers 0, contains covers the 100", [1, 100], True),
   ("tail element matched by neither is unevaluated", [1, 100, 2], False),
   ("prefix-only array fails contains", [1], False)])

# ------------------------------------- annotations never escape failure
g("annotations inside a not-wrapped schema never escape",
  {"not": {"properties": {"x": {}}, "required": ["zzz"]},
   "unevaluatedProperties": False},
  [("the failed inner schema contributes no evaluation of x",
    {"x": 1}, False),
   ("empty object: not passes, nothing to evaluate", {}, True)])

g("annotations from a FAILED oneOf branch never escape",
  {"oneOf": [
      {"properties": {"a": {}}, "required": ["a", "b"]},
      {"properties": {"c": {}}, "required": ["c"]}],
   "unevaluatedProperties": False},
  [("second branch wins; first branch's 'a' annotation is dropped",
    {"a": 1, "c": 2}, False),
   ("clean second-branch object", {"c": 1}, True)])

# -------------------------------------------------- $id / anchor depth
g("pointer ref into an embedded $id resource",
  {"$id": "https://example.test/c25/root",
   "$defs": {"inner": {"$id": "inner",
                       "$defs": {"leaf": {"type": "number", "minimum": 3}}}},
   "$ref": "inner#/$defs/leaf"},
  [("meets the leaf constraint", 4, True),
   ("below the leaf minimum", 2, False)])

g("absolute-URI anchor reference",
  {"$id": "https://example.test/c25/anch",
   "$defs": {"t": {"$anchor": "target", "type": "string"}},
   "properties": {"v": {"$ref": "https://example.test/c25/anch#target"}}},
  [("string ok", {"v": "x"}, True), ("number fails", {"v": 1}, False)])

# ------------------------------------------------- per-element if/then
g("if/then inside items applies per element",
  {"items": {"if": {"minimum": 10}, "then": {"multipleOf": 2}}},
  [("small elements unconstrained, large even ok", [3, 12], True),
   ("large odd element fails its own then", [3, 13], False),
   ("all small", [1, 2, 3], True)])

# ------------------------------------------------------- no-op forms
g("empty required and empty dependentRequired lists are no-ops",
  {"required": [], "dependentRequired": {"foo": []}},
  [("anything", {"foo": 1}, True), ("empty object", {}, True)])

g("single-member type array behaves like the bare form",
  {"type": ["integer"]},
  [("integer", 3, True), ("float", 3.5, False)])

g("allOf with duplicate subschemas is just the schema once",
  {"allOf": [{"minimum": 2}, {"minimum": 2}]},
  [("passes both copies", 3, True), ("fails both copies", 1, False)])

# ----------------------------------------------------- nesting depth
g("items of items (matrix constraints)",
  {"items": {"items": {"minimum": 0}}},
  [("all non-negative", [[0, 1], [2]], True),
   ("inner negative", [[0, -1]], False),
   ("empty matrix", [], True)])

g("uniqueItems over booleans",
  {"uniqueItems": True},
  [("duplicate booleans", [True, True], False),
   ("distinct booleans", [True, False], True)])

g("patternProperties with regex metacharacters in the pattern",
  {"patternProperties": {"^data\\.[0-9]+$": {"type": "number"}}},
  [("dotted key matches literally", {"data.1": 5}, True),
   ("pattern key wrong type", {"data.1": "x"}, False),
   ("'dataX1' does not match the escaped dot", {"dataX1": "x"}, True)])

g("propertyNames combined with additionalProperties",
  {"propertyNames": {"pattern": "^[ab]"},
   "additionalProperties": {"type": "number"}},
  [("key shape and value type both hold", {"alpha": 1}, True),
   ("bad key shape", {"x": 1}, False),
   ("bad value type", {"alpha": "s"}, False)])

g("deeply chained refs through three hops",
  {"$defs": {"a": {"$ref": "#/$defs/b"},
             "b": {"$ref": "#/$defs/c"},
             "c": {"type": "integer", "maximum": 9}},
   "properties": {"v": {"$ref": "#/$defs/a"}}},
  [("within bounds", {"v": 5}, True),
   ("over the max", {"v": 11}, False),
   ("wrong type", {"v": 1.5}, False)])

with open("src/test/resources/conformance/cases25.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
