#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases21.json — round-4 batch #2:
(a) `not`-wrapped and double-`not`-wrapped assertion schemas (verdict
inversion / restoration under the `not` applicator — the reference's
ValidateNot, internal/validator/validator.go ValidateNot), and
(b) unevaluatedProperties / unevaluatedItems CROSS-BRANCH coverage: which
applicator branches contribute evaluated-key/item annotations, gated on the
branch verdict (validator.go:647-710 coverage notes). Assertion-only base
schemas keep `not` annotation semantics trivially correct on both engines.
Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# ------------------------------------------------------------------ not-wrap
# (name, assertion-only schema, [(desc, instance, valid-under-plain)])
# Instances stay type-matched to the keyword so the reference's
# string-parses-as-number quirk never engages.
bases = [
    ("type string", {"type": "string"}, [("str", "x", True), ("num", 3.5, False)]),
    ("type number", {"type": "number"}, [("num", 3.5, True), ("str", "x", False)]),
    ("type object", {"type": "object"}, [("obj", {"a": 1}, True), ("arr", [1], False)]),
    ("type array", {"type": "array"}, [("arr", [1], True), ("obj", {"a": 1}, False)]),
    ("minimum", {"minimum": 10}, [("ge", 11.0, True), ("lt", 9.0, False)]),
    ("maximum", {"maximum": 10}, [("le", 9.0, True), ("gt", 11.0, False)]),
    ("exclusiveMinimum", {"exclusiveMinimum": 10}, [("gt", 10.5, True), ("eq", 10.0, False)]),
    ("exclusiveMaximum", {"exclusiveMaximum": 10}, [("lt", 9.5, True), ("eq", 10.0, False)]),
    ("multipleOf", {"multipleOf": 3}, [("mult", 9.0, True), ("non", 10.0, False)]),
    ("minLength", {"minLength": 3}, [("long", "abcd", True), ("short", "ab", False)]),
    ("maxLength", {"maxLength": 3}, [("short", "ab", True), ("long", "abcd", False)]),
    ("pattern", {"pattern": "^a"}, [("match", "ab", True), ("miss", "ba", False)]),
    ("const num", {"const": 5}, [("eq", 5.0, True), ("ne", 6.0, False)]),
    ("const str", {"const": "k"}, [("eq", "k", True), ("ne", "m", False)]),
    ("enum", {"enum": ["p", "q"]}, [("member", "p", True), ("other", "z", False)]),
    ("required", {"required": ["a"]}, [("has", {"a": 1}, True), ("missing", {"b": 1}, False)]),
    ("minProperties", {"minProperties": 2},
     [("two", {"a": 1, "b": 2}, True), ("one", {"a": 1}, False)]),
    ("maxProperties", {"maxProperties": 1},
     [("one", {"a": 1}, True), ("two", {"a": 1, "b": 2}, False)]),
    ("minItems", {"minItems": 2}, [("two", [1, 2], True), ("one", [1], False)]),
    ("maxItems", {"maxItems": 2}, [("two", [1, 2], True), ("three", [1, 2, 3], False)]),
    ("uniqueItems", {"uniqueItems": True}, [("uniq", [1, 2], True), ("dup", [1, 1], False)]),
    ("empty schema", {}, [("anything", 5.0, True)]),
    ("property assertion", {"properties": {"a": {"type": "number"}}},
     [("ok", {"a": 1}, True), ("bad", {"a": "x"}, False)]),
    ("items assertion", {"items": {"minimum": 0}},
     [("ok", [0, 1], True), ("bad", [-1, 1], False)]),
    ("allOf pair", {"allOf": [{"minimum": 0}, {"maximum": 10}]},
     [("in", 5.0, True), ("out", 11.0, False)]),
    ("anyOf pair", {"anyOf": [{"minimum": 10}, {"maximum": 0}]},
     [("hi", 11.0, True), ("mid", 5.0, False)]),
    ("oneOf pair", {"oneOf": [{"minimum": 0}, {"maximum": 10}]},
     [("one-match", 11.0, True), ("both-match", 5.0, False)]),
]

for name, schema, tests in bases:
    g(f"not inverts: {name}", {"not": schema},
      [(d, v, not ok) for (d, v, ok) in tests])
    g(f"double not restores: {name}", {"not": {"not": schema}}, list(tests))

# ------------------------------------- unevaluatedProperties cross-branch
g("unevaluatedProperties: both valid anyOf branches contribute coverage",
  {"anyOf": [{"properties": {"a": True}}, {"properties": {"b": True}}],
   "unevaluatedProperties": False},
  [("a+b both covered", {"a": 1, "b": 2}, True),
   ("c uncovered", {"a": 1, "c": 3}, False),
   ("empty object", {}, True)])

g("unevaluatedProperties: only the VALID anyOf branch contributes coverage",
  {"anyOf": [{"required": ["a"], "properties": {"a": True, "x": True}},
             {"required": ["b"], "properties": {"b": True}}],
   "unevaluatedProperties": False},
  [("branch-1 covers a and x", {"a": 1, "x": 2}, True),
   ("branch-2 covers only b: x uncovered", {"b": 1, "x": 2}, False),
   ("both branches valid, union coverage", {"a": 1, "b": 2}, True),
   ("neither branch valid -> anyOf fails first", {"c": 1}, False)])

g("unevaluatedProperties: oneOf single-match coverage",
  {"oneOf": [{"required": ["a"], "properties": {"a": True}},
             {"required": ["b"], "properties": {"b": True}}],
   "unevaluatedProperties": False},
  [("a branch", {"a": 1}, True),
   ("b branch", {"b": 1}, True),
   ("both -> oneOf fails", {"a": 1, "b": 2}, False),
   ("a branch + stray", {"a": 1, "z": 2}, False)])

g("unevaluatedProperties: if/then/else branch coverage is conditional",
  {"if": {"required": ["kind"], "properties": {"kind": {"const": "x"}}},
   "then": {"properties": {"xval": True}},
   "else": {"properties": {"yval": True}},
   "properties": {"kind": True},
   "unevaluatedProperties": False},
  [("then-branch covers xval", {"kind": "x", "xval": 1}, True),
   ("then-branch does NOT cover yval", {"kind": "x", "yval": 1}, False),
   ("else-branch covers yval", {"kind": "z", "yval": 1}, True),
   ("else-branch does NOT cover xval", {"kind": "z", "xval": 1}, False)])

g("unevaluatedProperties: allOf-of-anyOf nested coverage",
  {"allOf": [{"anyOf": [{"required": ["a"], "properties": {"a": True}},
                        {"required": ["b"], "properties": {"b": True}}]},
             {"properties": {"c": True}}],
   "unevaluatedProperties": False},
  [("a + c covered", {"a": 1, "c": 2}, True),
   ("stray d", {"a": 1, "c": 2, "d": 3}, False),
   ("b-branch + c", {"b": 1, "c": 2}, True)])

g("unevaluatedProperties with a SCHEMA validates uncovered keys",
  {"properties": {"a": True},
   "unevaluatedProperties": {"type": "number"}},
  [("uncovered number ok", {"a": "s", "b": 2}, True),
   ("uncovered string fails", {"a": "s", "b": "x"}, False),
   ("no uncovered keys", {"a": "s"}, True)])

g("unevaluatedProperties: patternProperties and additionalProperties cover",
  {"patternProperties": {"^p": True},
   "unevaluatedProperties": False},
  [("pattern-covered", {"p1": 1, "p2": 2}, True),
   ("uncovered", {"q1": 1}, False)])

g("unevaluatedProperties: $ref'd properties contribute coverage",
  {"$ref": "#/$defs/base",
   "unevaluatedProperties": False,
   "$defs": {"base": {"properties": {"a": True}}}},
  [("ref-covered", {"a": 1}, True),
   ("uncovered", {"a": 1, "b": 2}, False)])

g("unevaluatedProperties: nested unevaluatedProperties are independent scopes",
  {"properties": {"o": {"properties": {"x": True}, "unevaluatedProperties": False}},
   "unevaluatedProperties": False},
  [("inner + outer clean", {"o": {"x": 1}}, True),
   ("inner stray", {"o": {"x": 1, "y": 2}}, False),
   ("outer stray", {"o": {"x": 1}, "z": 3}, False)])

# ------------------------------------------ unevaluatedItems cross-branch
g("unevaluatedItems: prefixItems through allOf contributes coverage",
  {"allOf": [{"prefixItems": [True, True]}],
   "unevaluatedItems": False},
  [("within prefix", [1, 2], True),
   ("beyond prefix", [1, 2, 3], False),
   ("shorter", [1], True)])

g("unevaluatedItems: the longest valid prefix across branches wins",
  {"anyOf": [{"prefixItems": [True], "minItems": 1},
             {"prefixItems": [True, True, True], "minItems": 3}],
   "unevaluatedItems": False},
  [("three items covered by branch 2", [1, 2, 3], True),
   ("two items: only branch 1 valid (min 3 fails) -> item 1 uncovered", [1, 2], False),
   ("one item", [1], True)])

g("unevaluatedItems: items keyword in a branch covers the rest",
  {"anyOf": [{"items": {"minimum": 0}}, {"prefixItems": [True]}],
   "unevaluatedItems": False},
  [("all non-negative: items branch covers everything", [0, 1, 2], True),
   ("negative later element: only prefix branch valid -> tail uncovered",
    [0, -1], False)])

g("unevaluatedItems: contains-matched elements count as evaluated",
  {"contains": {"minimum": 10}, "unevaluatedItems": False},
  [("all match contains", [10, 20], True),
   ("one element below 10 stays unevaluated", [5, 20], False)])

g("unevaluatedItems with a SCHEMA validates uncovered tail",
  {"prefixItems": [True], "unevaluatedItems": {"minimum": 0}},
  [("tail non-negative", [-5, 0, 1], True),
   ("tail negative", [-5, -1], False),
   ("prefix only", [-5], True)])

g("unevaluatedItems: if/then prefix coverage is conditional",
  {"if": {"prefixItems": [{"const": 1}], "minItems": 1},
   "then": {"prefixItems": [True, True]},
   "unevaluatedItems": False},
  [("if matched: two covered", [1, 2], True),
   ("if matched: third uncovered", [1, 2, 3], False),
   ("if not matched: if's own prefix does not cover", [2], False)])

# ------------------------------ nested-unevaluated / annotation-escape edges
g("a nested unevaluatedProperties inside allOf covers everything for the outer one",
  {"allOf": [{"unevaluatedProperties": True}],
   "unevaluatedProperties": False},
  [("inner unevaluated:true evaluates all keys", {"a": 1}, True),
   ("empty object", {}, True)])

g("additionalProperties inside an allOf branch contributes coverage",
  {"allOf": [{"additionalProperties": True}],
   "unevaluatedProperties": False},
  [("covered by the branch's additionalProperties", {"a": 1, "b": 2}, True)])

g("annotations do NOT escape `not`: double negation contributes no coverage",
  {"not": {"not": {"properties": {"a": True}}},
   "unevaluatedProperties": False},
  [("a stays unevaluated despite matching the inner schema", {"a": 1}, False),
   ("empty object has nothing unevaluated", {}, True)])

g("a FAILING allOf branch still fails the whole schema (coverage is moot)",
  {"allOf": [{"required": ["z"], "unevaluatedProperties": True}],
   "unevaluatedProperties": False},
  [("branch fails on required", {"a": 1}, False)])

g("unevaluatedItems: nested unevaluatedItems inside allOf covers the tail",
  {"allOf": [{"unevaluatedItems": True}],
   "unevaluatedItems": False},
  [("inner unevaluatedItems evaluates every element", [1, 2, 3], True),
   ("empty array", [], True)])

# --------------------------------------------- numeric boundary sweep
for kw, bound, cases in [
    ("minimum", 10, [("below", 9.999, False), ("equal", 10.0, True), ("above", 10.001, True)]),
    ("exclusiveMinimum", 10, [("below", 9.999, False), ("equal", 10.0, False), ("above", 10.001, True)]),
    ("maximum", 10, [("below", 9.999, True), ("equal", 10.0, True), ("above", 10.001, False)]),
    ("exclusiveMaximum", 10, [("below", 9.999, True), ("equal", 10.0, False), ("above", 10.001, False)]),
]:
    g(f"boundary: {kw} {bound}", {kw: bound}, cases)
    g(f"boundary under negation: not {kw} {bound}", {"not": {kw: bound}},
      [(d, v, not ok) for (d, v, ok) in cases])

# --------------------------------------------- min/maxContains matrix
# contains {"minimum": 10}; arrays with 0..3 matching elements
arrays = {0: [1.0, 2.0], 1: [1.0, 15.0], 2: [15.0, 20.0, 1.0], 3: [15.0, 20.0, 30.0]}
for mn in (0, 1, 2):
    for mx in (1, 2):
        sch = {"contains": {"minimum": 10}, "minContains": mn, "maxContains": mx}
        tests = []
        for n, arr in arrays.items():
            ok = (n >= mn) and (n <= mx)
            tests.append((f"{n} matches", arr, ok))
        g(f"contains bounds: minContains={mn} maxContains={mx}", sch, tests)

# --------------------------------------------- type unions
g("type union string|number", {"type": ["string", "number"]},
  [("str", "x", True), ("num", 1.5, True), ("arr", [1.0], False), ("obj", {"a": 1}, False)])
g("type union array|object", {"type": ["array", "object"]},
  [("arr", [1.0], True), ("obj", {"a": 1}, True), ("str", "x", False)])
g("type union with integer accepts integral doubles", {"type": ["integer", "string"]},
  [("integral double", 3.0, True), ("fractional", 3.5, False), ("str", "x", True)])

# --------------------------------------------- deep-equal enum/const
g("enum over arrays compares deep", {"enum": [[1, 2], [3]]},
  [("first member", [1.0, 2.0], True), ("second member", [3.0], True),
   ("other array", [2.0, 1.0], False), ("prefix only", [1.0], False)])
g("const over an object compares deep", {"const": {"a": 1, "b": [2]}},
  [("equal", {"a": 1.0, "b": [2.0]}, True),
   ("different leaf", {"a": 1.0, "b": [3.0]}, False)])

# --------------------------------------------- dependentRequired matrix
g("dependentRequired multi-key", {"dependentRequired": {"a": ["b", "c"], "x": ["y"]}},
  [("no triggers", {"q": 1}, True),
   ("a with both deps", {"a": 1, "b": 2, "c": 3}, True),
   ("a missing c", {"a": 1, "b": 2}, False),
   ("x with y", {"x": 1, "y": 2}, True),
   ("x without y", {"x": 1}, False),
   ("both triggers satisfied", {"a": 1, "b": 2, "c": 3, "x": 4, "y": 5}, True),
   ("both triggers, one unsatisfied", {"a": 1, "b": 2, "x": 4, "y": 5}, False)])

# --------------------------------------------- propertyNames matrix
g("propertyNames pattern", {"propertyNames": {"pattern": "^[a-z]+$"}},
  [("all lower", {"ab": 1, "cd": 2}, True),
   ("digit key", {"ab": 1, "c3": 2}, False),
   ("empty object", {}, True)])
g("propertyNames length", {"propertyNames": {"maxLength": 2}},
  [("short keys", {"ab": 1}, True), ("long key", {"abc": 1}, False)])

out_path = "src/test/resources/conformance/cases21.json"
with open(out_path, "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
