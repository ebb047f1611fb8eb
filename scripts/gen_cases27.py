#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases27.json — round-5 batch #5:
pins for the review-pass fixes that are expressible as conformance
instances — JSON-null-valued properties are PRESENT and their values are
judged by additionalProperties / unevaluatedProperties / dependentSchemas
(the official suite's "null valued instance properties" family), and
unevaluatedItems coverage contributed through a $dynamicRef. Same
authoring caveat as gen_cases23.py. Deterministic; run and commit."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


g("additionalProperties judges null-valued instance properties",
  {"properties": {"foo": {}}, "additionalProperties": {"type": "null"}},
  [("null extra allowed by type null", {"foo": 1, "bar": None}, True),
   ("non-null extra rejected", {"foo": 1, "bar": 2}, False)])

g("additionalProperties type string rejects a null-valued extra",
  {"additionalProperties": {"type": "string"}},
  [("null is not a string", {"foo": None}, False),
   ("string ok", {"foo": "x"}, True)])

g("unevaluatedProperties judges null-valued properties",
  {"properties": {"a": {}}, "unevaluatedProperties": False},
  [("null-valued property is PRESENT hence unevaluated", {"a": 1, "b": None}, False),
   ("only the evaluated property", {"a": None}, True)])

g("unevaluatedProperties schema form accepts matching null values",
  {"unevaluatedProperties": {"type": "null"}},
  [("null value passes the unevaluated schema", {"b": None}, True),
   ("non-null fails it", {"b": 1}, False)])

g("dependentSchemas triggers on a null-valued key and contributes coverage",
  {"dependentSchemas": {"bar": {"properties": {"foo": {}, "bar": {}}}},
   "unevaluatedProperties": False},
  [("null-valued bar is present: schema applies, covers foo and bar",
    {"bar": None, "foo": 1}, True),
   ("no trigger: baz stays unevaluated", {"baz": 1}, False)])

g("unevaluatedItems sees prefixItems through a $dynamicRef",
  {"$dynamicRef": "#tail", "unevaluatedItems": False,
   "$defs": {"t": {"$dynamicAnchor": "tail",
                   "prefixItems": [{"type": "number"}]}}},
  [("covered by the dynamic ref's prefix", [1], True),
   ("tail beyond the prefix is unevaluated", [1, 2], False)])

g("unevaluatedItems sees contains through a $ref",
  {"$ref": "#/$defs/hasBig", "unevaluatedItems": False,
   "$defs": {"hasBig": {"contains": {"minimum": 100}}}},
  [("all items matched by the referenced contains", [100, 200], True),
   ("small item unmatched and unevaluated", [100, 1], False)])

with open("src/test/resources/conformance/cases27.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
