#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases22.json — round-4 batch #3:
official-suite shapes for the `anchor` family (resource-scoped plain
anchors), the `infinite-loop-detection` family (the same schema location
evaluated twice against the same data location is NOT a cycle), and
escaped JSON-Pointer `$ref` tokens (~0 / ~1 / percent-encoding). Reference:
anchor registration in `pkg/draft202012/builder.go:149-224`, pointer deref
`pkg/jsonpointer`. Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# ------------------------------------------------------------------ anchor
g("plain $anchor resolves within the document",
  {"$id": "https://example.test/a22/one",
   "$ref": "#named",
   "$defs": {"n": {"$anchor": "named", "type": "number"}}},
  [("number ok", 4.2, True), ("string fails", "x", False)])

g("same-name anchors in DIFFERENT resources resolve to the local one",
  {"$id": "https://example.test/a22/root",
   "$ref": "child",
   "$defs": {
       "rootAnchor": {"$anchor": "pick", "type": "number"},
       "child": {"$id": "child", "$ref": "#pick",
                 "$defs": {"childAnchor": {"$anchor": "pick", "type": "string"}}}}},
  [("child resource's anchor wins: string", "x", True),
   ("number fails (root's same-name anchor must not shadow)", 4.2, False)])

g("$anchor inside an embedded resource is NOT visible to the parent base",
  {"$id": "https://example.test/a22/outer",
   "$ref": "inner#deep",
   "$defs": {"r": {"$id": "inner",
                   "$defs": {"d": {"$anchor": "deep", "type": "boolean"}}}}},
  [("boolean ok", True, True), ("number fails", 2.0, False)])

# ----------------------------------------------- infinite-loop-detection
g("evaluating the same schema twice against the same data location is not a loop",
  {"$defs": {"int": {"type": "integer"}},
   "allOf": [{"properties": {"foo": {"$ref": "#/$defs/int"}}},
             {"additionalProperties": {"$ref": "#/$defs/int"}}]},
  [("passing case", {"foo": 1}, True),
   ("failing case", {"foo": "a string"}, False)])

g("sibling refs to one target are independent (diamond, no false cycle)",
  {"$defs": {"leaf": {"type": "number", "minimum": 0},
             "a": {"$ref": "#/$defs/leaf"},
             "b": {"$ref": "#/$defs/leaf"}},
   "properties": {"x": {"$ref": "#/$defs/a"}, "y": {"$ref": "#/$defs/b"}}},
  [("both pass", {"x": 1.0, "y": 2.0}, True),
   ("one negative", {"x": 1.0, "y": -2.0}, False)])

# ------------------------------------------------ escaped pointer tokens
g("JSON-Pointer ~0 escape (literal ~ in a $defs key)",
  {"$defs": {"tilde~field": {"type": "number"}},
   "$ref": "#/$defs/tilde~0field"},
  [("number ok", 1.5, True), ("string fails", "s", False)])

g("JSON-Pointer ~1 escape (literal / in a $defs key)",
  {"$defs": {"slash/field": {"type": "string"}},
   "$ref": "#/$defs/slash~1field"},
  [("string ok", "s", True), ("number fails", 1.5, False)])

g("percent-encoded pointer token",
  {"$defs": {"percent%field": {"type": "boolean"}},
   "$ref": "#/$defs/percent%25field"},
  [("boolean ok", False, True), ("string fails", "s", False)])

# ------------------------------------------------ ref into known keywords
g("$ref into a properties subtree by pointer",
  {"properties": {"a": {"type": "number", "minimum": 3}},
   "$defs": {"alias": {"$ref": "#/properties/a"}},
   "allOf": [{"properties": {"b": {"$ref": "#/$defs/alias"}}}]},
  [("both fields satisfy the shared schema", {"a": 4.0, "b": 5.0}, True),
   ("b below the referenced minimum", {"a": 4.0, "b": 1.0}, False)])

g("$ref to a prefixItems element schema by pointer",
  {"prefixItems": [{"type": "string"}, {"type": "number"}],
   "properties": {"extra": {"$ref": "#/prefixItems/1"}}},
  [("extra is a number like element 1", {"extra": 2.0}, True),
   ("extra as string fails", {"extra": "x"}, False)])

with open("src/test/resources/conformance/cases22.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
