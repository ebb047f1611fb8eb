#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases26.json — round-5 batch #4:
the official ref.json family's adversarial groups not yet in the corpus —
naive-$ref-replacement traps (a $ref-shaped object inside enum is a
LITERAL), nearest-parent $id base resolution through non-applicator
positions, quoted/escaped $defs keys, refs into applicator keyword
locations, and urn-scheme $ids. Same authoring caveat as gen_cases23.py.
Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


g("naive replacement of $ref with its destination is not correct (enum literal)",
  {"$defs": {"a_string": {"type": "string"}},
   "enum": [{"$ref": "#/$defs/a_string"}]},
  [("the enum member is the LITERAL object, not a resolved schema",
    {"$ref": "#/$defs/a_string"}, True),
   ("a plain string does not match the literal object", "this is a string", False)])

g("$id must be resolved against nearest parent, not just immediate parent",
  {"$id": "https://example.test/c26/a.json",
   "$defs": {
       "x": {"$id": "https://example.test/c26/b/c.json",
             "not": {"$defs": {"y": {"$id": "d.json", "type": "number"}}}}},
   "allOf": [{"$ref": "https://example.test/c26/b/d.json"}]},
  [("number resolves through the nested base", 1, True),
   ("non-number fails the referenced leaf", "a", False)])

g("refs with quote in the definition key",
  {"$defs": {"foo\"bar": {"type": "number"}},
   "properties": {"foo\"bar": {"$ref": "#/$defs/foo%22bar"}}},
  [("quoted-key target enforces number", {"foo\"bar": 1}, True),
   ("violation through the quoted key", {"foo\"bar": "x"}, False)])

g("$ref into an applicator keyword location",
  # `if` without then/else asserts nothing at the root, so the root object
  # passes it vacuously while "#/if" is still a referencable schema location
  {"if": {"type": "integer", "minimum": 2},
   "properties": {"v": {"$ref": "#/if"}}},
  [("property routed through the if-keyword schema", {"v": 3}, True),
   ("below the referenced minimum", {"v": 1}, False)])

g("urn-scheme $id with pointer fragment ref",
  {"$id": "urn:uuid:deadbeef-1234-0000-0000-4321feebdaed",
   "properties": {
       "v": {"$ref":
             "urn:uuid:deadbeef-1234-0000-0000-4321feebdaed#/$defs/bar"}},
   "$defs": {"bar": {"type": "string"}}},
  [("urn-addressed leaf enforces string", {"v": "bar"}, True),
   ("number fails", {"v": 1}, False)])

g("urn-scheme $id with plain anchor ref",
  {"$id": "urn:uuid:deadbeef-1234-0000-0000-4321feebdaeb",
   "properties": {
       "v": {"$ref": "urn:uuid:deadbeef-1234-0000-0000-4321feebdaeb#something"}},
   "$defs": {"bar": {"$anchor": "something", "type": "string"}}},
  [("urn anchor resolves", {"v": "bar"}, True),
   ("number fails", {"v": 1}, False)])

g("ref through $defs chains crossing an embedded resource boundary",
  {"$id": "https://example.test/c26/outer",
   "$defs": {
       "mid": {"$id": "mid",
               "$defs": {"leaf": {"minimum": 5}},
               "$ref": "#/$defs/leaf"}},
   "$ref": "#/$defs/mid"},
  [("the embedded resource's own pointer resolves inside ITSELF", 6, True),
   ("below the leaf minimum", 4, False)])

g("sibling keywords next to $ref apply (ref does not shadow)",
  {"$defs": {"num": {"type": "number"}},
   "properties": {"v": {"$ref": "#/$defs/num", "maximum": 5}}},
  [("both constraints hold", {"v": 4}, True),
   ("the sibling maximum still applies", {"v": 9}, False),
   ("the ref's type still applies", {"v": "x"}, False)])

with open("src/test/resources/conformance/cases26.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
