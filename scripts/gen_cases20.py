#!/usr/bin/env python3
"""Generate src/test/resources/conformance/cases20.json — round-4 batch:
the official-suite `dynamicRef.json` family (draft 2020-12 dynamic-scope
resolution: typical resolution, bookending, plain-$anchor non-participation,
intermediate scopes, multiple dynamic paths, scope exit, extended-tree
recursion) plus plain-$ref recursion through data. All cases here encode
REFERENCE behavior (`/root/reference/pkg/draft202012/validate.go:84-182`,
outermost-anchor-wins at :138-142); the least-fixpoint deviation for
no-data-descent cycles is pinned separately in RecursiveSchemaSpec, not in
this corpus. Heterogeneous official arrays (["foo", 42]) are split into
homogeneous per-type tests (Spark arrays are homogeneous).
Deterministic; run and commit the output."""
import json

groups = []


def g(description, schema, tests):
    groups.append({"description": description, "schema": schema,
                   "tests": [{"description": d, "data": v, "valid": ok}
                             for (d, v, ok) in tests]})


# ---------------------------------------------------------------- typical
g("typical dynamic resolution: $dynamicRef resolves to the outermost $dynamicAnchor in scope",
  {"$id": "https://example.test/dyn/a/root",
   "$ref": "list",
   "$defs": {
       "foo": {"$dynamicAnchor": "items", "type": "string"},
       "list": {"$id": "list", "type": "array",
                "items": {"$dynamicRef": "#items"},
                "$defs": {"items": {"$comment": "bookending satisfier",
                                    "$dynamicAnchor": "items"}}}}},
  [("all strings valid", ["foo", "bar"], True),
   ("numbers violate the outer dynamic anchor", [4.0, 5.0], False),
   ("empty array valid", [], True)])

# ----------------------------------------------- same-resource bookending
g("$dynamicRef to a $dynamicAnchor in the same schema resource behaves like $ref to $anchor",
  {"$id": "https://example.test/dyn/b/root",
   "type": "array", "items": {"$dynamicRef": "#items"},
   "$defs": {"foo": {"$dynamicAnchor": "items", "type": "string"}}},
  [("strings ok", ["foo"], True),
   ("number fails", [1.0], False)])

g("$dynamicRef to a plain $anchor behaves like a normal $ref (no bookending)",
  {"$id": "https://example.test/dyn/c/root",
   "type": "array", "items": {"$dynamicRef": "#items"},
   "$defs": {"foo": {"$anchor": "items", "type": "string"}}},
  [("strings ok", ["foo"], True),
   ("number fails", [1.0], False)])

g("$ref to a $dynamicAnchor behaves like a normal $ref to an $anchor",
  {"$id": "https://example.test/dyn/d/root",
   "type": "array", "items": {"$ref": "#items"},
   "$defs": {"foo": {"$dynamicAnchor": "items", "type": "string"}}},
  [("strings ok", ["foo"], True),
   ("number fails", [1.0], False)])

# --------------------------- plain $anchor never joins dynamic resolution
g("an $anchor with the same name as a $dynamicAnchor is not used for dynamic scope resolution",
  {"$id": "https://example.test/dyn/e/root",
   "$ref": "list",
   "$defs": {
       "foo": {"$anchor": "items", "type": "string"},
       "list": {"$id": "list", "type": "array",
                "items": {"$dynamicRef": "#items"},
                "$defs": {"items": {"$dynamicAnchor": "items"}}}}},
  [("numbers allowed — root's plain $anchor does not participate", [4.2], True),
   ("strings allowed too (local anchor is unconstrained)", ["foo"], True)])

# ------------------------------------------------- intermediate resources
g("intermediate scopes without a matching $dynamicAnchor do not affect resolution",
  {"$id": "https://example.test/dyn/f/root",
   "$ref": "intermediate-scope",
   "$defs": {
       "foo": {"$dynamicAnchor": "items", "type": "string"},
       "intermediate-scope": {"$id": "intermediate-scope", "$ref": "list"},
       "list": {"$id": "list", "type": "array",
                "items": {"$dynamicRef": "#items"},
                "$defs": {"items": {"$dynamicAnchor": "items"}}}}},
  [("all strings valid", ["foo", "bar"], True),
   ("numbers violate the root anchor across the intermediate hop", [4.0], False)])

# -------------------------------------------------- multiple dynamic paths
g("multiple dynamic paths to the same $dynamicRef keyword resolve per entry path",
  {"$id": "https://example.test/dyn/g/main",
   "if": {"properties": {"kindOfList": {"const": "numbers"}},
          "required": ["kindOfList"]},
   "then": {"$ref": "numberList"},
   "else": {"$ref": "stringList"},
   "$defs": {
       "genericList": {"$id": "genericList",
                       "properties": {"list": {"items": {"$dynamicRef": "#itemType"}}},
                       "$defs": {"defaultItemType": {
                           "$comment": "bookending satisfier",
                           "$dynamicAnchor": "itemType"}}},
       "numberList": {"$id": "numberList",
                      "$defs": {"itemType": {"$dynamicAnchor": "itemType",
                                             "type": "number"}},
                      "$ref": "genericList"},
       "stringList": {"$id": "stringList",
                      "$defs": {"itemType": {"$dynamicAnchor": "itemType",
                                             "type": "string"}},
                      "$ref": "genericList"}}},
  [("number list with numbers", {"kindOfList": "numbers", "list": [1.1]}, True),
   ("number list with strings", {"kindOfList": "numbers", "list": ["foo"]}, False),
   ("string list with strings", {"kindOfList": "strings", "list": ["foo"]}, True),
   ("string list with numbers", {"kindOfList": "strings", "list": [1.1]}, False)])

# ------------------------------------------------------------- scope exit
g("after leaving a dynamic scope it is not used by a $dynamicRef",
  {"$id": "https://example.test/dyn/h/main",
   "if": {"$id": "first_scope",
          "$defs": {"thingy": {"$comment": "first",
                               "$dynamicAnchor": "thingy", "type": "number"}}},
   "then": {"$id": "second_scope", "$ref": "start",
            "$defs": {"thingy": {"$comment": "second",
                                 "$dynamicAnchor": "thingy", "type": "null"}}},
   "$defs": {
       "start": {"$id": "start", "$dynamicRef": "inner_scope#thingy"},
       "thingy": {"$id": "inner_scope", "$dynamicAnchor": "thingy",
                  "type": "string"}}},
  [("string rejected — inner_scope's own anchor is overridden", "a string", False),
   ("number rejected — first_scope exited the dynamic scope with `if`", 42, False),
   ("null passes — second_scope's $dynamicAnchor wins", None, True)])

# -------------------------------------------- recursion THROUGH data: $ref
g("plain-$ref linked list recursion terminates through data descent",
  {"$id": "https://example.test/dyn/i/root",
   "$ref": "#/$defs/node",
   "$defs": {"node": {"type": "object",
                      "properties": {"v": {"type": "number"},
                                     "next": {"$ref": "#/$defs/node"}},
                      "required": ["v"]}}},
  [("single node", {"v": 1.0}, True),
   ("two nodes", {"v": 1.0, "next": {"v": 2.0}}, True),
   ("middle node missing v", {"v": 1.0, "next": {"next": {"v": 3.0}}}, False)])

# ------------------------------------- extended tree (dynamic recursion)
g("extended tree: the dynamic anchor bounces every level back to the extension",
  {"$id": "https://example.test/dyn/j/extended",
   "$dynamicAnchor": "node",
   "$ref": "tree",
   "properties": {"data": {"type": "number"}},
   "$defs": {"tree": {"$id": "tree", "$dynamicAnchor": "node",
                      "type": "object",
                      "properties": {
                          "data": True,
                          "children": {"type": "array",
                                       "items": {"$dynamicRef": "#node"}}}}}},
  [("root-level data number", {"data": 1.0, "children": [{"data": 2.0}]}, True),
   ("nested data must ALSO be a number (the extension reaches level 2)",
    {"data": 1.0, "children": [{"data": "x"}]}, False),
   ("root-level violation", {"data": "x"}, False),
   ("three levels deep",
    {"data": 1.0, "children": [{"data": 2.0, "children": [{"data": 3.0}]}]}, True),
   ("three levels deep violation",
    {"data": 1.0, "children": [{"data": 2.0, "children": [{"data": "x"}]}]}, False)])

# -------------------------------- unmatched $dynamicRef → plain behavior
g("$dynamicRef that initially resolves to a schema WITHOUT a matching $dynamicAnchor behaves like $ref",
  {"$id": "https://example.test/dyn/k/root",
   "$ref": "list",
   "$defs": {
       "foo": {"$dynamicAnchor": "items", "type": "string"},
       "list": {"$id": "list", "type": "array",
                "items": {"$dynamicRef": "#items"},
                "$defs": {"items": {"$comment": "plain anchor only — no bookending",
                                    "$anchor": "items", "type": "number"}}}}},
  [("numbers ok — resolution stays local", [4.0], True),
   ("strings fail — root's dynamic anchor is NOT consulted", ["foo"], False)])

out = {"_provenance":
       "Translated from the public JSON-Schema-Test-Suite dynamicRef family "
       "(json-schema-org/JSON-Schema-Test-Suite, tests/draft2020-12/dynamicRef.json "
       "shapes) against the reference resolution rules in "
       "/root/reference/pkg/draft202012/validate.go:84-182; heterogeneous arrays "
       "split per element type.",
       }
with open("src/test/resources/conformance/cases20.json", "w") as f:
    json.dump(groups, f, indent=1)
print(f"wrote {sum(len(x['tests']) for x in groups)} tests in {len(groups)} groups")
