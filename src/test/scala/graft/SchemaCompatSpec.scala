package graft

import graft.compile.CompileOpts
import graft.model.SchemaCompat
import graft.model.SchemaCompat.{Info, Relaxed, Tightened}
import graft.row.RowValidator
import org.json4s.jackson.JsonMethods

/** Schema-evolution compatibility: the promotion gate that decides from two
  * schema DOCUMENTS whether a validated corpus needs a rescan. Soundness is
  * the contract — `canPromoteWithoutRescan` may be conservative (forcing a
  * needless rescan) but must never let a tightening through. */
class SchemaCompatSpec extends SparkSpec {

  private def dirs(oldS: String, newS: String) =
    SchemaCompat.diff(oldS, newS).map(c => c.keyword -> c.direction)

  private def promotable(oldS: String, newS: String) =
    SchemaCompat.canPromoteWithoutRescan(SchemaCompat.diff(oldS, newS))

  test("pure relaxations are recognized") {
    val cases = Seq(
      ("""{"maximum": 5}""", """{"maximum": 9}"""),
      ("""{"minimum": 5}""", """{"minimum": 1}"""),
      ("""{"minLength": 3}""", """{}"""),
      ("""{"required": ["a", "b"]}""", """{"required": ["a"]}"""),
      ("""{"type": "integer"}""", """{"type": "number"}"""),
      ("""{"type": "integer"}""", """{"type": ["integer", "string"]}"""),
      ("""{"enum": [1, 2]}""", """{"enum": [1, 2, 3]}"""),
      ("""{"const": 1}""", """{"enum": [1, 2]}"""),
      ("""{"pattern": "^a"}""", """{}"""),
      ("""{"multipleOf": 10}""", """{"multipleOf": 5}"""),
      ("""{"uniqueItems": true}""", """{"uniqueItems": false}"""),
      ("""{"anyOf": [{"type": "string"}]}""",
        """{"anyOf": [{"type": "string"}, {"type": "number"}]}"""),
      ("""{"allOf": [{"minimum": 1}, {"maximum": 9}]}""",
        """{"allOf": [{"minimum": 1}]}"""),
      ("""{"additionalProperties": false}""", """{}"""),
      ("""{"dependentRequired": {"a": ["b"]}}""", """{}"""),
      ("""{"properties": {"a": {"minimum": 3}}}""",
        """{"properties": {"a": {"minimum": 1}}}"""))
    for ((o, n) <- cases) {
      val ds = SchemaCompat.diff(o, n)
      assert(ds.nonEmpty && ds.forall(_.direction == Relaxed), s"$o -> $n: $ds")
      assert(promotable(o, n))
    }
  }

  test("tightenings force a rescan") {
    val cases = Seq(
      ("""{"maximum": 9}""", """{"maximum": 5}"""),
      ("""{}""", """{"maxLength": 4}"""),
      ("""{"type": "number"}""", """{"type": "integer"}"""),
      ("""{"enum": [1, 2, 3]}""", """{"enum": [1, 2]}"""),
      ("""{"pattern": "^a"}""", """{"pattern": "^b"}"""),
      ("""{"required": ["a"]}""", """{"required": ["a", "b"]}"""),
      ("""{}""", """{"uniqueItems": true}"""),
      ("""{"multipleOf": 5}""", """{"multipleOf": 10}"""),
      ("""{"properties": {"a": {}}}""", """{"properties": {"a": {"type": "string"}}}"""),
      ("""{"anyOf": [{"type": "string"}, {"type": "number"}]}""",
        """{"anyOf": [{"type": "string"}]}"""),
      ("""{"allOf": [{"minimum": 1}]}""",
        """{"allOf": [{"minimum": 1}, {"maximum": 9}]}"""),
      ("""{"oneOf": [{"minimum": 0}]}""", """{"oneOf": [{"minimum": 1}]}"""),
      ("""{"$ref": "#/$defs/a", "$defs": {"a": {"minimum": 1}}}""",
        """{"$ref": "#/$defs/a", "$defs": {"a": {"minimum": 2}}}"""),
      ("""{"items": {"maximum": 9}}""", """{"items": {"maximum": 5}}"""))
    for ((o, n) <- cases)
      assert(!promotable(o, n), s"$o -> $n wrongly promotable: ${SchemaCompat.diff(o, n)}")
  }

  test("polarity flips under not") {
    // relaxing the NEGATED schema tightens the parent: not(max 5) -> not(max 9)
    assert(!promotable("""{"not": {"maximum": 5}}""", """{"not": {"maximum": 9}}"""))
    // tightening the negated schema relaxes the parent
    val ds = dirs("""{"not": {"maximum": 9}}""", """{"not": {"maximum": 5}}""")
    assert(ds == Seq("maximum" -> Relaxed))
  }

  test("property removal is only a relaxation when nothing catches the key") {
    val o = """{"properties": {"a": {"type": "string"}, "b": {}}, "additionalProperties": false}"""
    val n = """{"properties": {"b": {}}, "additionalProperties": false}"""
    assert(!promotable(o, n)) // 'a' now falls to additionalProperties: false
    val o2 = """{"properties": {"a": {"type": "string"}}}"""
    val n2 = """{}"""
    assert(promotable(o2, n2))
    // removal with a SCHEMA catch-all is conservative too
    val n3 = """{"additionalProperties": {"type": "number"}}"""
    assert(!promotable(o2, n3))
  }

  test("annotations and unknown keywords are informational") {
    val ds = SchemaCompat.diff(
      """{"title": "v1", "x-owner": "alice", "minimum": 1}""",
      """{"title": "v2", "x-owner": "bob", "minimum": 1}""")
    assert(ds.nonEmpty && ds.forall(_.direction == Info))
    assert(promotable("""{"title": "v1"}""", """{"title": "v2"}"""))
  }

  test("semantic soundness: a promotable evolution never invalidates an old-valid instance") {
    import org.apache.spark.sql.functions._
    val v1 =
      """{"type": "object",
          "required": ["doc_id", "n_tok"],
          "properties": {
            "doc_id": {"type": "string", "minLength": 3},
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 100},
            "source": {"enum": ["web", "books"]}}}"""
    // relax: drop a required, widen bounds, grow the enum, loosen minLength
    val v2 =
      """{"type": "object",
          "required": ["doc_id"],
          "properties": {
            "doc_id": {"type": "string", "minLength": 1},
            "n_tok": {"type": "integer", "minimum": 0, "maximum": 200},
            "source": {"enum": ["web", "books", "code"]}}}"""
    assert(promotable(v1, v2), SchemaCompat.diff(v1, v2).toString)

    import spark.implicits._
    val rows = Seq(
      ("alpha", 1, "web"), ("beta", 100, "books"), ("gamma", 50, "web"),
      ("de", 0, "code"), ("x", 300, "nope")) // last two invalid under v1
      .toDF("doc_id", "n_tok", "source")
      .select(struct(col("doc_id"), col("n_tok"), col("source")).as("value"))
    val flags = rows.select(
      RowValidator.validColumn(rows, v1).as("v1"),
      RowValidator.validColumn(rows, v2).as("v2"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(flags.count(_._1) == 3)
    assert(flags.forall { case (okOld, okNew) => !okOld || okNew },
      s"promotable evolution invalidated an old-valid row: ${flags.toSeq}")

    // and a tightened pair is caught BEFORE any row could regress
    val v3 = v2.replace("\"minimum\": 0", "\"minimum\": 10")
    assert(!promotable(v2, v3))
  }

  test("diff report carries paths and values") {
    val ds = SchemaCompat.diff(
      """{"properties": {"a": {"minimum": 1}}}""",
      """{"properties": {"a": {"minimum": 5}}}""")
    assert(ds.size == 1)
    val c = ds.head
    assert(c.path == "/properties/a/minimum" && c.direction == Tightened)
    assert(c.oldValue.contains("1") && c.newValue.contains("5"))
  }

  test("unprovable changes are Incomparable and never flip to Relaxed under not") {
    // a genuine tightening routed through not: instance 5 was old-valid
    // (not a string) and is new-invalid (matches integer) — a naive
    // polarity flip of an unprovable "Tightened" would wrongly promote
    assert(!promotable("""{"not": {"type": "string"}}""",
                       """{"not": {"type": "integer"}}"""))
    // changed $ref target under not: resolution-dependent, never promotable
    assert(!promotable(
      """{"not": {"$ref": "#/$defs/a"}, "$defs": {"a": {"type": "string"}}}""",
      """{"not": {"$ref": "#/$defs/b"}, "$defs": {"b": {"type": "integer"}}}"""))
    // required add+remove is incomparable in EITHER polarity
    assert(!promotable("""{"required": ["a"]}""", """{"required": ["b"]}"""))
    assert(!promotable("""{"not": {"required": ["a"]}}""",
                       """{"not": {"required": ["b"]}}"""))
    // pattern change under not stays rescan-forcing
    assert(!promotable("""{"not": {"pattern": "^a"}}""",
                       """{"not": {"pattern": "^b"}}"""))
  }

  test("const+enum jointly present compares opaquely, not as the empty set") {
    // old valid set is {1}; an empty-set encoding would read subset-of-{2}
    // as Relaxed and wrongly promote over now-invalid instance 1
    assert(!promotable("""{"const": 1, "enum": [1]}""", """{"enum": [2]}"""))
    // unchanged const+enum pair is still no-change
    assert(promotable("""{"const": 1, "enum": [1]}""",
                      """{"const": 1, "enum": [1]}"""))
  }

  test("anyOf branch comparison is set-based (duplicates are idempotent)") {
    // [s,s] -> [s,int]: same length, but the union GREW — relaxed at root...
    assert(promotable(
      """{"anyOf": [{"type": "string"}, {"type": "string"}]}""",
      """{"anyOf": [{"type": "string"}, {"type": "integer"}]}"""))
    // ...and therefore TIGHTENED under not (instance 5: old-valid, new-invalid)
    assert(!promotable(
      """{"not": {"anyOf": [{"type": "string"}, {"type": "string"}]}}""",
      """{"not": {"anyOf": [{"type": "string"}, {"type": "integer"}]}}"""))
  }
}
