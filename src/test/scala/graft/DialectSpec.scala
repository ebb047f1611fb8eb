package graft

import graft.model.{Dialect, Dialects, SchemaParser}
import graft.row.RowValidator
import org.apache.spark.sql.functions._

/** `$schema`-keyed dialect registry (schema.go:420-465, 1200-1291 analogue):
  * the document's `$schema` URI selects the keyword-parser set; unknown URIs
  * fall back to the default with a warning. */
class DialectSpec extends SparkSpec {
  import spark.implicits._

  test("a draft-7 document parses array-form items and additionalItems natively") {
    val schema = """{
      "$schema": "http://json-schema.org/draft-07/schema#",
      "properties": {
        "xs": {
          "type": "array",
          "items": [{"type": "integer", "minimum": 10}, {"type": "integer"}],
          "additionalItems": {"type": "integer", "maximum": 5}
        }
      }
    }"""
    val doc = SchemaParser.parse(schema)
    assert(doc.dialect.name == "draft-7")
    val df = Seq(
      ("ok",       Seq(10, 0, 1, 2)),
      ("bad_pref", Seq(3, 0)),        // items[0] minimum 10
      ("bad_rest", Seq(10, 0, 99))).toDF("id", "xs") // additionalItems max 5
    val bad = RowValidator.violations(df, doc, "id")
      .select("id", "keyword", "keywordLocation")
      .distinct().as[(String, String, String)].collect().toSet
    // leaf keywords report, with the draft-7 array-items remap visible in the
    // keyword location: items[i] → prefixItems/i, additionalItems → items
    assert(bad.map(t => (t._1, t._2)) ===
      Set(("bad_pref", "minimum"), ("bad_rest", "maximum")))
    assert(bad.find(_._1 == "bad_pref").get._3.contains("/prefixItems/0/"))
    assert(bad.find(_._1 == "bad_rest").get._3.contains("/items/"))
  }

  test("draft-7 additionalItems is IGNORED when items is schema-form or absent") {
    // spec: additionalItems only applies when items is the array form —
    // mapping it to ItemsK here would shadow the real rest-of-array schema
    val schema = """{
      "$schema": "http://json-schema.org/draft-07/schema#",
      "properties": {
        "xs": {"type": "array",
               "items": {"type": "integer"},
               "additionalItems": {"type": "string"}}
      }
    }"""
    val doc = SchemaParser.parse(schema)
    val df = Seq(("all_int", Seq(1, 2, 3))).toDF("id", "xs")
    // every element must be an integer (the real items schema); the
    // additionalItems string constraint must NOT apply to anything
    assert(RowValidator.violations(df, doc, "id").count() == 0)
    // absent items: additionalItems is likewise inert
    val doc2 = SchemaParser.parse("""{
      "$schema": "http://json-schema.org/draft-07/schema#",
      "properties": {"xs": {"additionalItems": {"type": "string"}}}
    }""")
    assert(RowValidator.violations(df, doc2, "id").count() == 0)
  }

  test("a draft-7 document parses dependencies natively under its own $schema") {
    val schema = """{
      "$schema": "http://json-schema.org/draft-07/schema#",
      "dependencies": {"a": ["b"]}
    }"""
    val doc = SchemaParser.parse(schema)
    val df = Seq(("has_both", "x", "y"), ("missing_b", "x", null))
      .toDF("id", "a", "b")
    val bad = RowValidator.violations(df, doc, "id")
      .select("id").as[String].collect().toSet
    assert(bad === Set("missing_b"))
  }

  test("an unknown $schema falls back to the default dialect (with a warning)") {
    val schema = """{
      "$schema": "https://example.invalid/my-dialect",
      "properties": {"n": {"type": "integer", "minimum": 3}}
    }"""
    val doc = SchemaParser.parse(schema)
    assert(doc.dialect eq Dialects.draft202012)
    val df = Seq(("lo", 1), ("hi", 7)).toDF("id", "n")
    val bad = RowValidator.violations(df, doc, "id")
      .select("id").as[String].collect().toSet
    assert(bad === Set("lo"))
  }

  test("2020-12 (default) rejects array-form items — that syntax is draft-7 only") {
    val schema = """{"properties": {"xs": {"items": [{"type": "integer"}]}}}"""
    intercept[IllegalArgumentException] { SchemaParser.parse(schema) }
  }

  test("a custom-registered dialect overrides keyword parsing by $schema URI") {
    // a dialect where `range: [lo, hi]` sugar expands to minimum+maximum —
    // the RegisterVocabulary analogue; validation semantics for genuinely new
    // keywords would come from ConstraintRegistry
    import org.json4s._
    Dialects.register(Dialect("range-sugar",
      Set("https://example.com/dialects/range"),
      (k, v, _, _) => (k, v) match {
        case ("range", JArray(List(lo, hi))) =>
          Some(graft.model.AllOfK(Vector(
            graft.model.ObjSchema(Vector(
              graft.model.MinimumK(lo.values.toString.toDouble),
              graft.model.MaximumK(hi.values.toString.toDouble))))))
        case _ => None
      }))
    val doc = SchemaParser.parse("""{
      "$schema": "https://example.com/dialects/range",
      "properties": {"n": {"range": [2, 5]}}
    }""")
    assert(doc.dialect.name == "range-sugar")
    val df = Seq(("lo", 1), ("mid", 3), ("hi", 9)).toDF("id", "n")
    val bad = RowValidator.violations(df, doc, "id")
      .select("id").as[String].collect().toSet
    assert(bad === Set("lo", "hi"))
    // under the DEFAULT dialect the same keyword is an unknown annotation
    val plain = SchemaParser.parse("""{"properties": {"n": {"range": [2, 5]}}}""")
    assert(RowValidator.violations(df, plain, "id").count() === 0)
  }
}
