package graft

import graft.model.SchemaParser
import graft.row.RowValidator
import graft.compile.CompileOpts
import org.apache.spark.sql.functions._

case class TokenSeq(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

class RowValidatorSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical constraint set from SURVEY §7.2 (without cross-field n_tok==size,
    * which is an allOf/const-style engine extension tested separately). */
  val canonicalSchema: String =
    """{
      "type": "object",
      "required": ["doc_id", "tokens", "n_tok", "source"],
      "properties": {
        "doc_id": {"type": "string", "format": "uuid"},
        "tokens": {
          "type": "array",
          "items": {"type": "integer", "minimum": 0, "maximum": 49999},
          "minItems": 1, "maxItems": 8192
        },
        "n_tok": {"type": "integer", "minimum": 1, "maximum": 8192},
        "source": {"enum": ["web", "books", "code", "wiki"]}
      }
    }"""

  val goodId = "123e4567-e89b-12d3-a456-426614174000"

  def rows: Seq[TokenSeq] = Seq(
    TokenSeq(goodId, Array(1, 2, 3), 3, "web"),                 // valid
    TokenSeq("not-a-uuid", Array(1, 2), 2, "web"),              // format violation
    TokenSeq(goodId, Array(1, -5, 50000), 3, "books"),          // 2 item violations
    TokenSeq(goodId, Array.empty[Int], 0, "code"),              // minItems + n_tok minimum
    TokenSeq(goodId, Array(7), 1, "reddit"),                    // enum violation
    TokenSeq(null, Array(1), 1, "wiki")                         // required violation
  )

  test("canonical TokenSeq schema: violation rows end-to-end") {
    val df = rows.toDF()
    val doc = SchemaParser.parse(canonicalSchema)
    val v = RowValidator.violations(df, doc, "doc_id").collect()

    val byKeyword = v.groupBy(_.getAs[String]("keyword")).view.mapValues(_.length).toMap
    assert(byKeyword("format") == 1)
    assert(byKeyword("minimum") == 2)   // -5 and n_tok=0
    assert(byKeyword("maximum") == 1)   // 50000
    assert(byKeyword("minItems") == 1)
    assert(byKeyword("enum") == 1)
    assert(byKeyword("required") == 1)

    // per-element instanceLocation carries the array index (#/tokens/1 = -5)
    val itemViolLocs = v.filter(_.getAs[String]("keywordLocation")
      .contains("/tokens/items")).map(_.getAs[String]("instanceLocation")).toSet
    assert(itemViolLocs == Set("#/tokens/1", "#/tokens/2"))
  }

  test("valid rows produce no violations and _valid=true") {
    val df = Seq(TokenSeq(goodId, Array(0, 49999), 2, "web")).toDF()
    val doc = SchemaParser.parse(canonicalSchema)
    val out = RowValidator.withValidation(df, doc)
    assert(out.filter(!col("_valid")).count() == 0)
    assert(out.select(size(col("_violations"))).as[Int].head() == 0)
  }

  test("cross-field invariant n_tok == size(tokens) via engine column constraint") {
    // the input_hint per-row invariant — expressed directly as a Column
    val df = Seq(
      TokenSeq(goodId, Array(1, 2, 3), 3, "web"),
      TokenSeq(goodId, Array(1, 2, 3), 7, "web")).toDF()
    val bad = df.filter(!(col("n_tok") === size(col("tokens")))).count()
    assert(bad == 1)
  }

  test("applyDefaults fills nulls for non-required properties") {
    val schema = """{
      "properties": {
        "source": {"type": "string", "default": "web"},
        "n_tok": {"type": "integer", "default": 0}
      },
      "required": []
    }"""
    val df = Seq((goodId, null: String), (goodId, "books")).toDF("doc_id", "source")
    val out = RowValidator.applyDefaults(df, SchemaParser.parse(schema))
    assert(out.filter(col("source") === "web").count() == 1)
    assert(out.filter(col("source") === "books").count() == 1)
  }

  test("applyDefaults fills zero prefixItems elements (validator.go:281-297)") {
    val schema = """{
      "properties": {
        "tokens": {"type": "array", "prefixItems": [
          {"type": "integer", "default": 7},
          {"type": "integer"},
          {"type": "integer", "default": 9}
        ]}
      }
    }"""
    // Go's reflect.IsZero semantics: 0 (or null) at a defaulted prefix
    // position takes the default; non-zero values and positions beyond the
    // prefix are untouched
    val df = Seq((goodId, Seq(0, 0, 0, 0)), (goodId, Seq(5, 0, 2, 0)))
      .toDF("doc_id", "tokens")
    val out = RowValidator.applyDefaults(df, SchemaParser.parse(schema))
      .select("tokens").collect().map(_.getSeq[Int](0))
    assert(out(0) == Seq(7, 0, 9, 0))
    assert(out(1) == Seq(5, 0, 2, 0))
  }

  test("applyDefaults recurses into nested object properties (validator.go:451-517)") {
    val schema = """{
      "properties": {
        "meta": {
          "type": "object",
          "required": ["kept"],
          "properties": {
            "lang": {"type": "string", "default": "en"},
            "kept": {"type": "string", "default": "MUST-NOT-APPLY"},
            "inner": {
              "type": "object",
              "properties": {"depth": {"type": "integer", "default": 3}}
            }
          }
        }
      }
    }"""
    val df = spark.sql(
      """SELECT * FROM VALUES
         ('a', named_struct('lang', CAST(NULL AS STRING), 'kept', CAST(NULL AS STRING),
                            'inner', named_struct('depth', CAST(NULL AS INT)))),
         ('b', named_struct('lang', 'fr', 'kept', 'x',
                            'inner', CAST(NULL AS STRUCT<depth: INT>))),
         ('c', CAST(NULL AS STRUCT<lang: STRING, kept: STRING, inner: STRUCT<depth: INT>>))
         AS t(doc_id, meta)""")
    val out = RowValidator.applyDefaults(df, SchemaParser.parse(schema))
      .orderBy("doc_id").collect()
    val a = out(0).getStruct(1)
    assert(a.getString(0) == "en")            // nested default applied
    assert(a.getString(1) == null)            // required at its level → skipped
    assert(a.getStruct(2).getInt(0) == 3)     // two levels deep
    val b = out(1).getStruct(1)
    assert(b.getString(0) == "fr")            // present value untouched
    assert(b.getStruct(2) == null)            // null object NOT instantiated
    assert(out(2).getStruct(1) == null)       // null outer object stays null
  }

  test("nested defaults make an invalid row valid only post-application") {
    val schema = """{
      "properties": {
        "meta": {
          "type": "object",
          "properties": {
            "lang": {"type": "string", "enum": ["en", "es"], "default": "en"}
          }
        }
      }
    }"""
    val df = spark.sql(
      """SELECT 'a' AS doc_id,
                named_struct('lang', CAST(NULL AS STRING)) AS meta""")
    val doc = SchemaParser.parse(schema)
    // pre-application: null lang fails enum nothing? null is absent → valid;
    // use a validation opts where null counts as a value to make it bite
    val optsStrict = graft.compile.CompileOpts(nullIsAbsent = false)
    assert(RowValidator.violations(df, doc, "doc_id", optsStrict).count() > 0)
    val defaulted = RowValidator.applyDefaults(df, doc)
    assert(RowValidator.violations(defaulted, doc, "doc_id", optsStrict).count() == 0)
  }

  test("items-schema defaults apply to array elements past the prefix") {
    val schema = """{
      "properties": {
        "entries": {
          "type": "array",
          "prefixItems": [{"type": "object"}],
          "items": {
            "type": "object",
            "properties": {"w": {"type": "integer", "default": 1}}
          }
        }
      }
    }"""
    val df = spark.sql(
      """SELECT 'a' AS doc_id,
         array(named_struct('w', CAST(NULL AS INT)),
               named_struct('w', CAST(NULL AS INT)),
               named_struct('w', 5)) AS entries""")
    val out = RowValidator.applyDefaults(df, SchemaParser.parse(schema))
      .selectExpr("transform(entries, e -> e.w) AS ws").collect()(0)
      .getSeq[Any](0)
    // element 0 is prefix-covered (no default there) → untouched null;
    // element 1 gets the items default; element 2 keeps its value
    assert(out == Seq(null, 1, 5))
  }

  test("numeric keywords apply to parseable strings (reference quirk validator.go:1275-1281)") {
    val schema = """{"properties": {"s": {"minimum": 10}}}"""
    val df = Seq(("a", "5"), ("b", "15"), ("c", "xyz")).toDF("id", "s")
    val doc = SchemaParser.parse(schema)
    val v = RowValidator.violations(df, doc, "id").collect()
    // "5" < 10 violates; "15" passes; "xyz" not parseable → skipped
    assert(v.map(_.getString(0)).toSet == Set("a"))
  }

  test("multipleOf matches Go Trunc semantics incl. integral floats") {
    val schema = """{"properties": {"x": {"multipleOf": 2.5}}}"""
    val df = Seq(("a", 7.5), ("b", 7.1), ("c", 5.0)).toDF("id", "x")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    assert(v.map(_.getString(0)).toSet == Set("b"))
  }

  test("uniqueItems via array_distinct") {
    val schema = """{"properties": {"tokens": {"uniqueItems": true}}}"""
    val df = Seq(("a", Array(1, 2, 3)), ("b", Array(1, 2, 1))).toDF("id", "tokens")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    assert(v.map(_.getString(0)).toSet == Set("b"))
  }

  test("allOf/anyOf/oneOf/not combinators") {
    val schema = """{
      "properties": {
        "x": {
          "allOf": [{"minimum": 0}],
          "anyOf": [{"maximum": 10}, {"minimum": 100}],
          "oneOf": [{"multipleOf": 3}, {"multipleOf": 5}],
          "not": {"const": 6}
        }
      }
    }"""
    val df = Seq(("ok9", 9L), ("ok100", 100L), ("bad6", 6L), ("bad15", 15L), ("bad50", 50L))
      .toDF("id", "x")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id")
      .select("id", "keyword").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // 9: allOf ok, anyOf ok (<=10), oneOf ok (3|9, not 5), not ok
    // 100: anyOf ok (>=100), oneOf fails (neither 3 nor 5 divides 100)... 100%5==0 → ok
    // 6: oneOf ok (3 only), not fails (const 6)
    // 15: anyOf fails (>10, <100) AND oneOf fails (both 3 and 5 divide)
    // 50: anyOf fails (>10, <100)
    assert(v == Set(("bad6", "not"), ("bad15", "anyOf"), ("bad15", "oneOf"),
      ("bad50", "anyOf")))
  }

  test("if/then/else conditional") {
    val schema = """{
      "if": {"properties": {"source": {"const": "web"}}},
      "then": {"properties": {"n_tok": {"maximum": 100}}},
      "else": {"properties": {"n_tok": {"maximum": 10}}}
    }"""
    val df = Seq(("a", "web", 50), ("b", "web", 500), ("c", "books", 5), ("d", "books", 50))
      .toDF("id", "source", "n_tok")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    assert(v.map(_.getString(0)).toSet == Set("b", "d"))
  }

  test("$ref / $defs resolution") {
    val schema = """{
      "$defs": {"tok": {"type": "integer", "minimum": 0}},
      "properties": {"tokens": {"items": {"$ref": "#/$defs/tok"}}}
    }"""
    val df = Seq(("a", Array(1, 2)), ("b", Array(1, -2))).toDF("id", "tokens")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    assert(v.map(_.getString(0)).toSet == Set("b"))
  }

  test("prefixItems + items split") {
    val schema = """{
      "properties": {"a": {
        "prefixItems": [{"const": 1}, {"const": 2}],
        "items": {"minimum": 10}
      }}
    }"""
    val df = Seq(("ok", Array(1, 2, 10, 11)), ("badPrefix", Array(9, 2)),
      ("badRest", Array(1, 2, 3))).toDF("id", "a")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    assert(v.map(_.getString(0)).toSet == Set("badPrefix", "badRest"))
  }

  test("contains / minContains / maxContains") {
    val schema = """{
      "properties": {"a": {
        "contains": {"minimum": 100},
        "minContains": 1, "maxContains": 2
      }}
    }"""
    val df = Seq(("none", Array(1, 2)), ("one", Array(100, 2)),
      ("three", Array(100, 200, 300))).toDF("id", "a")
    val v = RowValidator.violations(df, SchemaParser.parse(schema), "id").collect()
    val ids = v.map(r => (r.getString(0), r.getString(1))).toSet
    assert(ids.exists(_._1 == "none"))
    assert(ids.contains(("three", "maxContains")))
    assert(!ids.exists(_._1 == "one"))
  }

  test("sampleViolations: at most k distinct docs per keyword, deterministic") {
    import spark.implicits._
    val schema = """{"type": "object", "properties": {
      "id": {"type": "string"}, "n": {"type": "integer", "maximum": 10}}}"""
    val df = (0 until 100).map(i => (s"d$i", i.toLong)).toDF("id", "n")
    val doc = SchemaParser.parse(schema)
    val a = RowValidator.sampleViolations(df, doc, "id", k = 7)
      .as[(String, String)].collect().toSet
    assert(a.size == 7 && a.forall(_._2 == "maximum"))
    val b = RowValidator.sampleViolations(df.repartition(9), doc, "id", k = 7)
      .as[(String, String)].collect().toSet
    assert(a == b)
    // fewer violations than k: all of them appear
    val tiny = RowValidator.sampleViolations(
      df.filter(col("n") < 13), doc, "id", k = 7).count()
    assert(tiny == 2) // n = 11, 12
  }

  test("withBasicOutput: draft 2020-12 basic output JSON per row") {
    import spark.implicits._
    val schema = """{"type": "object", "properties": {
      "id": {"type": "string"}, "n": {"type": "integer", "maximum": 10}}}"""
    val df = Seq(("ok", 5L), ("bad", 15L)).toDF("id", "n")
    val out = RowValidator.withBasicOutput(df, SchemaParser.parse(schema))
      .select(col("id"), col("_basic_output")).as[(String, String)]
      .collect().toMap
    assert(out("ok") === """{"valid":true}""")
    assert(out("bad") ===
      """{"valid":false,"errors":[{"keywordLocation":"#/properties/n/maximum",""" +
      """"instanceLocation":"#/n","error":"value is larger than maximum 10.0"}]}""")
  }
}
