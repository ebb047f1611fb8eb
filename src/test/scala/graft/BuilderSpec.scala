package graft

import graft.model._
import graft.row.RowValidator
import graft.tokens.TokenSeqs
import org.apache.spark.sql.Encoders

/** §2.7 surface: fluent builder (pkg/builder/builder.go:40-181), type
  * inference (builder.go:241-625), deterministic marshal (schema.go:211-367). */
case class BuilderSpecTokenSeq(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

class BuilderSpec extends SparkSpec {


  private def canonicalViaBuilder: Schema =
    Schema.obj(
      "doc_id" -> Schema.string.format("uuid"),
      "tokens" -> Schema.array(Schema.integer.min(0).max(4095)).minItems(1).maxItems(8192),
      "n_tok" -> Schema.integer.min(1).max(8192),
      "source" -> Schema.string.enumOf("web", "books", "code", "wiki")
    ).required("doc_id", "tokens", "n_tok", "source")

  test("builder DSL compiles to the same verdicts as parsed JSON") {
    val df = TokenSeqs.synthesize(spark, 2000, seed = 7L, violationRate = 0.05)
    val viaJson = RowValidator.withValidation(df,
      SchemaParser.parse(TokenSeqs.canonicalSchemaJson()))
      .filter(!org.apache.spark.sql.functions.col("_valid")).count()
    val viaBuilder = RowValidator.withValidation(df,
      SchemaParser.parseJValue(Marshal.toJValue(canonicalViaBuilder.toNode)))
      .filter(!org.apache.spark.sql.functions.col("_valid")).count()
    assert(viaJson === viaBuilder)
    assert(viaJson > 0)
  }

  test("infer from case class encoder: required + items + bounds") {
    val node = Infer.fromEncoder(Encoders.product[BuilderSpecTokenSeq])
    val ObjSchema(kws) = node: @unchecked
    val req = kws.collectFirst { case RequiredK(ns) => ns }.get
    // primitives (Int) are non-nullable in the encoder schema; strings/arrays nullable
    assert(req.contains("n_tok"))
    val props = kws.collectFirst { case PropertiesK(ps) => ps.toMap }.get
    val ObjSchema(tokKws) = props("tokens"): @unchecked
    assert(tokKws.contains(TypeK(Set("array"))))
    val ObjSchema(ntokKws) = props("n_tok"): @unchecked
    assert(ntokKws.contains(MinimumK(Int.MinValue)) && ntokKws.contains(MaximumK(Int.MaxValue)))
    assert(kws.contains(AdditionalPropertiesK(BoolSchema(false))))
    // inferred schema accepts every row of the matching Dataset
    import spark.implicits._
    val ds = Seq(BuilderSpecTokenSeq("a", Array(1, 2), 2, "web")).toDS()
    val invalid = RowValidator.withValidation(ds.toDF(),
      SchemaParser.parseJValue(Marshal.toJValue(node)))
      .filter(!org.apache.spark.sql.functions.col("_valid")).count()
    assert(invalid === 0)
  }

  test("marshal round-trips the canonical schema deterministically") {
    val doc = SchemaParser.parse(TokenSeqs.canonicalSchemaJson())
    val j1 = Marshal.toJson(doc.root)
    val reparsed = SchemaParser.parse(j1)
    val j2 = Marshal.toJson(reparsed.root)
    assert(j1 === j2)
    // semantic round-trip: canonical forms agree (keyword order canonicalizes)
    assert(Marshal.toJValue(reparsed.root) === Marshal.toJValue(doc.root))
  }

  test("marshal emits bool schemas in short form") {
    val doc = SchemaParser.parse("""{"additionalProperties": false, "items": true}""")
    val j = Marshal.toJson(doc.root)
    assert(j.contains(""""additionalProperties":false"""))
    assert(j.contains(""""items":true"""))
  }
}
