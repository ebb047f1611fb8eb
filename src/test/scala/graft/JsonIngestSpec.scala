package graft

import graft.model.SchemaParser
import graft.sources.JsonIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonIngestSpec extends SparkSpec {

  private val schema =
    """{
      "type": "object",
      "required": ["id", "score"],
      "properties": {
        "id": {"type": "string", "minLength": 2},
        "score": {"type": "number", "minimum": 0, "maximum": 1},
        "tags": {"type": "array", "items": {"type": "string", "maxLength": 5}}
      }
    }"""

  test("structTypeFor derives the read contract from the schema") {
    val dt = JsonIngest.structTypeFor(SchemaParser.parse(schema).root)
    val st = dt.asInstanceOf[StructType]
    assert(st("id").dataType === StringType && !st("id").nullable)
    assert(st("score").dataType === DoubleType)
    assert(st("tags").dataType === ArrayType(StringType, containsNull = true))
    assert(st("tags").nullable)
  }

  test("ingest: parse + validate + malformed accounting") {
    import spark.implicits._
    val doc = SchemaParser.parse(schema)
    val df = Seq(
      """{"id": "ab", "score": 0.5, "tags": ["x"]}""",    // valid
      """{"id": "a", "score": 0.5}""",                    // minLength
      """{"id": "ab", "score": 1.5}""",                   // maximum
      """{"id": "ab", "score": 0.1, "tags": ["toolong"]}""", // items maxLength
      """{"score": 0.2}""",                               // required id
      """not json at all{{{"""                            // malformed
    ).toDF("raw")
    val out = JsonIngest.ingest(df, "raw", doc)
    val rows = out.select(col("_valid"),
      transform(col("_violations"), v => v.getField("keyword")).as("kws")).collect()
    assert(rows(0).getBoolean(0) === true)
    assert(rows(1).getSeq[String](1) === Seq("minLength"))
    assert(rows(2).getSeq[String](1) === Seq("maximum"))
    assert(rows(3).getSeq[String](1) === Seq("maxLength"))
    assert(rows(4).getSeq[String](1) === Seq("required"))
    assert(rows(5).getSeq[String](1) === Seq("$json"))
  }
}
