package graft

import graft.compile.{ConstraintRegistry, Formats}
import graft.model.SchemaParser
import graft.row.RowValidator
import org.apache.spark.sql.functions._
import org.json4s.JInt

/** Extension points: custom format validators (RegisterFormatValidator
  * analogue, validator.go:1237-1244) and custom keyword compilers
  * (Vocabulary-registry analogue, schema.go:1218-1291). */
class ExtensionSpec extends SparkSpec {

  test("custom format validator registers and validates") {
    Formats.register("even-length", c => length(c) % 2 === 0)
    try {
      import spark.implicits._
      val df = Seq("ab", "abc", "abcd").toDF("value")
      val got = df.select(RowValidator.validColumn(df,
        """{"format": "even-length"}""",
        opts = graft.compile.CompileOpts(nullIsAbsent = false)).as("ok"))
        .collect().map(_.getBoolean(0)).toSeq
      assert(got === Seq(true, false, true))
    } finally Formats.register("even-length", _ => lit(true))
  }

  test("custom keyword compiler: maxTokenSum over the tokens array") {
    ConstraintRegistry.register("maxTokenSum") { (arg, target, dt) =>
      dt match {
        case org.apache.spark.sql.types.ArrayType(_, _) =>
          val bound = arg.asInstanceOf[JInt].num.toLong
          Some((aggregate(target, lit(0L), (a, x) => a + x.cast("long")) <= bound,
            s"token sum exceeds $bound"))
        case _ => None
      }
    }
    try {
      import spark.implicits._
      val df = Seq((1, Array(1, 2, 3)), (2, Array(100, 200))).toDF("id", "tokens")
      val schema =
        """{"properties": {"tokens": {"maxTokenSum": 10}}}"""
      val out = RowValidator.violations(df, SchemaParser.parse(schema), "id")
      val rows = out.select("id", "keyword", "message").collect()
      assert(rows.length === 1)
      assert(rows(0).getInt(0) === 2)
      assert(rows(0).getString(1) === "maxTokenSum")
      assert(rows(0).getString(2) === "token sum exceeds 10")
    } finally ConstraintRegistry.unregister("maxTokenSum")
  }

  test("unregistered unknown keywords stay always-valid") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("id", "v")
    val out = RowValidator.violations(df,
      SchemaParser.parse("""{"properties": {"v": {"totallyUnknown": 42}}}"""), "id")
    assert(out.count() === 0)
  }
}
