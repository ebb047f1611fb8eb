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

  test("SQL function surface: graft_* functions match the Column API") {
    import spark.implicits._
    graft.sql.GraftFunctions.register(spark)
    Seq(("42", "the quick brown fox", Array(1, 2, 3, 4, 5)))
      .toDF("id", "text", "tokens").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT graft_ascii_tokens(text) AS toks,
                graft_shingles3(tokens) AS sh,
                graft_minhash(graft_shingles3(tokens), 4, 42) AS mh,
                graft_simhash32(tokens, 42) AS sim,
                graft_fingerprint(tokens) AS fp,
                graft_dot(CAST(ARRAY(1.0, 2.0) AS ARRAY<DOUBLE>),
                          CAST(ARRAY(3.0, 4.0) AS ARRAY<DOUBLE>)) AS dp
         FROM ext_docs""").collect()(0)

    val viaApi = spark.table("ext_docs").select(
      graft.expr.TextExprs.asciiTokens(col("text")).as("toks"),
      graft.table.Dedup.shingles3(col("tokens")).as("sh"),
      graft.table.Dedup.minhashSignature(col("tokens"),
        graft.table.Dedup.minhashCoeffs(4, 42)).as("mh"),
      graft.table.Dedup.simhash32(col("tokens"), 42).as("sim"),
      graft.table.TextAnalysis.fingerprint(col("tokens")).as("fp")).collect()(0)

    assert(viaSql.getSeq[Int](0) == viaApi.getSeq[Int](0))
    assert(viaSql.getSeq[Long](1) == viaApi.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) == viaApi.getSeq[Long](2))
    assert(viaSql.getLong(3) == viaApi.getLong(3))
    assert(viaSql.getLong(4) == viaApi.getLong(4))
    assert(math.abs(viaSql.getDouble(5) - 11.0) < 1e-12)

    // pii redaction from SQL matches the Column composition
    val sqlRed = spark.sql(
      "SELECT graft_pii_redact('mail a@b.co call 555-867-5309')").collect()(0).getString(0)
    assert(sqlRed === "mail <EMAIL> call <PHONE>")

    // uncast SQL literals (DECIMAL arrays) must be coerced, not silently
    // reinterpreted bit-wise
    val rawDot = spark.sql("SELECT graft_dot(array(1.0, 2.0), array(3.0, 4.0))")
      .collect()(0).getDouble(0)
    assert(math.abs(rawDot - 11.0) < 1e-12)
    val e = intercept[Exception](spark.sql("SELECT graft_minhash(array(1L))").collect())
    assert(e.getMessage.contains("graft_minhash expects"))

    // bucket ids from SQL match Similarity.lshBucket with the same planes
    val planes = graft.table.Similarity.hyperplaneSigns(4, 2, 42)
    val sqlBucket = spark.sql(
      """SELECT graft_lsh_bucket(CAST(ARRAY(0.5, -1.5) AS ARRAY<DOUBLE>), 2, 4, 42)""")
      .collect()(0).getLong(0)
    val apiBucket = Seq(Tuple1(Array(0.5, -1.5))).toDF("v")
      .select(graft.table.Similarity.lshBucket(col("v"), planes)).collect()(0).getLong(0)
    assert(sqlBucket == apiBucket)
  }
}
