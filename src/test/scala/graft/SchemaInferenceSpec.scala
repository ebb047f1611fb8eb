package graft

import org.apache.spark.sql.functions._
import graft.expr.CappedCollectSet
import graft.model.{SchemaInference, SchemaParser}
import graft.row.RowValidator

/** Data-driven schema inference: one-scan profiling, bounded-state enum
  * domains, and the profile→infer→validate round trip. */
class SchemaInferenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10.5, "US", Some("x")),
    (2L, "beta", -3.25, "DE", None),
    (3L, "gamma-long", 99.0, "US", Some("y")),
    (4L, "d", 0.0, "FR", Some("x"))
  ).toDF("id", "name", "score", "country", "opt")

  test("CappedCollectSet is exact under the cap and recognizably over it") {
    val vals = (1 to 100).map(i => s"v${i % 10}") // 10 distinct, many dupes
    val small = vals.toDF("v")
      .agg(sort_array(CappedCollectSet(col("v"), 16)).as("dom"))
      .as[Seq[String]].head()
    assert(small == (0 to 9).map(i => s"v$i").sorted)

    val big = (1 to 1000).map(i => s"u$i").toDF("v")
      .repartition(8) // force merges across partial buffers
      .agg(CappedCollectSet(col("v"), 16).as("dom"))
      .as[Seq[String]].head()
    assert(big.size > 16, s"over-cap domain must exceed cap, got ${big.size}")
    assert(big.distinct.size == big.size, "set semantics: no duplicates")
  }

  test("profile: one-scan facets match hand-computed values") {
    val p = SchemaInference.profile(df, enumCap = 3)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap

    assert(p("id").getAs[String]("json_type") == "integer")
    assert(p("id").getAs[Boolean]("required"))
    assert(p("id").getAs[Double]("min_num") == 1.0 &&
           p("id").getAs[Double]("max_num") == 4.0)

    assert(p("score").getAs[String]("json_type") == "number")
    assert(p("score").getAs[Double]("min_num") == -3.25 &&
           p("score").getAs[Double]("max_num") == 99.0)

    // 4 distinct names > cap 3 → no enum; length facets present
    assert(p("name").isNullAt(p("name").fieldIndex("enum_csv")))
    assert(p("name").getAs[Long]("min_len") == 1L &&
           p("name").getAs[Long]("max_len") == 10L)

    // 3 distinct countries ≤ cap → exact sorted domain
    assert(p("country").getAs[String]("enum_csv") == "DE\u001fFR\u001fUS")

    // column with a null is not required
    assert(!p("opt").getAs[Boolean]("required"))
    assert(p("opt").getAs[String]("enum_csv") == "x\u001fy")
  }

  test("round trip: inferred schema validates every profiled row") {
    val json = SchemaInference.inferJson(df, enumCap = 3)
    val doc = SchemaParser.parse(json)
    assert(RowValidator.violations(df, doc, "id").count() == 0)
  }

  test("enum values containing '|' survive the domain encoding round trip") {
    // the domain separator is U+001F, so a pipe inside a VALUE must not
    // split it into bogus enum members
    val piped = Seq(("1", "a|b"), ("2", "c")).toDF("id", "v")
    val doc = SchemaParser.parse(SchemaInference.inferJson(piped, enumCap = 8))
    assert(RowValidator.violations(piped, doc, "id").count() == 0)
    // an in-domain id with a pipe FRAGMENT as v: only v's enum fires
    val bad = Seq(("1", "a")).toDF("id", "v")
    assert(RowValidator.violations(bad, doc, "id").count() == 1)
  }

  test("round trip: out-of-domain rows violate the inferred schema") {
    val json = SchemaInference.inferJson(df, enumCap = 3)
    val doc = SchemaParser.parse(json)
    val bad = Seq(
      (2L, "zeta", 1000.0, "US", Some("x")),  // score > inferred maximum
      (3L, "eta", 1.0, "JP", Some("x")),      // country outside inferred enum
      (4L, "this-name-is-way-too-long", 1.0, "US", Some("z"))
      // ^ name beyond inferred maxLength 10; opt outside inferred enum {x,y}
      //   (opt is NOT required: the profiled data contained a null)
    ).toDF("id", "name", "score", "country", "opt")
    val v = RowValidator.violations(bad, doc, "id")
      .select(col("id"), col("keyword")).as[(Long, String)].collect().toSet
    assert(v.contains((2L, "maximum")), s"got $v")
    assert(v.contains((3L, "enum")), s"got $v")
    assert(v.contains((4L, "maxLength")), s"got $v")
    assert(v.contains((4L, "enum")), s"got $v")
  }

  test("inferred JSON is deterministic and parseable") {
    val a = SchemaInference.inferJson(df)
    val b = SchemaInference.inferJson(df)
    assert(a == b)
    assert(a.contains("\"minimum\"") && a.contains("\"enum\""))
  }

  test("profileDrift: widened bounds, new enum values, new nulls, added/removed columns") {
    val base = Seq(
      (1L, "alpha", 10.0, "US"),
      (2L, "beta", 20.0, "DE")
    ).toDF("id", "name", "score", "country")
    val cur = Seq(
      (0L, "much-longer-name", 99.0, "US", Option.empty[String]),
      (2L, "b", 20.0, "JP", Some("x"))
    ).toDF("id", "name", "score", "country", "extra")
      .withColumn("country", when(col("id") === 0L, lit(null)).otherwise(col("country")))
    val d = SchemaInference.profileDrift(cur, base, enumCap = 3)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap

    assert(d("extra").getAs[String]("status") == "added")
    assert(d("id").getAs[Boolean]("bounds_widened"))   // min 0 < 1
    assert(d("score").getAs[Boolean]("bounds_widened")) // max 99 > 20
    assert(d("name").getAs[Boolean]("length_widened")) // 16 > 5 and 1 < 4
    assert(d("country").getAs[Boolean]("new_nulls"))   // was required, now null
    assert(d("country").getAs[String]("new_enum_values") == "JP")
    assert(d("name").getAs[String]("new_enum_values") == "b|much-longer-name")
    assert(!d("score").getAs[Boolean]("type_changed"))

    // removed column
    val d2 = SchemaInference.profileDrift(base.drop("country"), base, enumCap = 3)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(d2("country").getAs[String]("status") == "removed")
  }
}
