package graft

import graft.table.Expectations
import graft.table.Expectations._
import org.apache.spark.sql.functions._

/** Dataset-scope expectation suites: one-scan evaluation, verdict report. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 10, "en"), ("b", 20, "en"), ("c", 30, "de"),
    ("d", 40, "fr"), ("e", 50, "xx")
  ).toDF("id", "n", "lang")

  test("all expectation kinds evaluate in one pass with correct verdicts") {
    val r = Expectations.check(df, Seq(
      RowCountBetween(5, 5),                    // pass
      RowCountBetween(6, 10),                   // fail
      NullRateMax("lang", 0.0),                 // pass (no nulls)
      MinAtLeast("n", 10.0),                    // pass (min=10)
      MinAtLeast("n", 11.0),                    // fail
      MaxAtMost("n", 50.0),                     // pass
      MeanBetween("n", 29.0, 31.0),             // pass (mean=30)
      DistinctCountBetween("lang", 4, 4),       // pass (en,de,fr,xx)
      ValuesInSet("lang", Seq("en", "de", "fr"), 0.2),  // pass (1/5 out)
      ValuesInSet("lang", Seq("en", "de", "fr"), 0.1),  // fail
      MatchRegexRate("id", "^[a-z]$", 1.0),     // pass
      QuantileBetween("n", 0.5, 30.0, 30.0)     // pass (exact median)
    )).collect()
    val byName = r.map(x => x.getString(0) -> x.getBoolean(4)).toMap
    assert(byName("row_count_between(5,5)"))
    assert(!byName("row_count_between(6,10)"))
    assert(byName("null_rate_max(lang,0.0)"))
    assert(byName("min_at_least(n,10.0)"))
    assert(!byName("min_at_least(n,11.0)"))
    assert(byName("max_at_most(n,50.0)"))
    assert(byName("mean_between(n,29.0,31.0)"))
    assert(byName("distinct_count_between(lang,4,4)"))
    assert(byName("values_in_set(lang,3 values,0.2)"))
    assert(!byName("values_in_set(lang,3 values,0.1)"))
    assert(byName("match_regex_rate(id,1.0)"))
    assert(byName("quantile_between(n,0.5,30.0,30.0)"))
    // observed values surface in the report
    val obs = r.map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(obs("mean_between(n,29.0,31.0)") == 30.0)
    assert(obs("values_in_set(lang,3 values,0.2)") == 0.2)
  }

  test("null observations fail location checks; rates treat nulls correctly") {
    val withNulls = Seq((Some(1), "x"), (None, "y"), (None, null))
      .toDF("v", "s")
    val allNull = withNulls.filter(col("v").isNull)
    // min over an all-null column observes null -> failed
    val r = Expectations.check(allNull, Seq(MinAtLeast("v", 0.0))).head()
    assert(r.isNullAt(1) && !r.getBoolean(4))
    // null rate counts nulls over ALL rows; regex rate is over non-null only
    val r2 = Expectations.check(withNulls, Seq(
      NullRateMax("v", 0.7),                  // 2/3 null ≤ 0.7
      MatchRegexRate("s", "^[xy]$", 1.0)      // nulls excluded: 2/2 match
    )).collect()
    assert(r2.forall(_.getBoolean(4)))
  }

  test("checkBy: per-group verdicts match per-group check()") {
    val data = Seq(
      ("a", 10), ("a", 20), ("a", 30),          // mean 20
      ("b", 100), ("b", 200), ("b", 300), ("b", 400) // mean 250
    ).toDF("g", "n")
    val suite = Seq(
      MeanBetween("n", 0.0, 100.0),   // a passes, b fails
      RowCountBetween(3, 3),          // a passes, b fails
      MinAtLeast("n", 50.0))          // a fails, b passes
    val r = Expectations.checkBy(data, "g", suite)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getBoolean(5)).toMap
    assert(r(("a", "mean_between(n,0.0,100.0)")) && !r(("b", "mean_between(n,0.0,100.0)")))
    assert(r(("a", "row_count_between(3,3)")) && !r(("b", "row_count_between(3,3)")))
    assert(!r(("a", "min_at_least(n,50.0)")) && r(("b", "min_at_least(n,50.0)")))
    // agrees with running check() on each group separately
    for (g <- Seq("a", "b")) {
      val solo = Expectations.check(data.filter(col("g") === g), suite)
        .collect().map(x => x.getString(0) -> x.getBoolean(4)).toMap
      solo.foreach { case (name, p) => assert(r((g, name)) == p, s"$g/$name") }
    }
  }

  test("fromJson round-trips every kind and fails fast on bad entries") {
    val suite = Expectations.fromJson("""[
      {"kind":"row_count_between","lo":5,"hi":5},
      {"kind":"null_rate_max","column":"lang","max":0.0},
      {"kind":"min_at_least","column":"n","v":10.0},
      {"kind":"max_at_most","column":"n","v":50.0},
      {"kind":"mean_between","column":"n","lo":29.0,"hi":31.0},
      {"kind":"distinct_count_between","column":"lang","lo":4,"hi":4},
      {"kind":"values_in_set","column":"lang","allowed":["en","de","fr"],"max_out_rate":0.2},
      {"kind":"match_regex_rate","column":"id","regex":"^[a-z]$","min_rate":1.0},
      {"kind":"quantile_between","column":"n","p":0.5,"lo":30.0,"hi":30.0}
    ]""")
    assert(suite.size == 9)
    assert(Expectations.passes(df, suite))
    // defaulted max_out_rate = 0.0
    assert(Expectations.fromJson(
      """[{"kind":"values_in_set","column":"c","allowed":["x"]}]""").head ==
      ValuesInSet("c", Seq("x"), 0.0))
    intercept[IllegalArgumentException] {
      Expectations.fromJson("""[{"kind":"no_such_kind"}]""")
    }
    intercept[IllegalArgumentException] {
      Expectations.fromJson("""[{"kind":"null_rate_max","column":"c"}]""")
    }
  }

  test("approxDistinct keeps the verdict with sketch-tolerant thresholds") {
    val many = (1 to 1000).map(i => s"v$i").toDF("c")
    val r = Expectations.check(many,
      Seq(DistinctCountBetween("c", 900, 1100)), approxDistinct = true).head()
    assert(r.getBoolean(4))
    assert(Expectations.passes(many, Seq(DistinctCountBetween("c", 990, 1010))))
  }
}
