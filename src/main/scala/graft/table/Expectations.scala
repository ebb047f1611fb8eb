package graft.table

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative dataset-scope expectation suite — the dataset-level analogue
  * of the row engine's keyword model (and of production tools like Great
  * Expectations): a suite of named assertions about a TABLE (row counts, null
  * rates, bounds, distinct counts, set membership, regex conformance, mean /
  * quantile location) evaluated in ONE scan and reported as one verdict row
  * per expectation.
  *
  * Where the row engine asks "is this row valid?" (reference semantics,
  * `/root/reference/internal/validator/validator.go`), an expectation suite
  * asks "is this SNAPSHOT of the table healthy?" — the check a standing
  * pipeline runs before promoting a snapshot to training.
  *
  * Scale shape: every expectation lowers to aggregate expressions over the
  * same single pass (map-side combined, no shuffle of raw rows, O(1) state
  * per expectation — except exact distinct counts, which add one expand each;
  * pass `approxDistinct = true` to keep those O(1) too via HLL++). The
  * verdict report is built on the driver from the ONE collected row —
  * O(expectations), independent of table size.
  */
object Expectations {

  sealed trait Expectation {
    /** Stable name for the verdict report. */
    def name: String
  }
  /** count(*) ∈ [lo, hi]. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Expectation {
    def name = s"row_count_between($lo,$hi)"
  }
  /** fraction of NULLs in `column` ≤ max. */
  final case class NullRateMax(column: String, max: Double) extends Expectation {
    def name = s"null_rate_max($column,$max)"
  }
  /** min(column) ≥ v (NULLs ignored, like SQL min). */
  final case class MinAtLeast(column: String, v: Double) extends Expectation {
    def name = s"min_at_least($column,$v)"
  }
  /** max(column) ≤ v. */
  final case class MaxAtMost(column: String, v: Double) extends Expectation {
    def name = s"max_at_most($column,$v)"
  }
  /** avg(column) ∈ [lo, hi]. */
  final case class MeanBetween(column: String, lo: Double, hi: Double) extends Expectation {
    def name = s"mean_between($column,$lo,$hi)"
  }
  /** distinct count of `column` ∈ [lo, hi]. Exact by default (adds one
    * aggregation expand); HLL++ when the suite runs with approxDistinct. */
  final case class DistinctCountBetween(column: String, lo: Long, hi: Long) extends Expectation {
    def name = s"distinct_count_between($column,$lo,$hi)"
  }
  /** fraction of non-null values outside `allowed` ≤ maxOutRate. */
  final case class ValuesInSet(column: String, allowed: Seq[String],
                               maxOutRate: Double = 0.0) extends Expectation {
    def name = s"values_in_set($column,${allowed.size} values,$maxOutRate)"
  }
  /** fraction of non-null values matching `regex` ≥ minRate. */
  final case class MatchRegexRate(column: String, regex: String,
                                  minRate: Double) extends Expectation {
    def name = s"match_regex_rate($column,$minRate)"
  }
  /** exact `p`-quantile of `column` ∈ [lo, hi] (percentile; exact at any
    * scale the aggregation supports — swap to t-digest upstream if needed). */
  final case class QuantileBetween(column: String, p: Double,
                                   lo: Double, hi: Double) extends Expectation {
    def name = s"quantile_between($column,$p,$lo,$hi)"
  }

  /** Parse a JSON expectation suite — the declarative front door, so a
    * standing job configures its snapshot health gate from a file the way the
    * row engine configures from a schema document. Format: an array of
    * objects, each `{"kind": "...", ...args}` with kinds/args mirroring the
    * case classes 1:1 (snake_case kind, e.g.
    * `{"kind":"null_rate_max","column":"lang","max":0.0}`,
    * `{"kind":"values_in_set","column":"lang","allowed":["en"],"max_out_rate":0.1}`).
    * Unknown kinds or missing args fail fast with the offending entry. */
  def fromJson(json: String): Seq[Expectation] = {
    def num(v: JValue, what: String): Double = v match {
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"$what: expected number, got $other")
    }
    def lng(v: JValue, what: String): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case other => throw new IllegalArgumentException(s"$what: expected integer, got $other")
    }
    def str(v: JValue, what: String): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"$what: expected string, got $other")
    }
    val JArray(entries) = (JsonMethods.parse(json): @unchecked)
    entries.map { e =>
      def f(n: String): JValue = e \ n match {
        case JNothing => throw new IllegalArgumentException(
          s"expectation ${JsonMethods.compact(JsonMethods.render(e))}: missing '$n'")
        case v => v
      }
      def opt(n: String, dflt: Double): Double =
        e \ n match { case JNothing => dflt; case v => num(v, n) }
      str(f("kind"), "kind") match {
        case "row_count_between" =>
          RowCountBetween(lng(f("lo"), "lo"), lng(f("hi"), "hi"))
        case "null_rate_max" =>
          NullRateMax(str(f("column"), "column"), num(f("max"), "max"))
        case "min_at_least" =>
          MinAtLeast(str(f("column"), "column"), num(f("v"), "v"))
        case "max_at_most" =>
          MaxAtMost(str(f("column"), "column"), num(f("v"), "v"))
        case "mean_between" =>
          MeanBetween(str(f("column"), "column"), num(f("lo"), "lo"), num(f("hi"), "hi"))
        case "distinct_count_between" =>
          DistinctCountBetween(str(f("column"), "column"),
            lng(f("lo"), "lo"), lng(f("hi"), "hi"))
        case "values_in_set" =>
          val JArray(vals) = (f("allowed"): @unchecked)
          ValuesInSet(str(f("column"), "column"),
            vals.map(str(_, "allowed[]")), opt("max_out_rate", 0.0))
        case "match_regex_rate" =>
          MatchRegexRate(str(f("column"), "column"), str(f("regex"), "regex"),
            num(f("min_rate"), "min_rate"))
        case "quantile_between" =>
          QuantileBetween(str(f("column"), "column"), num(f("p"), "p"),
            num(f("lo"), "lo"), num(f("hi"), "hi"))
        case other => throw new IllegalArgumentException(s"unknown expectation kind '$other'")
      }
    }
  }

  /** The input column an expectation reads, if any (RowCountBetween: none) —
    * lets ValidationPipeline include expectation columns in its scan digest. */
  private[graft] def columnOf(e: Expectation): Option[String] = e match {
    case RowCountBetween(_, _) => None
    case NullRateMax(c, _) => Some(c)
    case MinAtLeast(c, _) => Some(c)
    case MaxAtMost(c, _) => Some(c)
    case MeanBetween(c, _, _) => Some(c)
    case DistinctCountBetween(c, _, _) => Some(c)
    case ValuesInSet(c, _, _) => Some(c)
    case MatchRegexRate(c, _, _) => Some(c)
    case QuantileBetween(c, _, _, _) => Some(c)
  }

  /** The aggregate observation an expectation needs, plus its acceptance
    * bounds: passed = lo ≤ observed ≤ hi (NaN observed never passes). */
  private[graft] def lowered(e: Expectation): (Column, Double, Double) = e match {
    case RowCountBetween(lo, hi) =>
      (count(lit(1)).cast(DoubleType), lo.toDouble, hi.toDouble)
    case NullRateMax(c, mx) =>
      (coalesce(avg(col(c).isNull.cast(DoubleType)), lit(0.0)), 0.0, mx)
    case MinAtLeast(c, v) => (min(col(c)).cast(DoubleType), v, Double.MaxValue)
    case MaxAtMost(c, v) => (max(col(c)).cast(DoubleType), -Double.MaxValue, v)
    case MeanBetween(c, lo, hi) => (avg(col(c)).cast(DoubleType), lo, hi)
    case DistinctCountBetween(c, lo, hi) =>
      (countDistinct(col(c)).cast(DoubleType), lo.toDouble, hi.toDouble)
    case ValuesInSet(c, allowed, mx) =>
      (coalesce(avg((!col(c).cast(StringType).isin(allowed: _*)).cast(DoubleType)),
        lit(0.0)), 0.0, mx)
    case MatchRegexRate(c, re, mn) =>
      (coalesce(avg(col(c).cast(StringType).rlike(re).cast(DoubleType)), lit(0.0)),
        mn, 1.0)
    case QuantileBetween(c, p, lo, hi) =>
      (expr(s"percentile($c, ${p}D)").cast(DoubleType), lo, hi)
  }

  /** Sufficient-statistics lowering for INCREMENTAL evaluation
    * ([[graft.run.IncrementalValidation]]): `state` aggregates one delta's
    * rows into named columns, `merge` folds those columns across all
    * persisted delta states, `observed` reads the merged columns back into
    * the expectation's observation — so a standing job's expectation verdicts
    * stay exact across appends (counts/sums/min/max fold losslessly) without
    * ever rescanning validated data. Distinct counts merge via HLL union and
    * quantiles via t-digest merge (`approx = true`: sketch-accurate, the
    * same trade the manifest's own distinct/quantile metrics make). */
  private[graft] final case class Mergeable(
      stateNames: Seq[String], state: Seq[Column], merge: Seq[Column],
      observed: Column, lo: Double, hi: Double, approx: Boolean)

  private[graft] def loweredMergeable(e: Expectation, tag: String): Mergeable = {
    val a = s"expst_${tag}_a"
    val b = s"expst_${tag}_b"
    def sumAB(sa: Column, sb: Column) = Seq(sa.as(a), sb.as(b))
    def mergeSums = Seq(sum(col(a)).as(a), sum(col(b)).as(b))
    e match {
      case RowCountBetween(lo, hi) => Mergeable(Seq(a),
        Seq(count(lit(1)).as(a)), Seq(sum(col(a)).as(a)),
        col(a).cast(DoubleType), lo.toDouble, hi.toDouble, approx = false)
      case NullRateMax(c, mx) => Mergeable(Seq(a, b),
        sumAB(sum(col(c).isNull.cast(LongType)), count(lit(1))), mergeSums,
        col(a).cast(DoubleType) / col(b), 0.0, mx, approx = false)
      case MinAtLeast(c, v) => Mergeable(Seq(a),
        Seq(min(col(c)).cast(DoubleType).as(a)), Seq(min(col(a)).as(a)),
        col(a), v, Double.MaxValue, approx = false)
      case MaxAtMost(c, v) => Mergeable(Seq(a),
        Seq(max(col(c)).cast(DoubleType).as(a)), Seq(max(col(a)).as(a)),
        col(a), -Double.MaxValue, v, approx = false)
      case MeanBetween(c, lo, hi) => Mergeable(Seq(a, b),
        sumAB(sum(col(c).cast(DoubleType)), count(col(c))), mergeSums,
        col(a) / col(b), lo, hi, approx = false)
      case DistinctCountBetween(c, lo, hi) => Mergeable(Seq(a),
        Seq(hll_sketch_agg(col(c).cast(StringType)).as(a)),
        Seq(hll_union_agg(col(a)).as(a)),
        hll_sketch_estimate(col(a)).cast(DoubleType),
        lo.toDouble, hi.toDouble, approx = true)
      case ValuesInSet(c, allowed, mx) => Mergeable(Seq(a, b),
        sumAB(sum((!col(c).cast(StringType).isin(allowed: _*)).cast(LongType)),
          count(col(c))), mergeSums,
        coalesce(col(a).cast(DoubleType) / col(b), lit(0.0)), 0.0, mx, approx = false)
      case MatchRegexRate(c, re, mn) => Mergeable(Seq(a, b),
        sumAB(sum(col(c).cast(StringType).rlike(re).cast(LongType)), count(col(c))),
        mergeSums,
        coalesce(col(a).cast(DoubleType) / col(b), lit(0.0)), mn, 1.0, approx = false)
      case QuantileBetween(c, p, lo, hi) => Mergeable(Seq(a),
        Seq(graft.functions.TDigestSketch(col(c)).as(a)),
        Seq(graft.functions.TDigestMerge(col(a)).as(a)),
        udf((bytes: Array[Byte]) => graft.functions.TDigestBytes.quantile(bytes, p))
          .apply(col(a)).cast(DoubleType), lo, hi, approx = true)
    }
  }

  private[graft] def loweredApprox(e: Expectation): (Column, Double, Double) = e match {
    case DistinctCountBetween(c, lo, hi) =>
      (approx_count_distinct(col(c)).cast(DoubleType), lo.toDouble, hi.toDouble)
    case other => lowered(other)
  }

  /** Evaluate the suite in one aggregation pass. Returns one row per
    * expectation: (expectation, observed, lo, hi, passed) in suite order.
    * `approxDistinct` swaps exact distinct counts for HLL++ (O(1) state; use
    * at scales where the exact expand is the bottleneck — thresholds must
    * then tolerate the sketch's ~2% error). */
  def check(df: DataFrame, suite: Seq[Expectation],
            approxDistinct: Boolean = false): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val spark = df.sparkSession
    val low = suite.map(if (approxDistinct) loweredApprox else lowered)
    val aggs = low.zipWithIndex.map { case ((c, _, _), i) => c.as(s"_e$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    val out = suite.zip(low).zipWithIndex.map { case ((e, (_, lo, hi)), i) =>
      val obs: java.lang.Double =
        if (row.isNullAt(i)) null else java.lang.Double.valueOf(row.getDouble(i))
      // a NULL observation (e.g. min of an all-null column) is a failed
      // expectation about location, but a vacuously-passed rate (avg handled
      // by the coalesce(0.0) above) — only location checks can observe null
      val passed = obs != null && obs >= lo && obs <= hi
      Row(e.name, obs, lo, hi, passed)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("expectation", StringType, nullable = false),
        StructField("observed", DoubleType, nullable = true),
        StructField("lo", DoubleType, nullable = false),
        StructField("hi", DoubleType, nullable = false),
        StructField("passed", BooleanType, nullable = false))))
  }

  /** True iff every expectation in the suite passed. */
  def passes(df: DataFrame, suite: Seq[Expectation],
             approxDistinct: Boolean = false): Boolean =
    check(df, suite, approxDistinct).filter(!col("passed")).isEmpty

  /** Per-partition expectation suite: evaluate every expectation within each
    * group of `byCol` — the per-partition verdict form of [[check]] ("every
    * source must individually satisfy the health gate", not just the table in
    * aggregate). One row per (group, expectation).
    *
    * Scale shape: ONE grouped aggregation pass (map-side combined, one
    * exchange on `byCol`); the per-expectation verdict projections run over
    * the |groups|-sized aggregate, unioned — still |groups × expectations|
    * rows total, never a second scan of the data. */
  def checkBy(df: DataFrame, byCol: String, suite: Seq[Expectation],
              approxDistinct: Boolean = false): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val low = suite.map(if (approxDistinct) loweredApprox else lowered)
    val aggs = low.zipWithIndex.map { case ((c, _, _), i) => c.as(s"_e$i") }
    val grouped = df.groupBy(col(byCol)).agg(aggs.head, aggs.tail: _*)
      // |groups|-sized; reused by every per-expectation projection below
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = suite.zip(low).zipWithIndex.map { case ((e, (_, lo, hi)), i) =>
      val obs = col(s"_e$i").cast(DoubleType)
      grouped.select(col(byCol), lit(e.name).as("expectation"),
        obs.as("observed"), lit(lo).as("lo"), lit(hi).as("hi"),
        coalesce(obs >= lo && obs <= hi, lit(false)).as("passed"))
    }.reduce(_ unionByName _)
    out
  }
}
