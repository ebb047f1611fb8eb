package graft

import graft.table.TextAnalysis
import org.apache.spark.sql.functions._

/** DSIR importance weighting: hashed-bigram log-ratio scores vs a target
  * corpus (Xie et al. 2023), exact integer scoring, deterministic selection. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-like docs repeat "the cat sat" patterns; off-target docs are digits
  private lazy val docs = ((0 until 60).map { i =>
    (i.toLong, if (i < 30) s"the cat sat on the mat $i" else s"11 22 33 44 55 $i", i < 30)
  }).toDF("id", "text", "is_target")

  private def toks = graft.expr.TextExprs.asciiTokens(col("text"))

  test("weights separate target-like from off-target documents") {
    val target = docs.filter(col("is_target"))
    val w = TextAnalysis.dsirLogWeights(docs, target, "id", toks)
      .join(docs.select("id", "is_target"), "id")
    val avg = w.groupBy("is_target").agg(expr("avg(w_scaled)").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(avg(true) > avg(false),
      s"target avg ${avg(true)} should exceed off-target ${avg(false)}")
    // every target doc outranks every off-target doc in this clean split
    val minT = w.filter(col("is_target")).agg(min("w_scaled")).as[Long].head()
    val maxO = w.filter(!col("is_target")).agg(max("w_scaled")).as[Long].head()
    assert(minT > maxO)
  }

  test("scores are deterministic under repartitioning and exact integers") {
    val target = docs.filter(col("is_target"))
    val a = TextAnalysis.dsirLogWeights(docs, target, "id", toks)
      .select("id", "w_scaled").as[(Long, Long)].collect().toMap
    val b = TextAnalysis.dsirLogWeights(docs.repartition(7), target, "id", toks)
      .select("id", "w_scaled").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("short documents (under 2 tokens) score zero, not null") {
    val tiny = Seq((1L, "one"), (2L, ""), (3L, "a b"), (4L, "x y")).toDF("id", "text")
    val w = TextAnalysis.dsirLogWeights(tiny, tiny.filter(col("id") === 3), "id", toks)
      .select("id", "w_scaled").as[(Long, Long)].collect().toMap
    // 0- and 1-token docs score an exact 0; the target's own bigram scores > 0
    assert(w(1L) == 0L && w(2L) == 0L && w(3L) > 0L && w(4L) < 0L)
  }

  test("ratio table matches a plain-Scala replay") {
    val tc = TextAnalysis.hashedBigramCounts(docs.filter(col("is_target")), toks, 64)
    val rc = TextAnalysis.hashedBigramCounts(docs, toks, 64)
    val table = TextAnalysis.dsirRatioTable(tc, rc)
    val b = 64
    val tt = tc.sum + 0.5 * b; val tr = rc.sum + 0.5 * b
    (0 until b).foreach { i =>
      val d = math.log((tc(i) + 0.5) / tt) - math.log((rc(i) + 0.5) / tr)
      assert(table(i) == Math.floor(1e6 * d + 0.5).toLong)
    }
  }

  test("top-fraction selection keeps the target-heavy head, deterministically") {
    val target = docs.filter(col("is_target"))
    val w = TextAnalysis.dsirLogWeights(docs, target, "id", toks)
    val kept = TextAnalysis.dsirSelectTopFraction(w, 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept.size >= 30)
    // the 30 target docs all rank above every off-target doc
    assert((0L until 30L).toSet.subsetOf(kept))
    val kept2 = TextAnalysis.dsirSelectTopFraction(w, 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == kept2)
  }

  test("above the distinct-weight cap, selection routes to approxQuantile") {
    // 10k rows, every weight distinct — with exactDistinctCap below that,
    // the exact histogram (an O(distinct) driver collect) must NOT run; the
    // approxQuantile threshold keeps ~fraction of rows instead. At 1e-4
    // relative error on 10k distinct values the boundary rank is near-exact.
    val w = spark.range(10000).select(col("id"), col("id").as("w_scaled"))
    val kept = TextAnalysis.dsirSelectTopFraction(w, 0.25, exactDistinctCap = 100)
      .select("id").as[Long].collect()
    assert(kept.length >= 2300 && kept.length <= 2700)
    // the kept set is the top of the weight order (threshold filter, no rank)
    assert(kept.min >= 7000L)
    // same inputs under the exact path agree on the boundary semantics
    val exact = TextAnalysis.dsirSelectTopFraction(w, 0.25)
      .select("id").as[Long].collect()
    assert(exact.length == 2500 && exact.min == 7500L)
  }
}
