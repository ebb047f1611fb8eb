package graft

import graft.table.{Decontamination, TableChecks}
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  // token arrays with known 3-gram overlap structure (vocab < 4096)
  private lazy val corpus = Seq(
    (1L, Seq(1, 2, 3, 4, 5)),       // shares (1,2,3),(2,3,4),(3,4,5) with bench
    (2L, Seq(1, 2, 3, 9, 9)),       // shares only (1,2,3)
    (3L, Seq(7, 8, 9, 10)),         // shares nothing
    (4L, Seq(5, 4, 3, 2, 1)),       // reversed: shares nothing (order matters)
    (5L, Seq(1, 2))                 // too short for any shingle
  ).toDF("doc_id", "tokens")
  private lazy val bench = Seq(
    (100L, Seq(1, 2, 3, 4, 5, 6))
  ).toDF("doc_id", "tokens")

  test("contaminated counts distinct shared shingles per doc") {
    val hits = Decontamination.contaminated(corpus, bench, "doc_id", "tokens")
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 3L, 2L -> 1L))
    // minHits threshold filters the weak overlap
    val strict = Decontamination.contaminated(corpus, bench, "doc_id", "tokens",
      minHits = 2).as[(Long, Long)].collect().toMap
    assert(strict == Map(1L -> 3L))
  }

  test("repeated shingles in either side count once") {
    val rep = Seq((10L, Seq(1, 2, 3, 1, 2, 3, 1, 2, 3))).toDF("doc_id", "tokens")
    val hits = Decontamination.contaminated(rep, bench, "doc_id", "tokens")
      .as[(Long, Long)].collect().toMap
    // doc 10's distinct shingles: (1,2,3),(2,3,1),(3,1,2) — only (1,2,3) in bench
    assert(hits == Map(10L -> 1L))
  }

  test("decontaminate drops exactly the flagged docs") {
    val kept = Decontamination.decontaminate(corpus, bench, "doc_id", "tokens")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("benchmark side is broadcast (corpus never shuffles for the probe)") {
    val plan = Decontamination.contaminated(corpus, bench, "doc_id", "tokens")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast probe join, got:\n$plan")
  }

  test("bloomContaminated is result-identical to the exact path") {
    val exact = Decontamination.contaminated(corpus, bench, "doc_id", "tokens")
      .as[(Long, Long)].collect().toMap
    val bloom = Decontamination.bloomContaminated(corpus, bench, "doc_id", "tokens")
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact)
    // a deliberately undersized sketch (high fpp) only costs verify work —
    // the exact semi-join still removes every false positive
    val tiny = Decontamination.bloomContaminated(corpus, bench, "doc_id", "tokens",
      expectedItems = 2L, fpp = 0.5).as[(Long, Long)].collect().toMap
    assert(tiny == exact)
  }

  test("bloomContaminated on an empty benchmark returns no rows") {
    val empty = bench.filter(lit(false))
    assert(Decontamination.bloomContaminated(corpus, empty, "doc_id", "tokens").count() === 0L)
  }

  test("bloom probe is a zero-join filter stage (no broadcast of the shingle set)") {
    // the pre-probe must appear as bloom_filter_might_contain in the plan,
    // BEFORE any join: the 100 TB side's scan stage carries only the sketch
    val plan = Decontamination.bloomContaminated(corpus, bench, "doc_id", "tokens")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in plan:\n$plan")
  }

  test("psiDrift matches a scalar reference and is zero on identical sides") {
    val cur = Seq.fill(60)("a").map(Tuple1(_)).toDF("c")
      .union(Seq.fill(40)("b").map(Tuple1(_)).toDF("c"))
    val base = Seq.fill(40)("a").map(Tuple1(_)).toDF("c")
      .union(Seq.fill(50)("b").map(Tuple1(_)).toDF("c"))
      .union(Seq.fill(10)("z").map(Tuple1(_)).toDF("c"))
    val row = TableChecks.psiDrift(cur, base, "c").collect()(0)
    val (psi, jsd, k) = (row.getDouble(0), row.getDouble(1), row.getLong(2))

    def term(p: Double, q: Double) = (p - q) * math.log(p / q)
    val eps = 1e-6
    val expPsi = term(0.6, 0.4) + term(0.4, 0.5) + term(eps, 0.1)
    def jsdTerm(p: Double, q: Double) =
      0.5 * p * math.log(2 * p / (p + q)) + 0.5 * q * math.log(2 * q / (p + q))
    val expJsd = jsdTerm(0.6, 0.4) + jsdTerm(0.4, 0.5) + jsdTerm(eps, 0.1)
    assert(k == 3L)
    assert(math.abs(psi - expPsi) < 1e-9, s"psi $psi vs $expPsi")
    assert(math.abs(jsd - expJsd) < 1e-9, s"jsd $jsd vs $expJsd")
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12)

    val same = TableChecks.psiDrift(cur, cur, "c").collect()(0)
    assert(math.abs(same.getDouble(0)) < 1e-12 && math.abs(same.getDouble(1)) < 1e-12)
  }
}
