package graft

import graft.table.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 1000L).map(i => (i, s"lang${i % 4}"))
    .toDF("id", "lang")

  test("deterministic sample: stable under repartitioning and re-runs") {
    val a = Sampling.deterministicSample(docs, "id", 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // md5-uniformity: within a loose band of the target fraction
    assert(a.size > 230 && a.size < 370, s"got ${a.size}")
  }

  test("stratified sample applies per-stratum fractions") {
    val kept = Sampling.stratifiedSample(docs, "lang", "id",
      Map("lang0" -> 0.1, "lang1" -> 0.9), default = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("lang0") < kept.getOrElse("lang2", 0L))
    assert(kept.getOrElse("lang2", 0L) < kept("lang1"))
    // fraction 0.0 default drops a stratum entirely
    val none = Sampling.stratifiedSample(docs, "lang", "id", Map("lang3" -> 1.0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(none.keySet == Set("lang3") && none("lang3") == 250L)
  }

  test("assignSplits: shares respected, deterministic, exhaustive partition") {
    val sp = Sampling.assignSplits(docs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = sp.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000)
    assert(counts("train") > 700 && counts("train") < 900)
    val again = Sampling.assignSplits(docs.repartition(5), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = sp.select("id", "split").as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("assignSplitsByCluster: a cluster never straddles splits") {
    // clusters of 10 consecutive ids via edges (i, i-1) within each decade
    val edges = (0 until 1000).filter(i => i % 10 != 0)
      .map(i => (i.toLong, (i - 1).toLong)).toDF("a", "b")
    val cc = graft.table.Components.connectedComponents(edges, "a", "b")
    val sp = Sampling.assignSplitsByCluster(docs, "id", cc,
      Seq("train" -> 0.5, "val" -> 0.5))
    val leaky = sp.withColumn("cluster", col("id") - col("id") % 10)
      .groupBy("cluster").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(leaky == 0)
    // both splits are populated (100 clusters hashed half-and-half-ish)
    val counts = sp.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.size == 2 && counts.values.forall(_ > 100))
  }

  test("exactKPerStratum yields exactly k rows per stratum, deterministically") {
    val s1 = Sampling.exactKPerStratum(docs, "lang", "id", 7)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.exactKPerStratum(docs.repartition(13), "lang", "id", 7)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 28)
    // stratum smaller than k: all rows kept
    val tiny = Sampling.exactKPerStratum(docs.filter(col("id") < 3), "lang", "id", 7)
    assert(tiny.count() == 3)
  }

  test("dupBigramFraction matches a scalar reference") {
    def ref(ts: Seq[Int]): Double = {
      val grams = ts.sliding(2).filter(_.size == 2)
        .map(p => p.head.toLong * 4096L + p(1)).toSeq
      if (grams.isEmpty) 0.0 else 1.0 - grams.distinct.size.toDouble / grams.size
    }
    val cases = Seq(Seq(1, 2, 3, 1, 2), Seq(5, 5, 5, 5), Seq(9), Seq.empty[Int],
      Seq(1, 2, 1, 2, 1, 2))
    val got = cases.zipWithIndex.map(_.swap).toDF("i", "tokens")
      .select($"i", TextAnalysis.dupBigramFraction($"tokens").as("f"))
      .as[(Int, Double)].collect().toMap
    cases.zipWithIndex.foreach { case (ts, i) =>
      assert(math.abs(got(i) - ref(ts)) < 1e-12, s"case $i")
    }
  }

  test("mixToTarget realizes target weight shares, scarcest stratum kept whole") {
    // weights: s0 has 4x the tokens of s1; target 50/50 → s1 is scarcest
    val rows = (0L until 2000L).map { i =>
      if (i % 5 == 4) (i, "s1", 100) else (i, "s0", 100)
    }
    val df = rows.toDF("id", "src", "n_tok")
    val out = Sampling.mixToTarget(df, "src", "id", "n_tok",
      Map("s0" -> 0.5, "s1" -> 0.5))
    val w = out.groupBy("src").agg(sum($"n_tok").as("w"))
      .as[(String, Long)].collect().toMap
    // scarcest stratum keeps ~everything; the other downsamples to match
    assert(w("s1") == 400L * 100L)
    val share0 = w("s0").toDouble / (w("s0") + w("s1"))
    assert(share0 > 0.42 && share0 < 0.58, s"share0=$share0")
    // strata not in the target are dropped entirely
    val out2 = Sampling.mixToTarget(df, "src", "id", "n_tok", Map("s1" -> 1.0))
    assert(out2.select("src").distinct().as[String].collect().toSeq == Seq("s1"))
    // deterministic: repartitioning does not change the kept set
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.mixToTarget(df.repartition(7), "src", "id", "n_tok",
      Map("s0" -> 0.5, "s1" -> 0.5)).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("normalize: NFC composition, lowercase, whitespace collapse") {
    val df = Seq(
      "  Hello   World  ",
      "Café du   Monde",        // decomposed é → composed
      "ALL\tCAPS\n\nTEXT").toDF("text")
    val got = df.select(TextAnalysis.normalize($"text")).as[String].collect()
    assert(got(0) == "hello world")
    assert(got(1) == "café du monde" && got(1).length == 13)
    assert(got(2) == "all caps text")
  }
}
