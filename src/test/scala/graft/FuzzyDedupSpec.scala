package graft

import graft.table.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end fuzzy dedup (pairs → clusters → keepers), overlap-coefficient
  * containment pairs, and corpus-level hot-shingle coverage. */
class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Seq[Int])*) =
    rows.toDF("doc_id", "tokens")

  test("fuzzyDedupClusters: identical docs cluster to min id, singletons label themselves") {
    // 1≡2 and 3≡4 (identical token arrays always share every LSH band);
    // 5 and 6 are unrelated singletons
    val df = docs(
      1L -> (100 to 130), 2L -> (100 to 130),
      3L -> (500 to 540), 4L -> (500 to 540),
      5L -> (900 to 905), 6L -> Seq(1, 2, 3, 4, 5, 6, 7))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = Dedup.fuzzyDedupClusters(df, "doc_id", "tokens", minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 6L))
  }

  test("fuzzyDedupClusters labels transitive chains through pair edges") {
    // identical trio 10≡11≡12: pairwise pairs (10,11),(10,12),(11,12) must
    // collapse to ONE component labeled 10
    val df = docs(10L -> (0 to 25), 11L -> (0 to 25), 12L -> (0 to 25))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = Dedup.fuzzyDedupClusters(df, "doc_id", "tokens", minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("dropFuzzyDuplicates keeps the min-id representative plus singletons") {
    val df = docs(
      1L -> (100 to 130), 2L -> (100 to 130),
      3L -> (500 to 540), 4L -> (500 to 540),
      5L -> (900 to 905))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val kept = Dedup.dropFuzzyDuplicates(df, "doc_id", "tokens", minJaccard = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L, 5L))
  }

  test("incrementalLshPairs ≡ full-corpus pairs restricted to fresh-involving") {
    // prior: 1≡2 (a prior×prior pair — must NOT re-emerge); fresh: 11≡2
    // (fresh×prior) and 12≡13 (fresh×fresh); 20 unrelated
    val prior = docs(1L -> (100 to 130), 2L -> (100 to 130), 3L -> (500 to 540))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val fresh = docs(11L -> (100 to 130), 12L -> (700 to 740),
      13L -> (700 to 740), 20L -> (900 to 906))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val inc = Dedup.incrementalLshPairs(prior, fresh, "doc_id", "tokens",
      minJaccard = 0.5,
      priorSigs = Some(Dedup.minhashSignatures(prior, "doc_id", "tokens")))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashLshPairs(prior.unionByName(fresh), "doc_id", "tokens",
      minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter((p: (Long, Long)) => p._1 >= 11L || p._2 >= 11L)
    assert(inc == full)
    assert(inc.contains((2L, 11L)) && inc.contains((12L, 13L)))
    assert(!inc.contains((1L, 2L)), "prior×prior pair must not re-emerge")
  }

  test("containmentPairs scores sub-document duplication that Jaccard under-scores") {
    // B = first 12 tokens of A: B's 10 shingles all appear in A's 28 →
    // overlap = 10/min(28,10) = 1.0 while jaccard = 10/28 ≈ 0.36
    val df = docs(1L -> (0 to 29), 2L -> (0 to 11), 3L -> (800 to 820))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val rows = Dedup.containmentPairs(df, "doc_id", "tokens", minOverlap = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 2L, 1.0)))
    val jac = Dedup.jaccardPairs(df, "doc_id", "tokens", minJaccard = 0.5).count()
    assert(jac === 0L) // the same pair is invisible to the Jaccard operator
  }

  test("hotShingleCoverage: corpus-global top-K membership fraction per doc") {
    // shingle (1,2,3) occurs in all three docs → the unique top-1 shingle
    val df = docs(
      1L -> Seq(1, 2, 3, 4), // shingles (1,2,3), (2,3,4)
      2L -> Seq(1, 2, 3), // shingle  (1,2,3)
      3L -> Seq(1, 2, 3, 9)) // shingles (1,2,3), (2,3,9)
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = TextAnalysis.hotShingleCoverage(df, "doc_id", "tokens", topK = 1)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      1L -> ((2, 1L, 0.5)),
      2L -> ((1, 1L, 1.0)),
      3L -> ((2, 1L, 0.5))))
  }

  test("hotShingleCoverage top-K ties break deterministically (count desc, shingle asc)") {
    // two shingles each with count 1: top-1 must be the numerically smaller
    val df = docs(1L -> Seq(1, 2, 3), 2L -> Seq(4, 5, 6))
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = TextAnalysis.hotShingleCoverage(df, "doc_id", "tokens", topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // shingle(1,2,3) = 1·2^24 + 2·2^12 + 3 < shingle(4,5,6)
    assert(out === Map(1L -> 1L, 2L -> 0L))
  }
}
