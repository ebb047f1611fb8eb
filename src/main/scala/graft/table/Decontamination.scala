package graft.table

import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination — flag training documents that share n-gram
  * shingles with an evaluation/benchmark set (the GPT-3 appendix-C /
  * PaLM-style overlap filter: a training doc containing a verbatim n-gram
  * from a test set leaks that benchmark). The reference validates documents
  * against schemas and has no corpus-overlap operator; this is part of the
  * training-data-pipeline surface alongside [[Dedup]].
  *
  * Scale design (100 TB corpus vs ~10⁶-example benchmark):
  *  - The benchmark shingle set is the SMALL side by construction (eval
  *    suites are orders of magnitude smaller than the corpus) — it is
  *    deduplicated first and explicitly `broadcast`, so the corpus side is
  *    one scan + explode + broadcast-hash semi-join: the 100 TB side never
  *    shuffles for candidate generation.
  *  - Per-doc hit counts aggregate on (doc_id) with map-side combine; only
  *    (doc_id, count) rows enter the one shuffle.
  *  - Shingles are [[Dedup.shingles3]] (native codegen'd, deterministic
  *    arithmetic) so the DuckDB oracle reproduces them bit-for-bit.
  */
object Decontamination {

  /** Corpus docs sharing ≥ `minHits` DISTINCT shingles with the benchmark.
    * Output: (id, n_hits) — `n_hits` = number of distinct contaminated
    * shingles in the doc. Callers anti-join this against the corpus to drop,
    * or inspect `n_hits` to grade severity. */
  def contaminated(corpus: DataFrame, bench: DataFrame,
                   idCol: String, tokensCol: String,
                   minHits: Int = 1): DataFrame = {
    val benchShingles = bench
      .select(explode(array_distinct(Dedup.shingles3(col(tokensCol)))).as("s"))
      .distinct()
    corpus
      .select(col(idCol).as("id"),
        explode(array_distinct(Dedup.shingles3(col(tokensCol)))).as("s"))
      .join(broadcast(benchShingles), Seq("s"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** [[contaminated]] with a Bloom-filter pre-probe — the shape for a
    * benchmark set too large to broadcast as a hash table. Output is
    * IDENTICAL to [[contaminated]] (a Bloom filter has no false negatives;
    * false positives are removed by the exact verify), so the same oracle
    * applies — only the plan changes:
    *
    *  1. The benchmark's distinct shingles fold into ONE Bloom sketch of
    *     `numBits` bits (Spark's `BloomFilterAggregate` over `xxhash64`,
    *     map-side combined; ~1.2 MB at 10⁶ shingles / 1% fpp vs ~100 MB for
    *     the equivalent broadcast set).
    *  2. The corpus scan probes the sketch with a codegen'd
    *     `BloomFilterMightContain` literal — a ZERO-shuffle, zero-join map
    *     stage over the 100 TB side; only the ~(rate + fpp) surviving
    *     (id, shingle) pairs leave the scan.
    *  3. Survivors verify exactly against the true shingle set (join
    *     strategy left to AQE — both sides are now small).
    *
    * `expectedItems` sizes the sketch; an undercount only raises the false
    * positive rate (more exact-verify work), never changes the result. */
  def bloomContaminated(corpus: DataFrame, bench: DataFrame,
                        idCol: String, tokensCol: String,
                        minHits: Int = 1,
                        expectedItems: Long = 4000000L,
                        fpp: Double = 0.01): DataFrame = {
    val benchShingles = bench
      .select(explode(array_distinct(Dedup.shingles3(col(tokensCol)))).as("s"))
      .distinct()
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloomAgg = GraftSql.toColumn(
      new BloomFilterAggregate(
        XxHash64(Seq(GraftSql.toExpression(col("s"))), 42L),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    // one row, `numBits/8` bytes — bounded by construction, independent of
    // both corpus and benchmark size past the cap
    val bloomBytes = benchShingles.select(bloomAgg.as("bf")).head.getAs[Array[Byte]](0)
    if (bloomBytes == null) {
      // empty benchmark: nothing can be contaminated (schema as the real path)
      return corpus.select(col(idCol).as("id"), lit(0L).as("n_hits")).limit(0)
    }
    val mightContain = GraftSql.toColumn(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      XxHash64(Seq(GraftSql.toExpression(col("s"))), 42L)))
    corpus
      .select(col(idCol).as("id"),
        explode(array_distinct(Dedup.shingles3(col(tokensCol)))).as("s"))
      .filter(mightContain)
      .join(benchShingles, Seq("s"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Drop contaminated docs: the corpus minus every row flagged by
    * [[contaminated]]. The flag set is O(contamination-rate · n) — join
    * strategy left to AQE (broadcast when small, shuffled anti otherwise). */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
                    idCol: String, tokensCol: String,
                    minHits: Int = 1): DataFrame = {
    val bad = contaminated(corpus, bench, idCol, tokensCol, minHits)
    corpus.join(bad, corpus(idCol) === bad("id"), "left_anti")
  }
}
