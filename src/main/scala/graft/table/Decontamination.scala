package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
