package graft

import graft.table.Dedup
import graft.tokens.TokenSeqs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the dedup family: synthesize N docs (1..512 tokens each),
  * inject ~1% exact duplicates, and run MinHash-LSH / SimHash-banded / exact
  * dedup end-to-end at local parallelism. Prints ONE JSON line with wall
  * times and found-pair counts — evidence that the banded designs hold when
  * the corpus no longer fits in a broadcast.
  *
  * env: SPARK_GRAFT_SCALE_ROWS (default 200000), SPARK_GRAFT_CPUS (16).
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = TokenSeqs.synthesize(spark, rows, seed = 5L, violationRate = 0.0,
      numPartitions = cpus * 4)
      .select(xxhash64(col("doc_id")).as("doc_id"), col("tokens"))
    // ~1% exact duplicates under fresh ids (negated hash keeps them distinct)
    val dups = base.filter(pmod(xxhash64(col("doc_id")), lit(100)) === 0)
      .select((-col("doc_id")).as("doc_id"), col("tokens"))
    val corpus = base.unionByName(dups)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = corpus.count() // materialize OUTSIDE the timings

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
    }
    val (tMh, nMh) = timed(Dedup.minhashLshPairs(corpus, "doc_id", "tokens",
      minJaccard = 0.9).count())
    val (tSh, nSh) = timed(Dedup.simhashNearDups(corpus, "doc_id", "tokens",
      maxHamming = 0).count())
    val (tEx, nEx) = timed(Dedup.exactDuplicates(corpus, "doc_id", "tokens").count())
    // end-to-end fuzzy dedup: LSH pairs + connected components + labeling;
    // count = rows collapsed into another row's cluster
    val (tFz, nFz) = timed(Dedup.fuzzyDedupClusters(corpus, "doc_id", "tokens",
      minJaccard = 0.9).filter(col("component") =!= col("id")).count())
    // corpus-global hot-shingle coverage (two shingle scans + broadcast probe)
    val (tHot, nHot) = timed(graft.table.TextAnalysis.hotShingleCoverage(
      corpus, "doc_id", "tokens", topK = 100)
      .filter(col("hot_coverage") > 0.0).count())
    // paragraph-level dedup: 4 unique paragraphs per doc + a shared
    // boilerplate footer on every 3rd doc — the removal set is ~n/3
    // (id, pos) pairs, exercising the broadcast-back path at scale
    val paraDocs = spark.range(rows).select(col("id").as("doc_id"),
      concat(
        transform(sequence(lit(0), lit(3)),
          i => concat_ws(" ", lit("para"), col("id"), i)),
        when(col("id") % 3 === 0,
          array(lit("shared boilerplate footer text")))
          .otherwise(array().cast("array<string>"))).as("paras"))
    val (tPd, nPd) = timed(Dedup.dropRepeatedParagraphs(
      paraDocs, "doc_id", "paras", minChars = 5)
      .agg(sum("n_removed")).collect()(0).getLong(0))

    // exact-substring (repeated-span) dedup: 30 globally-unique tokens per
    // doc + a shared 20-token boilerplate span on every 3rd doc; with
    // winLen=8 every later boilerplate occurrence is fully covered, so the
    // exact expectation is 20 removed tokens per boilerplate doc except the
    // corpus-first — pins both wall time and removal-count exactness
    val spanDocs = spark.range(rows).select(col("id").as("doc_id"),
      concat(
        transform(sequence(lit(0), lit(29)),
          i => (col("id") * 30 + i + 1000000).cast("int")),
        when(col("id") % 3 === 0,
          transform(sequence(lit(0), lit(19)), i => i + 7))
          .otherwise(array().cast("array<int>"))).as("tokens"))
    val nBoil = (rows + 2) / 3
    val (tSp, nSp) = timed(Dedup.dropRepeatedSpans(
      spanDocs, "doc_id", "tokens", winLen = 8)
      .agg(sum("n_removed")).collect()(0).getLong(0))
    require(nSp == 20L * (nBoil - 1),
      s"span dedup removed $nSp tokens, expected ${20L * (nBoil - 1)}")

    // connected components on a chain-heavy 2-rows-per-node graph (the
    // iterative worst case): distributed star rounds vs driver union-find
    val chain = spark.range(rows).toDF("i")
      .filter(col("i") % 5 =!= 0 && col("i") > 0)
      .select(col("i").as("a"), (col("i") - 1).as("b"))
    val (tCcD, nCcD) = timed(graft.table.Components
      .connectedComponents(chain, "a", "b", driverEdgeMax = 0).count())
    val (tCcU, nCcU) = timed(graft.table.Components
      .connectedComponents(chain, "a", "b").count())
    require(nCcD == nCcU, s"CC path disagreement: $nCcD vs $nCcU")

    println(s"""{"rows":$n,"cpus":$cpus,""" +
      s""""minhash_lsh_sec":$tMh,"minhash_pairs":$nMh,""" +
      s""""simhash_band_sec":$tSh,"simhash_pairs":$nSh,""" +
      s""""exact_dedup_sec":$tEx,"exact_groups":$nEx,""" +
      s""""fuzzy_dedup_sec":$tFz,"fuzzy_collapsed":$nFz,""" +
      s""""hot_shingle_sec":$tHot,"hot_docs":$nHot,""" +
      s""""para_dedup_sec":$tPd,"para_removed":$nPd,""" +
      s""""span_dedup_sec":$tSp,"span_removed":$nSp,""" +
      s""""cc_chain_nodes":$nCcD,"cc_distributed_sec":$tCcD,"cc_driver_sec":$tCcU}""")
    corpus.unpersist()
    spark.stop()
  }
}
