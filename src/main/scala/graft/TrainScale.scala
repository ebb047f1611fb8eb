package graft

import graft.table.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-3 training-pipeline additions: distributed
  * k-means (Lloyd) centroid training + trained-IVF assignment, DSIR
  * importance weighting, mean-pooling, temperature mixing, and within-doc
  * line dedup — at 10^6-row scale with deterministic synthetic inputs.
  * Prints ONE JSON line of wall times + invariant counts: evidence the
  * designs hold past broadcast scale and that determinism survives
  * parallelism (the kmeans centroid set is compared across two runs).
  *
  * env: SPARK_GRAFT_SCALE_ROWS (default 1000000), SPARK_GRAFT_CPUS (16).
  */
object TrainScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16 well-separated centers in 32-d; deterministic per-row jitter
    val dim = 32
    val k = 16
    val vecs = spark.range(rows).repartition(cpus * 4).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val center = pmod(col("id"), lit(k)) // cluster index
        val base = when(pmod(center + d, lit(4)) === 0, 10.0)
          .when(pmod(center + d, lit(4)) === 1, -10.0)
          .when(pmod(center + d, lit(4)) === 2, 5.0).otherwise(-5.0)
        base + (pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 1000.0 - 0.5)
      }).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = vecs.count()

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }

    val (tKm, cents) = timed(Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      k = k, iters = 3))
    val (tKm2, cents2) = timed(Similarity.kmeansCentroids(
      vecs.repartition(cpus * 2), "vec_id", "embedding", k = k, iters = 3))
    val deterministic = cents == cents2
    // one full-corpus assignment with the trained centroids (the IVF build)
    val quant = cents.map(_.map(x => Math.floor(x * 1000 + 0.5)).toArray)
    val (tAsg, nCells) = timed(vecs.select(
      graft.expr.VectorExprs.nearestCell(
        graft.expr.VectorExprs.quantize(col("embedding"), 1000.0),
        quant.toArray).as("cell"))
      .groupBy("cell").count().count())

    // DSIR at 10^6 docs: synthetic text via fingerprint-derived words
    val docs = spark.range(rows).repartition(cpus * 4).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("w"), pmod(xxhash64(col("id"), lit(1)), lit(50))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(2)), lit(50))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(3)), lit(50))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(4)), lit(50))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(5)), lit(50))))
        .as("text"),
      pmod(col("id"), lit(20)).cast("string").as("source"),
      (pmod(xxhash64(col("id")), lit(100)) < 30).as("is_target"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()
    val toks = graft.expr.TextExprs.asciiTokens(col("text"))
    val (tDsir, nScored) = timed(TextAnalysis.dsirLogWeights(
      docs, docs.filter(col("is_target")), "doc_id", toks).count())

    // temperature mixing over 20 strata (weights = scored rows per stratum)
    val weighted = docs.withColumn("w", lit(1L))
    val (tMix, nMix) = timed(Sampling.mixWithTemperature(
      weighted, "source", "doc_id", "w", tau = 3.0).count())

    // line dedup: every doc gets a shared boilerplate line + its own lines
    val paras = array(col("text"), lit("shared boilerplate line"),
      col("text"), lit("shared boilerplate line"))
    val (tLine, nLineKept) = timed(docs.select(
      explode(TextAnalysis.dedupDocLines(paras, minLen = 10)).as("p")).count())

    val (tPool, nPool) = timed(Similarity.meanPoolQuantized(
      vecs.withColumn("label", pmod(col("vec_id"), lit(k)).cast("int")),
      "label", "embedding").count())

    // deterministic split assignment over 10^6 docs (zero-shuffle projection)
    val (tSplit, splitCounts) = timed(Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count().count())

    // schema-driven repair of 10^6 rows incl. the one-pass audit report
    val repairSchema = graft.model.SchemaParser.parse(
      """{"type":"object","properties":{
           "doc_id":{"type":"integer"},
           "text":{"type":"string","maxLength":20},
           "source":{"enum":["0","1","2","3","4","5","6","7","8","9"]}}}""")
    val (tRepair, nRepairCols) = timed {
      val (rep, report) = graft.row.Repair.repair(docs, repairSchema)
      rep.count()
      report.count()
    }

    println(s"""{"probe":"train_scale","rows":$n,"cpus":$cpus,""" +
      s""""kmeans_sec":$tKm,"kmeans_rerun_sec":$tKm2,"kmeans_deterministic":$deterministic,""" +
      s""""ivf_assign_sec":$tAsg,"ivf_cells":$nCells,""" +
      s""""dsir_sec":$tDsir,"dsir_scored":$nScored,""" +
      s""""mix_sec":$tMix,"mix_kept":$nMix,""" +
      s""""line_dedup_sec":$tLine,"line_kept":$nLineKept,""" +
      s""""mean_pool_sec":$tPool,"pool_rows":$nPool,""" +
      s""""split_sec":$tSplit,"split_groups":$splitCounts,""" +
      s""""repair_sec":$tRepair,"repair_cols":$nRepairCols}""")
    spark.stop()
  }
}
