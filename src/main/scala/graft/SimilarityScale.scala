package graft

import graft.table.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the similarity family: synthesize N deterministic
  * 64-dim embeddings (+ ~0.1% exact duplicates), run sign-LSH near-dup
  * detection and LSH top-k ANN for a query set. Prints ONE JSON line.
  * Evidence that candidate generation stays bucket-bounded where the n²
  * cross product would be 10^12 pairs.
  *
  * env: SPARK_GRAFT_SCALE_ROWS (default 1000000), SPARK_GRAFT_CPUS (16).
  */
object SimilarityScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic 64-dim embeddings in [-1, 1]: 64 codegen'd xxhash64
    // columns per row — no interpreted HOFs in generation either
    val dim = 64
    val vecCols = (0 until dim).map { d =>
      (pmod(xxhash64(col("id"), lit(d), lit(9L)), lit(2000001L)) - 1000000L)
        .cast("double") / 1e6
    }
    val vec = array(vecCols: _*)
    val base = spark.range(0, rows, 1, cpus * 4)
      .select(col("id").as("vec_id"), vec.as("embedding"))
    val dups = base.filter(pmod(col("vec_id"), lit(1000)) === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dups)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = corpus.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
    }
    // near-dups at cosine ≥ 0.95: only the injected exact duplicates qualify
    val (tNd, nNd) = timed(Dedup.lshNearDups(corpus, "vec_id", "embedding",
      minCosine = 0.95, numPlanes = 16, numTables = 4).count())
    val queries = corpus.filter(col("vec_id").between(0, 99))
      .withColumnRenamed("vec_id", "query_id")
    val (tTk, nTk) = timed(Similarity.lshTopK(corpus, queries,
      "vec_id", "embedding", "query_id", k = 5, numPlanes = 12, numTables = 4).count())
    // end-to-end semantic dedup: pairs → connected components → labels;
    // every injected duplicate pair must collapse (non-representative rows =
    // rows whose component differs from their own id)
    val (tSd, nSd) = timed(Dedup.semanticDedupClusters(corpus, "vec_id",
      "embedding", minCosine = 0.95, bruteForceMax = 10000L)
      .filter(col("component") =!= col("id")).count())

    println(s"""{"rows":$n,"cpus":$cpus,"dim":$dim,""" +
      s""""lsh_near_dup_sec":$tNd,"near_dup_pairs":$nNd,""" +
      s""""lsh_topk_sec":$tTk,"topk_rows":$nTk,""" +
      s""""semantic_dedup_sec":$tSd,"semantic_collapsed":$nSd}""")
    corpus.unpersist()
    spark.stop()
  }
}
