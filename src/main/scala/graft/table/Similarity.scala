package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exactness baseline; the
  * scale path is random-hyperplane LSH bucketing (signature join) followed by
  * exact re-ranking inside buckets — candidate generation never shuffles the
  * full cross product.
  */
object Similarity {

  /** Native codegen'd dot product (graft.expr.DotProduct) — the zip_with +
    * aggregate form is CodegenFallback and re-enters the interpreter per
    * element; identical numerics (sequential left-to-right accumulation). */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExprs.dot(a, b)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k neighbors for every query vector.
    * `queries` is expected small (broadcast side); the corpus streams through
    * a broadcast-nested-loop join — no corpus shuffle. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, queryIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: component h[j][d] ∈ {-1,+1}
    * from a seeded LCG — reproducible across engines and runs. */
  def hyperplaneSigns(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    Array.fill(numPlanes, dim)(if (next() > 0) 1.0 else -1.0)
  }

  /** Random-hyperplane LSH bucket id: numPlanes sign bits packed in a long.
    * Native codegen'd expression (graft.expr.SignLshBucket): one loop over
    * the vector per plane instead of numPlanes interpreted HOF folds. */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column =
    graft.expr.VectorExprs.lshBucket(vecCol, planes)

  /** Embedding dimensionality, read from one row (a limit-1 scan — note this
    * is an eager action at plan-construction time) — LSH planes need the
    * static dim before planning. Empty input → 1 (any plane set works: every
    * downstream result is empty anyway). */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)

  /** LSH-bucketed ANN: bucket corpus + queries with `numTables` independent
    * sign-LSH tables, join per (table, bucket), exact-cosine re-rank, top-k.
    * Recall/cost tradeoff via numPlanes (bucket granularity) and numTables. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              queryIdCol: String, k: Int, numPlanes: Int = 8, numTables: Int = 4,
              seed: Long = 42L): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    val tables = (0 until numTables).map { t =>
      val planes = hyperplaneSigns(numPlanes, dim, seed + 1000 * t)
      (t, planes)
    }
    // bucket rows and the candidate dedup carry ONLY (table, bucket, id) —
    // vectors join back once for the surviving candidate pairs.
    def bucketed(df: DataFrame, id: String, as: String): DataFrame =
      df.select(col(id).as(as),
          explode(array(tables.map { case (t, planes) =>
            struct(lit(t).as("t"), lshBucket(col(vecCol), planes).as("b")) }: _*)).as("tb"))
    val c = bucketed(corpus, idCol, "item_id")
    val q = bucketed(queries, queryIdCol, "query_id")
    val cand = c.join(q, Seq("tb")).filter(col("item_id") =!= col("query_id"))
      .select("query_id", "item_id").distinct()
    val withVecs = cand
      .join(corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec")), Seq("item_id"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("query_vec"))), Seq("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("item_id"))
    withVecs.withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** IVF-flat ANN (the inverted-file index of FAISS-style systems): partition
    * the corpus into `nlist` Voronoi cells around deterministic centroids,
    * then answer each query by probing only its `nprobe` nearest cells with
    * exact cosine re-ranking — recall/cost dialed by nlist × nprobe.
    *
    * Centroids are the md5-hash-ranked exact-`nlist` sample of the corpus —
    * IVF's standard random initialization, chosen over Lloyd iterations here
    * because it is deterministic and engine-portable (the DuckDB oracle
    * reproduces the exact same index); at production scale a KMeans
    * refinement can replace the sample without changing the query plan.
    * Cell assignment is argmax over the broadcast centroid set with the score
    * rounded to 9dp and ties to the smallest cell id, so the assignment is
    * bit-identical across engines.
    *
    * Scale shape: centroid selection is a TakeOrdered (per-partition top-k +
    * driver merge, no global sort); assignment is ONE projection over the
    * corpus against `nlist` in-expression centroid literals; the probe list
    * (queries × nprobe, tiny) and the query vectors are broadcast — the
    * corpus NEVER shuffles. At 10^12 rows you would persist the assignment
    * as a cell-bucketed table and reuse it across query batches; the
    * per-batch plan is identical. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              queryIdCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
              centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val effNlist = centroids.map(_.size).getOrElse(nlist)
    require(effNlist >= 1 && nprobe >= 1 && nprobe <= effNlist,
      s"need 1 <= nprobe <= nlist, got nlist=$effNlist nprobe=$nprobe")
    // deterministic centroids: smallest nlist by (md5-bucket, id) — a
    // TakeOrderedAndProject, never a global sort. `centroids` overrides with
    // a trained set (kmeansCentroids) without changing the query plan.
    val cents: Seq[(Int, Seq[Double])] = centroids
      .map(_.zipWithIndex.map { case (cv, i) => (i, cv) })
      .getOrElse(corpus
        .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
        .orderBy(Sampling.hashBucket(col("cid")), col("cid"))
        .limit(nlist).collect().toSeq
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) })

    // per-vector centroid scores as array<struct<s, nc>>: array_max picks
    // (max rounded score, then max nc = -ci → SMALLEST cell id on ties)
    def centScores(vec: Column): Column = array(cents.map { case (i, cv) =>
      struct(round(cosine(vec, typedLit(cv)), 9).as("s"), lit(-i).as("nc"))
    }: _*)
    def cellOf(vec: Column): Column = -array_max(centScores(vec)).getField("nc")

    val assigned = corpus.select(col(idCol).as("item_id"),
      col(vecCol).as("item_vec"), cellOf(col(vecCol)).as("cell"))
    // nprobe nearest cells per query: sort asc by (s, nc), reverse → desc by
    // score with smaller cell id first on ties, take the head slice
    val probes = queries.select(col(queryIdCol).as("query_id"),
        explode(transform(slice(reverse(array_sort(centScores(col(vecCol)))), 1, nprobe),
          x => -x.getField("nc"))).as("cell"))
    val qVecs = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("query_vec"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("item_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  // ---------------------------------------------------------------------
  // Distributed k-means (Lloyd) — trained centroids for the IVF index.
  //
  // All arithmetic runs in a quantized integer grid (QuantizeVec: component
  // → round(x·scale), an integer-valued double): distances and per-cell sums
  // are then EXACT, so assignments and centroid updates are deterministic
  // across partitioning, aggregation order, retries, and engines — the
  // DuckDB oracle replays one refinement step bit-for-bit (q_kmeans_refine).
  //
  // Scale shape per iteration: ONE codegen'd projection assigns the corpus
  // (NearestCell carries the k·dim centroid matrix as a reference object),
  // ONE map-side-combined aggregation reduces it to k partial-sum rows
  // (VectorSumAgg state = dim doubles/group), and the k×dim result collects
  // to the driver. The corpus never shuffles; per-iteration exchange traffic
  // is O(tasks · k · dim) doubles. At 10^12 rows you would train on a
  // deterministicSample and assign the full corpus once at the end — the
  // plan is identical.
  // ---------------------------------------------------------------------

  /** Deterministic initial centroids in the quantized grid: the md5-hash-
    * ranked exact-`k` corpus sample (same election as ivfTopK), quantized. */
  def kmeansInit(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 scale: Double = 1000.0): Seq[Array[Double]] =
    df.select(col(idCol).as("cid"),
        graft.expr.VectorExprs.quantize(col(vecCol), scale).as("qv"))
      .orderBy(Sampling.hashBucket(col("cid")), col("cid"))
      .limit(k).collect().toSeq.map(_.getSeq[Double](1).toArray)

  /** One Lloyd refinement step over quantized centroids, as a DataFrame of
    * `(cell, n_members, dim, c_val)` — dim is 1-based, c_val the DEQUANTIZED
    * new centroid component Σqv/(n·scale). Exact integer arithmetic end to
    * end (see object comment), so the output is engine-portable. Cells that
    * captured no members emit no rows. */
  def kmeansRefineStep(df: DataFrame, idCol: String, vecCol: String,
                       cents: Seq[Array[Double]],
                       scale: Double = 1000.0): DataFrame = {
    val qv = graft.expr.VectorExprs.quantize(col(vecCol), scale)
    val assigned = df
      .select(graft.expr.VectorExprs.nearestCell(qv, cents.toArray).as("cell"), qv.as("qv"))
      .filter(col("cell").isNotNull)
    assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VectorSum(col("qv")).as("sums"))
      .select(col("cell"), col("n_members"), posexplode(col("sums")).as(Seq("pos", "s")))
      .select(col("cell"), col("n_members"), (col("pos") + 1).as("dim"),
        round(col("s") / (col("n_members") * lit(scale)), 9).as("c_val"))
  }

  /** Mean-pooled embedding per group in the quantized grid — the
    * chunk-embeddings → document-embedding (or per-label centroid) pooling
    * step, as `(group, n_members, dim, c_val)` rows with `dim` 1-based and
    * `c_val = Σ round(x·scale) / (n·scale)`. Exact integer sums
    * (QuantizeVec + VectorSumAgg), so the pooled vectors are deterministic
    * across partitioning and engines. Same shape as [[kmeansRefineStep]]:
    * one codegen'd projection + one map-side-combined aggregation to
    * |groups| rows — the vectors never shuffle. */
  def meanPoolQuantized(df: DataFrame, groupCol: String, vecCol: String,
                        scale: Double = 1000.0): DataFrame = {
    val qv = graft.expr.VectorExprs.quantize(col(vecCol), scale)
    df.select(col(groupCol), qv.as("qv"))
      .filter(col("qv").isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VectorSum(col("qv")).as("sums"))
      .select(col(groupCol), col("n_members"), posexplode(col("sums")).as(Seq("pos", "s")))
      .select(col(groupCol), col("n_members"), (col("pos") + 1).as("dim"),
        round(col("s") / (col("n_members") * lit(scale)), 9).as("c_val"))
  }

  /** Full Lloyd training: `iters` refinement steps from the deterministic
    * hash-sample initialization. Returns DEQUANTIZED centroids (cell →
    * vector) ready for `ivfTopK(centroids = Some(...))`. New centroids are
    * re-quantized to the same grid each round (nearest integer), keeping
    * every iteration exact; a cell that loses all members keeps its previous
    * centroid (the standard empty-cluster fallback). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      iters: Int = 5, scale: Double = 1000.0): Seq[Seq[Double]] = {
    var cents = kmeansInit(df, idCol, vecCol, k, scale)
    require(cents.nonEmpty, "kmeansCentroids on an empty corpus")
    val qv = graft.expr.VectorExprs.quantize(col(vecCol), scale)
    var it = 0
    while (it < iters) {
      val sums = df
        .select(graft.expr.VectorExprs.nearestCell(qv, cents.toArray).as("cell"), qv.as("qv"))
        .filter(col("cell").isNotNull)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), graft.functions.VectorSum(col("qv")).as("sums"))
        .collect()
      val next = cents.toArray
      sums.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1).toDouble
        next(cell) = r.getSeq[Double](2).toArray.map { s =>
          val x = s / n
          if (x >= 0) Math.floor(x + 0.5) else Math.ceil(x - 0.5)
        }
      }
      cents = next.toSeq
      it += 1
    }
    cents.map(_.toSeq.map(_ / scale))
  }
}
