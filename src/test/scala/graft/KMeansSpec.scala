package graft

import graft.table.Similarity
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over the quantized grid + trained-centroid IVF. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated 2-D clusters around (±10, ±10), deterministic LCG jitter
  private def lcgStream(seed: Long): Iterator[Double] = {
    var x = seed
    Iterator.continually {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5 // in [-0.5, 0.5)
    }
  }

  private lazy val clustered = {
    val jit = lcgStream(7).take(400).toArray
    val centers = Seq((10.0, 10.0), (10.0, -10.0), (-10.0, 10.0), (-10.0, -10.0))
    (0 until 200).map { i =>
      val (cx, cy) = centers(i % 4)
      (i.toLong, Seq((cx + jit(2 * i)).toFloat, (cy + jit(2 * i + 1)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("kmeansCentroids recovers well-separated clusters") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 4, iters = 5)
    assert(cents.size == 4)
    // every true center is hit by exactly one trained centroid (within jitter)
    val trueCenters = Seq((10.0, 10.0), (10.0, -10.0), (-10.0, 10.0), (-10.0, -10.0))
    val matched = trueCenters.map { case (cx, cy) =>
      cents.count(c => math.abs(c.head - cx) < 1.0 && math.abs(c(1) - cy) < 1.0)
    }
    assert(matched == Seq(1, 1, 1, 1), s"centroids $cents")
  }

  test("kmeansCentroids is deterministic across runs and repartitioning") {
    val a = Similarity.kmeansCentroids(clustered, "vec_id", "embedding", k = 4, iters = 3)
    val b = Similarity.kmeansCentroids(clustered.repartition(7), "vec_id", "embedding",
      k = 4, iters = 3)
    assert(a == b)
  }

  test("kmeansRefineStep matches a driver-side replay of one Lloyd step") {
    val init = Similarity.kmeansInit(clustered, "vec_id", "embedding", k = 4)
    val step = Similarity.kmeansRefineStep(clustered, "vec_id", "embedding", init)
      .collect().map(r => ((r.getInt(0), r.getInt(2)), (r.getLong(1), r.getDouble(3))))
      .toMap

    // driver replay in plain Scala over the same quantized grid
    val rows = clustered.collect().map(r => r.getSeq[Float](1).map(x =>
      math.floor(x.toDouble * 1000 + 0.5)))
    def dist(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byCell = rows.groupBy(qv => init.indices.minBy(ci => (dist(qv, init(ci).toSeq), ci)))
    byCell.foreach { case (cell, members) =>
      val n = members.length.toLong
      (0 until 2).foreach { d =>
        val cval = BigDecimal(members.map(_(d)).sum / (n * 1000.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gotN, gotV) = step((cell, d + 1))
        assert(gotN == n && math.abs(gotV - cval) < 1e-12,
          s"cell $cell dim $d: got ($gotN, $gotV), want ($n, $cval)")
      }
    }
    assert(step.size == byCell.size * 2)
  }

  test("trained centroids give IVF exact recall on clustered data at nprobe=1") {
    val cents = Similarity.kmeansCentroids(clustered, "vec_id", "embedding",
      k = 4, iters = 5)
    val queries = clustered.filter(col("vec_id") < 8)
      .withColumnRenamed("vec_id", "query_id")
    val exact = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding",
      "query_id", k = 5).select("query_id", "item_id")
      .as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(clustered, queries, "vec_id", "embedding",
      "query_id", k = 5, nprobe = 1, centroids = Some(cents))
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    // clusters are tight and separated: every true neighbor shares the query's
    // cell, so one trained probe already reproduces the exact result
    assert(ivf == exact)
  }

  test("empty cells keep their previous centroid") {
    // k larger than the number of distinct points: some cells go empty
    val tiny = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(-1.0f, -1.0f))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, "vec_id", "embedding", k = 3, iters = 2)
    assert(cents.size == 3)
    assert(cents.forall(_.forall(v => !v.isNaN)))
  }
}
