package graft

import graft.functions.{TDigest, TDigestQuantiles}
import graft.table.TableChecks
import org.apache.spark.sql.functions._

/** Accuracy + merge-correctness of the t-digest TypedImperativeAggregate.
  * The reference has no quantile machinery (SURVEY §2.6), so the oracle is
  * exact quantiles over the same data, with t-digest-typical tolerances. */
class TDigestSpec extends SparkSpec {

  private def exactQuantile(sorted: Array[Double], p: Double): Double =
    sorted(math.min(sorted.length - 1, math.max(0, (p * sorted.length).toInt)))

  test("local digest tracks exact quantiles on skewed data") {
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(200000)(math.exp(rnd.nextGaussian() * 2.0)) // log-normal
    val d = new TDigest(100.0)
    xs.foreach(d.add)
    val sorted = xs.sorted
    for (p <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = d.quantile(p)
      val exact = exactQuantile(sorted, p)
      // rank error: find est's rank in the sorted data; must be within 1% of p
      val rank = sorted.count(_ <= est).toDouble / sorted.length
      assert(math.abs(rank - p) < 0.01, s"p=$p est=$est exact=$exact rank=$rank")
    }
  }

  test("merge of split digests equals single digest estimates") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(50000)(rnd.nextDouble() * 1000)
    val whole = new TDigest(100.0); xs.foreach(whole.add)
    val parts = xs.grouped(5000).map { chunk =>
      val d = new TDigest(100.0); chunk.foreach(d.add); d
    }.toSeq
    val merged = new TDigest(100.0)
    parts.foreach(merged.merge)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(merged.quantile(p) - whole.quantile(p)) < 20.0) // 2% of range
    }
    assert(math.abs(merged.totalWeight - xs.length) < 1e-6)
  }

  test("serialization round-trip preserves estimates") {
    val d = new TDigest(100.0)
    (1 to 10000).foreach(i => d.add(i.toDouble))
    val d2 = TDigest.deserialize(d.serialize())
    for (p <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(d.quantile(p) - d2.quantile(p)) < 1e-9)
  }

  test("distributed aggregate: partial digests merge across shuffle") {
    // 1..100000 uniformly across 32 partitions; p50 ≈ 50000
    val df = spark.range(1, 100001, 1, 32).toDF("v")
    val row = df.agg(TDigestQuantiles(col("v"), Seq(0.5, 0.95)).as("q"))
      .collect()(0).getSeq[Double](0)
    assert(math.abs(row(0) - 50000) < 1000, s"p50=${row(0)}")
    assert(math.abs(row(1) - 95000) < 1000, s"p95=${row(1)}")
  }

  test("grouped aggregate and TableChecks helper") {
    val df = spark.range(0, 20000, 1, 8)
      .selectExpr("id % 2 as g", "cast(id as double) as v")
    val rows = df.groupBy("g").agg(TDigestQuantiles(col("v"), Seq(0.5)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).head).toMap
    // group 0: evens 0..19998 median ≈ 10000; group 1: odds similar
    assert(math.abs(rows(0L) - 10000) < 600)
    assert(math.abs(rows(1L) - 10000) < 600)
    val q = TableChecks.tdigestQuantiles(df, "v", Seq(0.5)).collect()(0)
      .getSeq[Double](0).head
    assert(math.abs(q - 10000) < 600)
  }

  test("empty and null inputs") {
    val df = spark.range(0).selectExpr("cast(id as double) as v")
    val r = df.agg(TDigestQuantiles(col("v"), Seq(0.5)).as("q")).collect()(0)
    assert(r.isNullAt(0))
    val withNulls = spark.range(100).selectExpr(
      "case when id % 2 = 0 then cast(id as double) else null end as v")
    val q = withNulls.agg(TDigestQuantiles(col("v"), Seq(0.5)).as("q"))
      .collect()(0).getSeq[Double](0).head
    assert(q >= 0 && q <= 98)
  }
}
