package graft

import graft.run.{PipelineConfig, ValidationPipeline}
import graft.tokens.TokenSeqs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, plus the full constraint-validation pipeline at two
  * parallelism levels — local[8] (N) and local[32] (4N) — on the identical
  * synthesized input, reporting validated-sequences/sec at both and the
  * scaling efficiency (BASELINE.md protocol; north rule requires ≥ 0.8).
  * Prints ONE JSON line.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Full pipeline (row constraints + stats + uniqueness + RI + drift) over a
    * freshly synthesized table; returns validated sequences/sec. */
  private def pipelineThroughput(spark: SparkSession, rows: Long, parts: Int): Double = {
    def gen(seed: Long, rate: Double): DataFrame =
      TokenSeqs.synthesize(spark, rows, seed, rate, numPartitions = parts)
        .withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(parts)))
    val dim = spark.createDataFrame(Seq(("web", ""), ("books", ""), ("code", ""), ("wiki", "")))
      .toDF("source", "description")
    val cfg = PipelineConfig(TokenSeqs.canonicalSchemaJson())
    val t0 = System.nanoTime()
    val r = ValidationPipeline.run(spark, gen(42L, 0.01), Some(dim),
      Some(gen(43L, 0.0)), cfg, "bench")
    // force full evaluation of both outputs
    r.violations.count()
    r.manifest.agg(sum("row_count")).collect()
    rows / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong

    // ---- phase 1: oracle-checked queries at full parallelism ----
    var spark = session(cpus)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- phase 2: scaling measurement N=8 vs 4N=32 (north rule) ----
    // warmup at the current level, then time; repeat at the other level in a
    // fresh session so shuffle.partitions matches the core count.
    def atLevel(level: Int): Double = {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      spark = session(level)
      pipelineThroughput(spark, benchRows / 10, level) // warmup (JIT + codegen)
      pipelineThroughput(spark, benchRows, level)
    }
    val tputN = atLevel(8)
    val tput4N = atLevel(32)
    val efficiency = (tput4N / tputN) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","scaling":{"rows":$benchRows,"seq_per_sec_n8":$tputN,""" +
      s""""seq_per_sec_n32":$tput4N,"efficiency_n_to_4n":$efficiency}}""")
    spark.stop()
  }
}
