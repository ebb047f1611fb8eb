package graft

import graft.model.SchemaParser
import graft.row.RowValidator
import graft.run.{PipelineConfig, ValidationPipeline}
import graft.table.TableChecks
import graft.tokens.TokenSeqs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level profiling of the validation pipeline at one parallelism level:
  * where does the time go, and which phase stops scaling? */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIR", "/tmp/graft-profile")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val logicalParts = 64
    val factsPath = s"$dir/facts_$rows"
    val basePath = s"$dir/baseline_$rows"
    def gen(seed: Long, rate: Double): DataFrame =
      TokenSeqs.synthesize(spark, rows, seed, rate, numPartitions = logicalParts)
        .withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(logicalParts)))
    if (!new java.io.File(factsPath).exists()) {
      gen(42L, 0.01).write.parquet(factsPath)
      gen(43L, 0.0).write.parquet(basePath)
    }
    val facts = spark.read.parquet(factsPath)
    val baseline = spark.read.parquet(basePath)
    val dim = spark.createDataFrame(Seq(("web", ""), ("books", ""), ("code", ""), ("wiki", "")))
      .toDF("source", "description")
    val cfg = PipelineConfig(TokenSeqs.canonicalSchemaJson())
    val doc = SchemaParser.parse(cfg.schemaJson)

    def time(name: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-16s ${times.map(t => f"$t%7.2f").mkString(" ")} s")
    }

    // warmup JIT with a small slice
    RowValidator.withValidation(facts.limit(10000), doc).filter(!col("_valid")).count()

    time("scan_only") { facts.agg(count(lit(1))).collect() }
    time("scan_notokens") { facts.select("doc_id", "n_tok", "source", "part")
      .agg(max("n_tok")).collect() }
    time("row_valid_only") {
      RowValidator.withValidation(facts, doc).filter(!col("_valid"))
        .agg(count(lit(1))).collect()
    }
    time("row_validate") {
      RowValidator.withValidation(facts, doc).filter(size(col("_violations")) > 0)
        .agg(count(lit(1))).collect()
    }
    time("stats_agg") {
      facts.groupBy("part").agg(count(lit(1)).as("c"),
        avg(col("n_tok")), approx_count_distinct(col("doc_id"), 0.02),
        graft.functions.TDigestQuantiles(col("n_tok"), Seq(0.5, 0.95, 0.99)))
        .collect()
    }
    time("uniqueness") {
      TableChecks.duplicatesSalted(facts.filter(col("doc_id").isNotNull), "doc_id", 64)
        .agg(count(lit(1))).collect()
    }
    time("ri_antijoin") {
      TableChecks.referentialViolations(facts, dim, "source", "source")
        .agg(count(lit(1))).collect()
    }
    time("ks_drift") {
      val cur = facts.groupBy(col("part"), col("n_tok").cast("double").as("v"))
        .agg(count(lit(1)).as("ca"))
      cur.agg(count(lit(1))).collect()
    }
    time("full_pipeline") {
      val r = ValidationPipeline.run(spark, facts, Some(dim), Some(baseline), cfg, "prof")
      r.violations.count()
      r.manifest.agg(sum("row_count")).collect()
      r.violations.unpersist()
    }
    spark.stop()
  }
}
