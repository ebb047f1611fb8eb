package graft

import graft.model.SchemaParser
import graft.tokens.TokenSeqs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures steady-state constraint-eval throughput at one parallelism level
  * (SPARK_GRAFT_CPUS) over a shared materialized input — used to choose the
  * N / 4N pairing the sandbox host can actually supply compute for. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "10000000").toLong
    val dir = "/tmp/graft-scaling"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val logicalParts = 64
    val factsPath = s"$dir/facts_$rows"
    if (!new java.io.File(factsPath).exists()) {
      TokenSeqs.synthesize(spark, rows, 42L, 0.01, numPartitions = logicalParts)
        .withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(logicalParts)))
        .write.parquet(factsPath)
    }
    val facts = spark.read.parquet(factsPath)
    val doc = SchemaParser.parse(TokenSeqs.canonicalSchemaJson())
    val violRdd = graft.row.RowValidator
      .violations(facts, doc, "doc_id", extraCols = Seq("part"))
      .queryExecution.toRdd
    violRdd.count() // warm
    val times = (1 to 5).map { _ =>
      val t = System.nanoTime()
      violRdd.count()
      (System.nanoTime() - t) / 1e9
    }
    println(f"PROBE cpus=$cpus best=${times.min}%6.2f s tput=${rows / times.min}%.0f seq/s all=${times.map(t => f"$t%5.2f").mkString(",")}")
    spark.stop()
  }
}
