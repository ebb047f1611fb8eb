package graft

import graft.run.{IncrementalValidation, PipelineConfig, ValidationPipeline}
import graft.snapshot.AppendSnapshotStore
import graft.tokens.TokenSeqs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for incremental snapshot revalidation: commit a large base
  * snapshot, validate it, then append a small delta (default 1%) and measure
  * the incremental run against a from-scratch full-table validation of the
  * same post-append table. Prints ONE JSON line.
  *
  * The claim under test (north rule: "resumes from Iceberg-snapshot
  * checkpoints with per-partition lineage + metrics"): the delta run's cost
  * is O(delta) + O(manifest merge), NOT O(table) — at 100 TB a 0.1% append
  * revalidates in ~0.1% of a full pass. The probe also audits the ONE prior
  * read the delta run performs (cross-snapshot uniqueness) and asserts it is
  * column-pruned to the key column — the payload (tokens) never re-reads.
  *
  * env: SPARK_GRAFT_SCALE_ROWS (default 5000000), SPARK_GRAFT_DELTA_PCT (1),
  *      SPARK_GRAFT_CPUS (16).
  */
object IncrementalScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "5000000").toLong
    val deltaPct = sys.env.getOrElse("SPARK_GRAFT_DELTA_PCT", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = 64
    def gen(n: Long, seed: Long): DataFrame =
      TokenSeqs.synthesize(spark, n, seed, violationRate = 0.01,
        numPartitions = cpus * 4)
        .withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(parts)))

    import spark.implicits._
    val dim = Seq("web", "books", "code", "wiki").toDF("source")
    val cfg = PipelineConfig(TokenSeqs.canonicalSchemaJson(),
      driftNumCol = None, driftCatCol = None)
    val root = java.nio.file.Files.createTempDirectory("graft-incr-scale").toString
    val store = new AppendSnapshotStore(spark, s"$root/table")
    val stateDir = s"$root/state"
    val deltaRows = rows * deltaPct / 100

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }

    store.commitAppend("seqs", gen(rows, 11L), "part")
    val (tBase, r1) = timed(IncrementalValidation.validateDeltaAndCommit(
      spark, store, "seqs", Some(dim), None, cfg, stateDir, "base"))
    val baseViol = r1.deltaViolations.count()

    store.commitAppend("seqs", gen(deltaRows, 22L), "part")
    val (tDelta, r2) = timed {
      val r = IncrementalValidation.validateDeltaAndCommit(
        spark, store, "seqs", Some(dim), None, cfg, stateDir, "delta")
      r.deltaViolations.count()
      r.manifest.agg(sum("row_count")).collect()
      r
    }
    val deltaViol = r2.deltaViolations.count()
    val totalRows = r2.manifest.agg(sum("row_count")).head().getLong(0)

    // column-pruning audit: the only prior-snapshot access in the delta run
    // is the key-only uniqueness probe — its scan must read ONE column
    val priorScan = store.readBetween("seqs", 0L, r2.fromSnapshot)
      .select(col(cfg.uniqueKey.get)).queryExecution.executedPlan
    val readSchema = priorScan.collectLeaves().map(_.toString)
      .find(_.contains("ReadSchema")).getOrElse("")
    val pruned = readSchema.contains("struct<doc_id:string>")

    // reference point: full from-scratch validation of the post-append table
    val (tFull, _) = timed {
      val r = ValidationPipeline.run(spark,
        store.readAsOf("seqs").drop("_snap_id"), Some(dim), None, cfg, "full")
      r.violations.count()
      r.manifest.agg(sum("row_count")).collect()
      r.violations.unpersist()
    }

    println(s"""{"probe":"incremental_scale","rows":$rows,"delta_rows":$deltaRows,""" +
      s""""base_validate_sec":$tBase,"delta_validate_sec":$tDelta,""" +
      s""""full_revalidate_sec":$tFull,"speedup_vs_full":${tFull / tDelta},""" +
      s""""base_violations":$baseViol,"delta_violations":$deltaViol,""" +
      s""""total_rows_in_manifest":$totalRows,"prior_read_key_only":$pruned}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
