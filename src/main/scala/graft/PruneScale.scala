package graft

import graft.snapshot.AppendSnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for manifest file skipping: build a standing append store of
  * `SPARK_GRAFT_SNAPS` snapshots (time-ordered disjoint `ts` ranges — the
  * natural layout of a daily-append job), then answer a narrow ts-range
  * query two ways: `readAsOfWhere` (driver-side file pruning from the
  * FileStats sidecars) vs `readAsOf().filter(...)` (full listing + scan,
  * row-group pushdown only). Prints ONE JSON line with file counts and
  * min-over-reps wall times — the evidence that a narrow predicate reads
  * O(matching files), not O(table).
  *
  * env: SPARK_GRAFT_SCALE_ROWS (rows per snapshot, default 50000),
  *      SPARK_GRAFT_SNAPS (default 24), SPARK_GRAFT_CPUS (16).
  */
object PruneScale {
  def main(args: Array[String]): Unit = {
    val rowsPerSnap = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "50000").toLong
    val snaps = sys.env.getOrElse("SPARK_GRAFT_SNAPS", "24").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-prunescale").toString
    val store = new AppendSnapshotStore(spark, root)
    val t0 = System.nanoTime()
    (0 until snaps).foreach { s =>
      val base = s.toLong * rowsPerSnap
      val df = spark.range(base, base + rowsPerSnap)
        .select(col("id"), col("id").as("ts"),
          concat(lit("p"), pmod(col("id"), lit(4))).as("part"),
          xxhash64(col("id")).as("payload"))
      store.commitAppend("t", df, "part")
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    // narrow range: the middle fifth of ONE snapshot
    val lo = (snaps / 2) * rowsPerSnap + rowsPerSnap / 5
    val hi = lo + rowsPerSnap / 5

    def timed(f: => Long): (Double, Long) = {
      val reps = (1 to 3).map { _ =>
        val a = System.nanoTime(); val c = f; ((System.nanoTime() - a) / 1e9, c)
      }
      (reps.map(_._1).min, reps.head._2)
    }
    val pruned = store.readAsOfWhere("t", "ts", lo, hi)
    val full = store.readAsOf("t").filter(col("ts") >= lo && col("ts") <= hi)
    val (tP, nP) = timed(pruned.agg(count(lit(1))).collect()(0).getLong(0))
    val (tF, nF) = timed(full.agg(count(lit(1))).collect()(0).getLong(0))
    require(nP == nF, s"pruned $nP != full $nF")

    println(s"""{"probe":"prune_scale","snaps":$snaps,"rows_per_snap":$rowsPerSnap,""" +
      s""""build_sec":$buildSec,""" +
      s""""files_pruned_read":${pruned.inputFiles.length},""" +
      s""""files_full_read":${full.inputFiles.length},""" +
      s""""rows_matched":$nP,"pruned_sec":$tP,"full_sec":$tF}""")
    spark.stop()
  }
}
