package graft

import graft.snapshot.AppendSnapshotStore
import graft.tokens.TokenSeqs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Scale probe for snapshot compaction: a standing append job commits many
  * small deltas, so `readAsOf` unions every snap dir and the data-file count
  * (scan planning, open/seek overhead, shuffle-read fan-in) grows linearly
  * in appends — the classic small-files failure mode at 100 TB. `compact()`
  * folds history into one partition-clustered dir and `vacuum()` drops the
  * superseded dirs.
  *
  * The probe: commit K appends, measure data-file count + full-read wall +
  * a content checksum; compact + vacuum; re-measure. Asserts the checksum,
  * row count, per-snapshot lineage counts, and a mid-history `readAsOf` all
  * answer IDENTICALLY through the compacted layout. Prints ONE JSON line.
  *
  * env: SPARK_GRAFT_APPENDS (default 40), SPARK_GRAFT_APPEND_ROWS (50000),
  *      SPARK_GRAFT_CPUS (16).
  */
object CompactionScale {
  def main(args: Array[String]): Unit = {
    val appends = sys.env.getOrElse("SPARK_GRAFT_APPENDS", "40").toInt
    val appendRows = sys.env.getOrElse("SPARK_GRAFT_APPEND_ROWS", "50000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = 16
    def gen(seed: Long): DataFrame =
      TokenSeqs.synthesize(spark, appendRows, seed, violationRate = 0.0,
        numPartitions = cpus)
        .withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(parts)))

    val root = java.nio.file.Files.createTempDirectory("graft-compact-scale").toString
    val store = new AppendSnapshotStore(spark, root)
    (1 to appends).foreach(i => store.commitAppend("t", gen(i.toLong), "part"))

    def dataFiles(): Long = {
      val p = new Path(root, "t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // full-read wall: count + content checksum + lineage fold, min over reps
    def readAll(): (Long, Long, Double) = {
      var best = Double.MaxValue
      var out: (Long, Long) = null
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val r = store.readAsOf("t")
          .agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, _snap_id))"))
          .collect()(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        out = (r.getLong(0), r.getLong(1))
      }
      (out._1, out._2, best)
    }

    val filesBefore = dataFiles()
    val (nBefore, sumBefore, wallBefore) = readAll()
    val midBefore = store.readAsOf("t", Some(appends / 2L)).count()

    val t0 = System.nanoTime()
    store.compact("t", "part")
    val compactWall = (System.nanoTime() - t0) / 1e9
    val removed = store.vacuum("t")

    val filesAfter = dataFiles()
    val (nAfter, sumAfter, wallAfter) = readAll()
    val midAfter = store.readAsOf("t", Some(appends / 2L)).count()

    require(nBefore == nAfter && sumBefore == sumAfter,
      s"compaction changed content: $nBefore/$sumBefore vs $nAfter/$sumAfter")
    require(midBefore == midAfter, s"time travel diverged: $midBefore vs $midAfter")
    require(nBefore == appends * appendRows)

    println(s"""{"metric":"compaction_probe","appends":$appends,""" +
      s""""rows":${appends * appendRows},"files_before":$filesBefore,""" +
      s""""files_after":$filesAfter,"dirs_removed":$removed,""" +
      s""""read_wall_before_sec":${f"$wallBefore%.3f"},""" +
      s""""read_wall_after_sec":${f"$wallAfter%.3f"},""" +
      s""""compact_wall_sec":${f"$compactWall%.3f"},""" +
      s""""checksum_identical":true,"time_travel_identical":true}""")
    spark.stop()
  }
}
