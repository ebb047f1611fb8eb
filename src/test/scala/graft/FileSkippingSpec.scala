package graft

import java.nio.file.Files

import graft.snapshot.AppendSnapshotStore
import org.apache.spark.sql.functions._

/** Manifest-style file skipping: readAsOfWhere prunes whole data files from
  * per-file min/max stats persisted at commit time, and answers identically
  * to the unpruned read + filter. */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-skip").toString

  // three snapshots with DISJOINT n ranges, each clustered into 2 partitions
  private def seed(store: AppendSnapshotStore): Unit =
    Seq(0L, 1L, 2L).foreach { s =>
      val rows = (0 until 100).map { i =>
        (s * 1000L + i, s * 100L + i % 100, if (i % 2 == 0) "a" else "b")
      }.toDF("id", "n", "part")
      store.commitAppend("docs", rows, "part")
    }

  test("pruned read equals unpruned read + filter, and skips files") {
    val store = new AppendSnapshotStore(spark, tmp())
    seed(store)
    val pruned = store.readAsOfWhere("docs", "n", 120L, 180L)
    val full = store.readAsOf("docs").filter(col("n") >= 120 && col("n") <= 180)
    assert(pruned.select("id", "n", "part", "_snap_id").as[(Long, Long, String, Long)]
      .collect().sortBy(_._1).toSeq ==
      full.select("id", "n", "part", "_snap_id").as[(Long, Long, String, Long)]
        .collect().sortBy(_._1).toSeq)
    // only snapshot 2's files (n in [100,199]) survive pruning
    assert(pruned.inputFiles.length < full.inputFiles.length)
    assert(pruned.inputFiles.forall(_.contains("snap=2")))
  }

  test("string-column pruning works on ASCII bounds") {
    val store = new AppendSnapshotStore(spark, tmp())
    Seq("aaa" -> 0, "mmm" -> 1, "zzz" -> 2).foreach { case (v, s) =>
      val rows = (0 until 50).map(i => (s * 100L + i, s"$v$i", "p")).toDF("id", "s", "part")
      store.commitAppend("t", rows, "part")
    }
    val pruned = store.readAsOfWhere("t", "s", "mmm", "mmm9")
    assert(pruned.select("id").as[Long].collect().forall(id => id >= 100 && id < 200))
    assert(pruned.inputFiles.forall(_.contains("snap=2")))
  }

  test("a range spanning snapshots keeps exactly the intersecting files") {
    val store = new AppendSnapshotStore(spark, tmp())
    seed(store)
    val pruned = store.readAsOfWhere("docs", "n", 90L, 110L)
    val snaps = pruned.inputFiles.map(f =>
      "snap=(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong).toSet
    assert(snaps == Set(1L, 2L))
    assert(pruned.agg(count(lit(1))).as[Long].head() ==
      store.readAsOf("docs").filter(col("n").between(90, 110)).count())
  }

  test("pruning survives compaction (stats re-derived for compacted files)") {
    val store = new AppendSnapshotStore(spark, tmp())
    seed(store)
    store.compact("docs", "part")
    store.vacuum("docs")
    // fourth snapshot appended after the compaction
    store.commitAppend("docs",
      (0 until 10).map(i => (9000L + i, 900L + i, "a")).toDF("id", "n", "part"), "part")
    val pruned = store.readAsOfWhere("docs", "n", 905L, 920L)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == (9005L to 9009L))
    val all = store.readAsOfWhere("docs", "n", 0L, 10000L)
    assert(all.count() == 310)
  }

  test("snapshots without a stats sidecar fall back to a full-dir read") {
    val root = tmp()
    val store = new AppendSnapshotStore(spark, root)
    seed(store)
    // simulate a pre-feature table: delete one sidecar
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/docs/_filestats/1"), false)
    val pruned = store.readAsOfWhere("docs", "n", 120L, 180L)
    val full = store.readAsOf("docs").filter(col("n").between(120, 180))
    assert(pruned.count() == full.count())
    // snapshot 1's dir is read unpruned (fallback), snapshot 0's files skipped
    assert(pruned.inputFiles.exists(_.contains("snap=1")))
    assert(!pruned.inputFiles.exists(_.contains("snap=0")))
  }
}
