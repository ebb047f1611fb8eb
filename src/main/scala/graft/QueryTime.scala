package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perf-iteration helper: times individual SparkEntry queries (warm session,
  * N reps, min) without the full Bench sweep.
  * Usage: runMain graft.QueryTime <sfDir> <q1,q2,...> [reps] [cores]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val reps = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(sum(col("id"))).collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $n%-24s min=${ts.min}%7.3f s  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
