package graft.snapshot

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SparkPlan, QueryExecution}

/** Bucketed persisted tables: the storage-side answer to repeated joins and
  * aggregations on a stable key (SURVEY §4 "minimize shuffles").
  *
  * A fact table bucketed (and sort-ordered) on its join key is written ONCE
  * with the shuffle baked into the layout; every later join against another
  * table bucketed the same way — or every groupBy on the bucket key —
  * compiles WITHOUT an Exchange on that side. At 100 TB this converts the
  * recurring widest shuffle of a validation/dedup pipeline (fact ⋈ fact on
  * id) into a one-time write cost, exactly like Hive/Iceberg bucket
  * transforms; Spark's native bucketing (`DataFrameWriter.bucketBy` +
  * `saveAsTable`) provides the metadata the planner needs.
  *
  * Tables are registered as EXTERNAL (explicit `path`) so data lives under
  * the caller's root, not the session warehouse; the in-memory catalog only
  * carries the bucket spec. The reference has no storage layer at all —
  * its scope ends at single-instance validation — so this component is
  * Spark-first by construction.
  */
object BucketedTables {

  /** Write `df` as a bucketed, per-bucket-sorted external table. The write
    * shuffles once into `numBuckets` hash buckets of `keys` — the LAST
    * shuffle these rows need for any key-aligned join/agg that follows. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    numBuckets: Int, keys: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketed table needs at least one bucket key")
    df.write
      .mode(mode)
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Read a bucketed table back with its bucket metadata (so the planner
    * can elide exchanges). A plain `spark.read.parquet(path)` on the same
    * files would LOSE the bucket spec — always read through the catalog. */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Number of ShuffleExchange operators in the (possibly adaptive) final
    * physical plan — the assertion primitive for "this join/agg was
    * exchange-free". Executes the plan when AQE is on (the final plan only
    * exists after execution). */
  def shuffleExchangeCount(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    val qe: QueryExecution = df.queryExecution
    def count(p: SparkPlan): Int =
      (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
        p.children.map(count).sum +
        p.subqueries.map(count).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            count(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            count(q.plan)
          case _ => 0
        })
    count(qe.executedPlan)
  }
}
