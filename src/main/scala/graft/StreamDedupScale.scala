package graft

import graft.snapshot.AppendSnapshotStore
import graft.table.Dedup
import graft.tokens.TokenSeqs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for streaming fuzzy dedup ([[graft.streaming.StreamingDedup]]):
  * seed a corpus into the snapshot store with persisted MinHash signatures,
  * then stream B equal batches of fresh docs (~1% near-dups of the seed)
  * through `nearDupSink` and time each micro-batch. The scale claim under
  * test: per-batch wall time tracks the BATCH size, not the accumulated
  * corpus — the accumulated side contributes only its signature table (K
  * longs/doc) to candidate generation, never a token rescan. Prints ONE
  * JSON line with seed size, per-batch times, pair counts, and the
  * batch-parity check (stream union == batch incremental operator).
  *
  * env: SPARK_GRAFT_SCALE_ROWS (seed docs, default 200000),
  *      SPARK_GRAFT_SCALE_BATCHES (default 3),
  *      SPARK_GRAFT_SCALE_BATCH_ROWS (default 20000), SPARK_GRAFT_CPUS (16).
  */
object StreamDedupScale {
  def main(args: Array[String]): Unit = {
    val seedRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "200000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SCALE_BATCHES", "3").toInt
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_BATCH_ROWS", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-sdedup-scale").toString
    val store = new AppendSnapshotStore(spark, s"$root/table")

    // seed corpus: unique token sequences under positive hashed ids
    def docs(rows: Long, seed: Long, idSign: Int) =
      TokenSeqs.synthesize(spark, rows, seed, violationRate = 0.0,
          numPartitions = cpus * 2)
        .select((xxhash64(col("doc_id")) * idSign).as("doc_id"), col("tokens"),
          col("source"))
    val seed = docs(seedRows, 7L, 1)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    seed.count()
    store.commitAppend("docs", seed, "source")
    Dedup.minhashSignatures(seed, "doc_id", "tokens")
      .write.parquet(s"$root/sigs/batch=seed")

    // fresh stream: each batch has batchRows unique docs (synthesize's
    // doc_id derives from (row, seed), so a per-batch seed already makes
    // ids batch-unique) plus ~1% copies of SEED docs under fresh ids —
    // cross-batch near-dups against the accumulated corpus
    val freshAll = (0 until nBatches).map { b =>
      val uniq = docs(batchRows, 100L + b, -1)
      val copies = seed.filter(pmod(col("doc_id"), lit(100)) === b % 100)
        .limit((batchRows / 100).toInt)
        .select((-col("doc_id") - 1000000000L * (b + 1)).as("doc_id"),
          col("tokens"), col("source"))
      uniq.unionByName(copies)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }
    freshAll.foreach(_.count())

    // drive the foreachBatch body directly per batch (the probe measures the
    // operator, not MemoryStream plumbing): same calls nearDupSink makes
    val times = scala.collection.mutable.ArrayBuffer[Double]()
    val counts = scala.collection.mutable.ArrayBuffer[Long]()
    var streamed = 0L
    freshAll.zipWithIndex.foreach { case (batch, b) =>
      val t0 = System.nanoTime()
      val priorSigs = spark.read.parquet(s"$root/sigs").select("id", "sig")
      val prior = store.readAsOf("docs").drop("_snap_id")
      val pairs = Dedup.incrementalLshPairs(prior, batch, "doc_id", "tokens",
        minJaccard = 0.9, priorSigs = Some(priorSigs))
      counts += pairs.count()
      store.commitAppend("docs", batch, "source",
        idempotencyToken = Some(s"probe-batch-$b"))
      Dedup.minhashSignatures(batch, "doc_id", "tokens")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/sigs/batch=$b")
      times += (System.nanoTime() - t0) / 1e9
      streamed += batch.count()
    }

    // parity: union of per-batch pair counts == the one-shot batch operator
    // over the same prior/fresh split
    val fresh = freshAll.reduce(_ unionByName _)
    val batchPairs = Dedup.incrementalLshPairs(seed, fresh, "doc_id", "tokens",
      minJaccard = 0.9).count()
    val parity = counts.sum == batchPairs

    println(s"""{"probe":"stream_dedup","seed_docs":${seedRows},""" +
      s""""batches":$nBatches,"streamed_docs":$streamed,""" +
      s""""batch_sec":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""batch_pairs":[${counts.mkString(",")}],""" +
      s""""stream_pair_total":${counts.sum},"batch_operator_pairs":$batchPairs,""" +
      s""""parity":$parity}""")
    spark.stop()
  }
}
