package graft

import graft.tokens.{Packing, TokenSeqs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the training-sequence shaping family: synthesize N docs
  * (1..512 tokens each), then time (a) sliding-window chunking — the
  * zero-shuffle path, (b) pack-assignment planning over bucketed streams,
  * (c) fully materialized packed sequences, and (d) deterministic shard
  * ordering. Prints ONE JSON line with wall times, output counts, and the
  * conservation invariant (sum of n_filled == sum of (n_tok + 1)) checked at
  * scale — evidence the per-stream window design holds when a single stream
  * would be the bottleneck.
  *
  * env: SPARK_GRAFT_SCALE_ROWS (default 1000000), SPARK_GRAFT_CPUS (16),
  *      SPARK_GRAFT_PACK_BUCKETS (default 256).
  */
object PackingScale {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_PACK_BUCKETS", "256").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = TokenSeqs.synthesize(spark, rows, seed = 7L, violationRate = 0.0,
      numPartitions = cpus * 4)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = corpus.count()
    val totTok = corpus.agg(sum(col("n_tok").cast("long"))).head().getLong(0)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
    }

    // (a) chunking: zero-shuffle map path
    val (tCh, nCh) = timed(Packing.chunkSequences(corpus, seqLen = 512, stride = 384).count())

    // (b) pack planning only (assignments; token arrays untouched)
    val (tAs, nAs) = timed(Packing.packAssignments(corpus, seqLen = 2048,
      buckets = buckets).count())

    // (c) materialized packed sequences + conservation check at scale
    val packed = Packing.packedSequences(corpus, seqLen = 2048, eosId = 4096,
      buckets = buckets)
    val (tPk, nPk) = timed(packed.count())
    val filled = packed.agg(sum("n_filled")).head().getLong(0)
    val conserved = filled == totTok + n // one EOS slot per doc

    // (d) deterministic shard order
    val (tSo, nSo) = timed(Packing.shardOrder(corpus, numShards = 1024).count())

    println(s"""{"probe":"packing_scale","rows":$n,"total_tokens":$totTok,""" +
      s""""cpus":$cpus,"buckets":$buckets,""" +
      s""""chunk_sec":$tCh,"chunks":$nCh,""" +
      s""""assign_sec":$tAs,"assignments":$nAs,""" +
      s""""packed_sec":$tPk,"packed_seqs":$nPk,"conserved":$conserved,""" +
      s""""shard_sec":$tSo,"sharded":$nSo}""")
    spark.stop()
  }
}
