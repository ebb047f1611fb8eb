package graft.tokens

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence shaping over the canonical `(doc_id, tokens, n_tok,
  * source)` table: the step between a validated/deduplicated corpus and the
  * fixed-length sequences a trainer actually consumes. The reference
  * validates documents and stops; these are pipeline operators the tokens
  * payload needs at 10^12-sequence scale.
  *
  * Scale design, per operator:
  *  - [[chunkSequences]] is a pure map-side explode (no shuffle at all): the
  *    chunk count is computed per row and `slice` runs codegen'd on the
  *    already-loaded array. 100 TB in, 100 TB out, zero exchanges.
  *  - [[packAssignments]] / [[packedSequences]] implement GPT-style
  *    concat-then-cut packing (concatenate docs with an EOS separator into a
  *    stream, cut every `seqLen` tokens). A single global stream would need a
  *    total order — so the stream is per `(groupCols, bucket)`: each group is
  *    an independent pack stream, ordered by `doc_id` inside. Streams
  *    parallelize perfectly; `buckets > 1` subdivides a giant group
  *    deterministically (training does not care WHICH stream a doc lands in,
  *    only that the layout is reproducible). The window is
  *    partition-by-stream — Spark distributes one stream per task; no
  *    single-partition global window anywhere.
  *  - [[packedSequences]] materializes each output row from at most `seqLen`
  *    tokens' worth of span pieces (`groupBy(stream, seq_id)`), so aggregation
  *    buffers are bounded by `seqLen` regardless of corpus size.
  *  - [[shardOrder]] assigns a deterministic training shard + intra-shard
  *    position from the rolling content fingerprint — a reproducible global
  *    shuffle without a global sort (rank only inside each shard's window).
  */
object Packing {

  /** Sliding-window chunking: split each document's token array into windows
    * of `seqLen` advancing by `stride` (`stride == seqLen` = disjoint chunks;
    * `stride < seqLen` = overlapping). Standard window count:
    * `1 + ceil((n - seqLen) / stride)` for `n > seqLen`, else 1 (empty docs
    * emit nothing). Output: `doc_id, chunk_idx, chunk_tokens, chunk_len`.
    *
    * Plan shape: project + explode, zero shuffles; `slice`/`sequence` are
    * codegen'd so the whole operator stays in one WholeStageCodegen span. */
  def chunkSequences(df: DataFrame, seqLen: Int, stride: Int,
                     idCol: String = "doc_id",
                     tokensCol: String = "tokens"): DataFrame = {
    require(seqLen > 0 && stride > 0, "seqLen and stride must be positive")
    val n = size(col(tokensCol))
    // integer ceil: 1 + (n - seqLen + stride - 1) div stride
    val nChunks = when(n <= seqLen, lit(1))
      .otherwise(lit(1) + floor((n - seqLen + stride - 1) / lit(stride)).cast("int"))
    df.filter(n > 0)
      .select(col(idCol), col(tokensCol),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col(tokensCol), col("chunk_idx") * stride + 1, lit(seqLen)).as("chunk_tokens"))
      .withColumn("chunk_len", size(col("chunk_tokens")))
  }

  /** Stream identity: the group columns, plus a deterministic `bucket` column
    * when `buckets > 1` (so a giant group splits into independent streams —
    * seq_ids are per stream, and outputs carry `bucket` to disambiguate). */
  private def streamCols(groupCols: Seq[String], idCol: String,
                         buckets: Int): Seq[Column] =
    if (buckets <= 1) groupCols.map(col)
    else groupCols.map(col) :+ pmod(xxhash64(col(idCol)), lit(buckets.toLong)).as("bucket")

  private def streamNames(groupCols: Seq[String], buckets: Int): Seq[String] =
    if (buckets <= 1) groupCols else groupCols :+ "bucket"

  /** Pack-assignment table for concat-then-cut packing: for every document,
    * which output sequence(s) its tokens land in and where. Within each pack
    * stream (one per `groupCols` value, optionally × `buckets`), docs are
    * concatenated in `doc_id` order, each followed by `eosTokens` separator
    * positions; the stream is cut every `seqLen` positions.
    *
    * Output row per (doc × overlapped sequence): `seq_id` (sequence index in
    * the stream), `tok_begin`/`tok_end` (the half-open within-doc token range
    * that lands there), `seq_off` (where in the sequence it starts). A doc
    * whose tokens straddle a cut emits one row per side. Rows are emitted only
    * for ranges with at least one real token (separator-only tails are implied
    * — [[packedSequences]] re-adds them).
    *
    * The running offset is a `sum over (partition by stream order by doc_id)`
    * window — per-stream, distributed; no global ordering. */
  def packAssignments(df: DataFrame, seqLen: Int,
                      groupCols: Seq[String] = Seq("source"),
                      idCol: String = "doc_id",
                      nTokCol: String = "n_tok",
                      eosTokens: Int = 1,
                      buckets: Int = 1): DataFrame = {
    require(seqLen > 0 && eosTokens >= 0, "seqLen > 0, eosTokens >= 0")
    val sc = streamCols(groupCols, idCol, buckets)
    val w = Window.partitionBy(sc: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(nTokCol).cast("long")
    val footprint = n + eosTokens
    val start = sum(footprint).over(w) - footprint
    val L = lit(seqLen.toLong)
    val base = df.select((sc :+ col(idCol) :+ n.as("_n") :+ start.as("_start")): _*)
      // zero-footprint rows (n=0 with eosTokens=0) would make s1 < s0, and
      // Spark's sequence() helpfully counts DOWN when stop < start — drop them
      .filter(col("_n") + lit(eosTokens.toLong) > 0)
      .withColumn("_s0", floor(col("_start") / L))
      .withColumn("_s1", floor((col("_start") + col("_n") + lit(eosTokens.toLong) - 1) / L))
    val outStream = streamNames(groupCols, buckets).map(col)
    base
      .select((outStream :+ col(idCol) :+ col("_n") :+ col("_start") :+
        explode(sequence(col("_s0"), col("_s1"))).as("seq_id")): _*)
      .select((outStream :+ col(idCol) :+ col("seq_id") :+
        greatest(lit(0L), col("seq_id") * L - col("_start")).as("tok_begin") :+
        least(col("_n"), (col("seq_id") + 1) * L - col("_start")).as("tok_end") :+
        greatest(lit(0L), col("_start") - col("seq_id") * L).as("seq_off")): _*)
      .filter(col("tok_end") > col("tok_begin"))
  }

  /** Materialized packed training sequences: concat-then-cut with an explicit
    * `eosId` separator after every document. Output: one row per
    * (stream, seq_id) with `packed` (exactly `seqLen` tokens except each
    * stream's final sequence) and `n_filled`.
    *
    * Distribution: token spans come from [[packAssignments]] (window +
    * explode); EOS pieces are a second map-side projection; the final
    * `groupBy(stream, seq_id)` aggregates at most `seqLen` tokens per group —
    * buffer size is bounded by `seqLen`, never by document or corpus size. */
  def packedSequences(df: DataFrame, seqLen: Int, eosId: Int,
                      groupCols: Seq[String] = Seq("source"),
                      idCol: String = "doc_id",
                      tokensCol: String = "tokens",
                      buckets: Int = 1): DataFrame = {
    // Pieces are built IN the window projection (no join-back by id): the
    // payload crosses exactly ONE exchange — the window's hash partitioning
    // on the stream columns — and the final groupBy(stream, seq_id) reuses
    // that partitioning (HashPartitioning(stream) satisfies
    // ClusteredDistribution(stream, seq_id)), so no second payload shuffle.
    val streams = streamNames(groupCols, buckets)
    val sc = streamCols(groupCols, idCol, buckets)
    val w = Window.partitionBy(sc: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = size(col(tokensCol)).cast("long")
    val L = lit(seqLen.toLong)
    val withStart = df
      .select((sc :+ col(idCol) :+ col(tokensCol) :+ n.as("_n")): _*)
      .withColumn("_start", sum(col("_n") + 1).over(w) - (col("_n") + 1))
    // one row per (doc, sequence it touches); the doc's last sequence also
    // carries the EOS separator. tb/te mirror packAssignments' span math.
    val s1 = floor((col("_start") + col("_n")) / L)
    val tb = greatest(lit(0L), col("seq_id") * L - col("_start"))
    val te = least(col("_n"), (col("seq_id") + 1) * L - col("_start"))
    val pieces = withStart
      .select((streams.map(col) :+ col(tokensCol) :+ col("_n") :+ col("_start") :+
        explode(sequence(floor(col("_start") / L), s1)).as("seq_id")): _*)
      .select((streams.map(col) :+ col("seq_id") :+
        greatest(lit(0L), col("_start") - col("seq_id") * L).as("seq_off") :+
        concat(
          slice(col(tokensCol), (tb + 1).cast("int"),
            greatest(te - tb, lit(0L)).cast("int")),
          when(col("seq_id") === s1, array(lit(eosId)))
            .otherwise(array().cast("array<int>"))).as("piece")): _*)
    pieces
      .groupBy((streams.map(col) :+ col("seq_id")): _*)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("seq_off"), col("piece")))),
        p => p.getField("piece"))).as("packed"))
      .withColumn("n_filled", size(col("packed")).cast("long"))
  }

  /** Packing-efficiency report, one row per stream plus the `_total` row —
    * the tool that picks `seqLen`/`buckets` BEFORE materializing 100 TB of
    * packed sequences: with concat-then-cut, waste is only each stream's
    * tail remainder, so `pad_frac = (n_seqs·seqLen − total) / (n_seqs·seqLen)`
    * follows directly from per-stream token totals. ONE map-side-combined
    * aggregation to |streams| rows; tokens are counted from `nTokCol`, the
    * payload is never read. */
  def packingStats(df: DataFrame, seqLen: Int,
                   groupCols: Seq[String] = Seq("source"),
                   idCol: String = "doc_id",
                   nTokCol: String = "n_tok",
                   eosTokens: Int = 1,
                   buckets: Int = 1): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val sc = streamCols(groupCols, idCol, buckets)
    val names = streamNames(groupCols, buckets)
    val L = seqLen.toLong
    val perStream = df
      .select((sc :+ (col(nTokCol).cast("long") + eosTokens).as("_fp")): _*)
      .filter(col("_fp") > 0)
      .groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("_fp")).as("total_tokens"))
      .withColumn("n_seqs", ceil(col("total_tokens").cast("double") / L).cast("long"))
      .withColumn("pad_tokens", col("n_seqs") * L - col("total_tokens"))
      .withColumn("pad_frac",
        round(col("pad_tokens").cast("double") / (col("n_seqs") * L), 9))
    val stream = concat_ws("/", names.map(col): _*)
    val rows = perStream.select(stream.as("stream"), col("n_docs"),
      col("total_tokens"), col("n_seqs"), col("pad_tokens"), col("pad_frac"))
    val total = rows.agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"), sum("n_seqs").as("n_seqs"),
        sum("pad_tokens").as("pad_tokens"))
      .select(lit("_total").as("stream"), col("n_docs"), col("total_tokens"),
        col("n_seqs"), col("pad_tokens"),
        round(col("pad_tokens").cast("double") / (col("n_seqs") * L), 9)
          .as("pad_frac"))
    rows.unionByName(total)
  }

  /** Deterministic training shard + intra-shard order: shard by the rolling
    * content fingerprint mod `numShards`, position by `row_number` inside the
    * shard (ordered by fingerprint, then id — fully deterministic and
    * engine-portable; no engine-internal hash involved). A reproducible
    * global shuffle with only a per-shard window — no global sort. */
  def shardOrder(df: DataFrame, numShards: Int,
                 idCol: String = "doc_id",
                 tokensCol: String = "tokens"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val fp = graft.table.TextAnalysis.fingerprint(col(tokensCol))
    val withFp = df.select(col(idCol), fp.as("fp"),
      pmod(fp, lit(numShards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("fp"), col(idCol))
    withFp.select(col(idCol), col("shard"),
      (row_number().over(w) - 1).cast("long").as("pos"))
  }
}
