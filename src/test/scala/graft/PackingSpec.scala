package graft

import graft.tokens.Packing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence shaping: chunking, concat-then-cut packing, shard order.
  * Invariant-driven — every property here must hold at any scale. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, Seq[Int], String)*): DataFrame =
    rows.toDF("doc_id", "tokens", "source")
      .withColumn("tokens", col("tokens").cast("array<int>"))
      .withColumn("n_tok", size(col("tokens")))

  test("chunkSequences: disjoint chunks reconstruct the document") {
    val df = docs(
      ("a", 1 to 10, "web"),
      ("b", 1 to 3, "web"),
      ("c", 1 to 4, "books")) // exactly one chunk when n == seqLen
    val out = Packing.chunkSequences(df, seqLen = 4, stride = 4).cache()
    // per doc: ceil(n / 4) chunks, concatenation in chunk_idx order == tokens
    val rebuilt = out.groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_tokens")))),
        p => p.getField("chunk_tokens"))).as("rebuilt"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(rebuilt("a") == (1 to 10))
    assert(rebuilt("b") == (1 to 3))
    assert(rebuilt("c") == (1 to 4))
    val counts = out.groupBy("doc_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("chunkSequences: sliding windows overlap by seqLen - stride") {
    val df = docs(("a", 1 to 10, "web"))
    val out = Packing.chunkSequences(df, seqLen = 4, stride = 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getSeq[Int](2)))
    // windows: [1..4],[3..6],[5..8],[7..10] — count 1 + ceil((10-4)/2) = 4
    assert(out.toSeq == Seq(
      0 -> (1 to 4), 1 -> (3 to 6), 2 -> (5 to 8), 3 -> (7 to 10)))
  }

  test("chunkSequences: empty docs emit nothing; zero shuffles in the plan") {
    val df = docs(("a", Nil, "web"), ("b", 1 to 2, "web"))
    val out = Packing.chunkSequences(df, seqLen = 4, stride = 4)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must be map-side only")
  }

  test("packAssignments: spans partition every doc and fill every cut") {
    val df = docs(
      ("d1", 1 to 5, "web"), // stream web: d1[0,5) eos@5 d2[6,13) eos@13 d3...
      ("d2", 1 to 7, "web"),
      ("d3", 1 to 9, "web"),
      ("e1", 1 to 2, "books"))
    val L = 8
    val asg = Packing.packAssignments(df, seqLen = L).cache()
    // 1. per doc: union of [tok_begin, tok_end) == [0, n_tok), disjoint
    val perDoc = asg.orderBy("doc_id", "tok_begin")
      .collect().groupBy(_.getString(1))
    for ((id, rows) <- perDoc) {
      val n = Map("d1" -> 5, "d2" -> 7, "d3" -> 9, "e1" -> 2)(id)
      val spans = rows.map(r => (r.getLong(3), r.getLong(4))).toSeq
      assert(spans.head._1 == 0L, s"$id must start at 0")
      assert(spans.last._2 == n.toLong, s"$id must end at n_tok")
      spans.sliding(2).foreach {
        case Seq((_, e), (b, _)) => assert(e == b, s"$id spans must be contiguous")
        case _ =>
      }
    }
    // 2. stream layout: doc d's span at seq_off within seq_id maps back to
    //    the exact stream position start_d + tok_begin
    val web = asg.filter(col("source") === "web")
      .select("doc_id", "seq_id", "tok_begin", "tok_end", "seq_off")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val starts = Map("d1" -> 0L, "d2" -> 6L, "d3" -> 14L) // (n+1) running
    web.foreach { case (id, seq, tb, te, off) =>
      assert(seq * L + off == starts(id) + tb,
        s"$id: seq $seq off $off must equal stream pos ${starts(id) + tb}")
      assert(off + (te - tb) <= L, "span must fit its sequence")
    }
  }

  test("packedSequences: exact seqLen fill, EOS per doc, stream reconstruction") {
    val df = docs(
      ("d1", 1 to 5, "web"),
      ("d2", 11 to 17, "web"),
      ("d3", 21 to 29, "web"),
      ("e1", 31 to 32, "books"))
    val L = 8
    val out = Packing.packedSequences(df, seqLen = L, eosId = -1).cache()
    val bySeq = out.orderBy("source", "seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2), r.getLong(3)))
    // web stream: 1..5,-1,11..17,-1,21..29,-1 (24 positions → 3 full seqs)
    val webStream = (1 to 5) ++ Seq(-1) ++ (11 to 17) ++ Seq(-1) ++ (21 to 29) ++ Seq(-1)
    val webSeqs = bySeq.filter(_._1 == "web")
    assert(webSeqs.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(webSeqs.flatMap(_._3).toSeq == webStream)
    webSeqs.foreach { case (_, _, packed, filled) =>
      assert(packed.size == L && filled == L.toLong)
    }
    // books stream: 31,32,-1 → one partial final sequence
    val books = bySeq.filter(_._1 == "books")
    assert(books.length == 1 && books.head._3 == Seq(31, 32, -1) && books.head._4 == 3L)
    // EOS count == doc count
    assert(bySeq.flatMap(_._3).count(_ == -1) == 4)
  }

  test("packedSequences: bucketed streams keep every invariant per stream") {
    val rows = (0 until 40).map(i => (f"doc$i%03d", (1 to (i % 13) + 1).toSeq, "web"))
    val df = docs(rows: _*)
    val L = 16
    val out = Packing.packedSequences(df, seqLen = L, eosId = -1, buckets = 4).cache()
    assert(out.columns.contains("bucket"), "bucketed output must carry stream id")
    // per stream: all but the last sequence exactly full, ids contiguous from 0
    val streams = out.collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("seq_id"), r.getAs[Long]("n_filled")))
      .groupBy(_._1)
    assert(streams.size > 1, "4 buckets over 40 docs should yield >1 stream")
    for ((b, rs) <- streams) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"bucket $b seq_ids must be contiguous")
      sorted.init.foreach { case (_, _, filled) => assert(filled == L.toLong) }
    }
    // global conservation: total positions == sum(n_tok + 1)
    val total = out.agg(sum("n_filled")).head().getLong(0)
    assert(total == rows.map(_._2.size + 1).sum.toLong)
    // EOS conservation across streams
    val eos = out.select(explode(col("packed")).as("t")).filter(col("t") === -1).count()
    assert(eos == rows.size.toLong)
  }

  test("shardOrder: deterministic, dense positions, stable across partitioning") {
    val rows = (0 until 50).map(i => (f"doc$i%03d", (1 to (i % 7) + 1).map(_ * (i + 1)), "web"))
    val df = docs(rows: _*)
    val a = Packing.shardOrder(df, numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Packing.shardOrder(df.repartition(7), numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "layout must not depend on input partitioning")
    assert(a.forall { case (_, s, _) => s >= 0 && s < 4 })
    for ((_, g) <- a.groupBy(_._2))
      assert(g.map(_._3).sorted.toSeq == g.indices.map(_.toLong),
        "positions must be dense 0..k-1 within each shard")
  }

  test("packingStats: tail waste per stream plus an exact _total row") {
    // web: 2 docs of 5+1 tokens → 12 total → 2 seqs of 8 → 4 pad
    // code: 1 doc of 7+1 tokens → 8 total → 1 seq → 0 pad
    val df = docs(("a", 1 to 5, "web"), ("b", 6 to 10, "web"), ("c", 1 to 7, "code"))
    val out = Packing.packingStats(df, seqLen = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out("web") == ((2L, 12L, 2L, 4L, 0.25)))
    assert(out("code") == ((1L, 8L, 1L, 0L, 0.0)))
    assert(out("_total") == ((3L, 20L, 3L, 4L, 0.166666667))) // 4/24 at 9dp
  }

  test("sanitize clamps OOV ids to UNK and counts them") {
    val df = docs(("a", Seq(1, 5000, -2, 7), "web"), ("b", Seq(3, 4), "web"))
    val out = graft.tokens.TokenSeqs.sanitize(df, vocab = 4096, unkId = 0)
      .select("doc_id", "tokens", "n_oov").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getInt(2)))).toMap
    assert(out("a") == ((Seq(1, 0, 0, 7), 2)))
    assert(out("b") == ((Seq(3, 4), 0)))
  }
}
