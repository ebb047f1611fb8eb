package graft

import graft.model.SchemaParser
import graft.streaming.StreamingValidation
import graft.tokens.TokenSeqs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class StreamRow(doc_id: String, tokens: Array[Int], n_tok: Int,
                     source: String, ts: java.sql.Timestamp)

case class DedupDoc(doc_id: Long, tokens: Array[Int], source: String)

class StreamingSpec extends SparkSpec {

  private val uuidA = "0f8fad5b-d9cb-469f-a165-70867728950e"
  private val uuidB = "7c9e6679-7425-40de-944b-e07fc1f90ae7"

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("stateless violations stream: compiled plan runs on micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val doc = SchemaParser.parse(TokenSeqs.canonicalSchemaJson())
    val out = StreamingValidation.violations(input.toDF(), doc, "doc_id")
    val q = out.writeStream.format("memory").queryName("viols")
      .outputMode("append").start()
    try {
      input.addData(
        StreamRow(uuidA, Array(1, 2, 3), 3, "web", ts(0)),      // clean
        StreamRow("bad-id", Array(1), 1, "web", ts(1)),         // format:uuid
        StreamRow(uuidB, Array(-5), 1, "web", ts(2)),           // items minimum
        StreamRow(uuidA, Array(1), 1, "reddit", ts(3)))         // enum
      q.processAllAvailable()
      val rows = spark.sql("select keyword from viols").collect().map(_.getString(0))
      assert(rows.count(_ == "format") === 1)
      assert(rows.count(_ == "minimum") === 1)
      assert(rows.count(_ == "enum") === 1)
    } finally q.stop()
  }

  test("windowed violation counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val doc = SchemaParser.parse(TokenSeqs.canonicalSchemaJson())
    val out = StreamingValidation.windowedViolationCounts(
      input.toDF(), doc, "doc_id", "ts", "10 seconds", "30 seconds")
    val q = out.writeStream.format("memory").queryName("winviols")
      .outputMode("update").start()
    try {
      input.addData(
        StreamRow(uuidA, Array(1), 1, "web", ts(0)),
        StreamRow("nope", Array(1), 1, "web", ts(1)),
        StreamRow("nope2", Array(1), 1, "web", ts(12)))
      q.processAllAvailable()
      val m = spark.sql("select keyword, sum(cnt) from winviols group by 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m.getOrElse("format", 0L) === 2L)
      assert(m.getOrElse("_none", 0L) >= 1L) // the clean row
    } finally q.stop()
  }

  test("streaming referential integrity: stream-static broadcast anti-join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val dim = Seq("web", "books", "code", "wiki").toDF("source")
    val out = StreamingValidation.streamingRiViolations(
      input.toDF(), dim, "source", "source", "doc_id")
    val q = out.writeStream.format("memory").queryName("rivio")
      .outputMode("append").start()
    try {
      input.addData(
        StreamRow(uuidA, Array(1), 1, "web", ts(0)),
        StreamRow(uuidB, Array(1), 1, "reddit", ts(1)),
        StreamRow(uuidA, Array(1), 1, "books", ts(2)))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, keyword from rivio").collect()
      assert(rows.length === 1)
      assert(rows(0).getString(0) === uuidB)
      assert(rows(0).getString(1) === "referential")
    } finally q.stop()
  }

  test("windowed chi-squared drift vs static baseline (chained windowed aggs)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    // baseline: uniform over web/books — a window of all-web must score
    // chi2 = N ((0.5N-N)^2/(0.5N) x2 = N); a balanced window scores 0
    val baseline = (Seq.fill(50)("web") ++ Seq.fill(50)("books")).toDF("source")
    val out = StreamingValidation.windowedChiSquared(
      input.toDF(), baseline, "source", "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("chi2win")
      .outputMode("append").start()
    try {
      // window [0,10): 4x web, 0 books → chi2 = 4; window [10,20): 2+2 → 0
      input.addData(
        StreamRow(uuidA, Array(1), 1, "web", ts(0)),
        StreamRow(uuidA, Array(1), 1, "web", ts(1)),
        StreamRow(uuidA, Array(1), 1, "web", ts(2)),
        StreamRow(uuidA, Array(1), 1, "web", ts(3)),
        StreamRow(uuidA, Array(1), 1, "web", ts(12)),
        StreamRow(uuidA, Array(1), 1, "books", ts(13)),
        StreamRow(uuidA, Array(1), 1, "web", ts(14)),
        StreamRow(uuidA, Array(1), 1, "books", ts(15)))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows (append mode)
      input.addData(StreamRow(uuidA, Array(1), 1, "web", ts(100)))
      q.processAllAvailable()
      val m = spark.sql("select w_start, chi2_stat from chi2win")
        .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
      val w0 = ts(0).getTime - (ts(0).getTime % 10000)   // window starts
      val w1 = w0 + 10000
      assert(math.abs(m(w0) - 4.0) < 1e-9)  // all-web window: chi2 = N = 4
      assert(math.abs(m(w1) - 0.0) < 1e-9)  // balanced window matches baseline
    } finally q.stop()
  }

  test("windowed token drift matches the batch tokenUnigramDrift on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val baseline = Seq(Seq(1, 2), Seq(1, 3), Seq(2, 3)).toDF("tokens")
    val out = StreamingValidation.windowedTokenDrift(
      input.toDF(), baseline, "tokens", "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("tokwin")
      .outputMode("append").start()
    try {
      // window [0,10): tokens {1,1,4,4} — 4 is unknown to the baseline;
      // window [10,20): same mix as the baseline → psi = 0
      input.addData(
        StreamRow(uuidA, Array(1, 4), 2, "web", ts(0)),
        StreamRow(uuidA, Array(1, 4), 2, "web", ts(3)),
        StreamRow(uuidA, Array(1, 2), 2, "web", ts(12)),
        StreamRow(uuidA, Array(1, 3), 2, "web", ts(13)),
        StreamRow(uuidA, Array(2, 3), 2, "web", ts(14)))
      q.processAllAvailable()
      input.addData(StreamRow(uuidA, Array(1), 1, "web", ts(100)))
      q.processAllAvailable()
      val m = spark.sql("select w_start, psi from tokwin")
        .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
      val w0 = ts(0).getTime - (ts(0).getTime % 10000)
      val w1 = w0 + 10000
      val exp0 = graft.table.TableChecks.tokenUnigramDrift(
        Seq(Seq(1, 4), Seq(1, 4)).toDF("tokens"), baseline, "tokens")
        .collect()(0).getDouble(0)
      assert(math.abs(m(w0) - exp0) < 1e-9, s"w0: ${m(w0)} vs batch $exp0")
      assert(math.abs(m(w1) - 0.0) < 1e-12, s"w1: ${m(w1)}")
    } finally q.stop()
  }

  test("incremental sink: micro-batches become snapshots, validated delta-only, manifest merged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.run.{IncrementalResult, PipelineConfig}
    import graft.snapshot.AppendSnapshotStore
    val input = MemoryStream[StreamRow]
    val root = java.nio.file.Files.createTempDirectory("graft-stream-incr").toString
    val store = new AppendSnapshotStore(spark, s"$root/table")
    val cfg = PipelineConfig(TokenSeqs.canonicalSchemaJson(),
      riKey = None, driftNumCol = None, driftCatCol = None)
    val results = scala.collection.mutable.Buffer[IncrementalResult]()
    val q = StreamingValidation.incrementalSink(
      input.toDF().withColumn("part", pmod(xxhash64(coalesce(col("doc_id"), lit(""))), lit(2))),
      store, "seqs", "part", None, None, cfg, s"$root/state",
      r => results.synchronized { results += r })
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 1: two clean rows + one n_tok minimum violation
      input.addData(
        StreamRow(uuidA, Array(1, 2, 3), 3, "web", ts(0)),
        StreamRow(uuidB, Array(1), 1, "books", ts(1)),
        StreamRow("9e107d9d-372b-46c1-9bf2-817bcf658bc8", Array(1), 0, "web", ts(2)))
      q.processAllAvailable()
      // batch 2: one clean row + a doc_id reused from batch 1
      input.addData(
        StreamRow("45c4e7ba-5d4a-4a67-8f63-1c2d05e2b968", Array(7), 1, "code", ts(10)),
        StreamRow(uuidA, Array(9), 1, "wiki", ts(11)))
      q.processAllAvailable()

      assert(store.committedIds("seqs") == Seq(1L, 2L))
      val rs = results.synchronized(results.toList)
      assert(rs.map(r => (r.fromSnapshot, r.toSnapshot)) == List((0L, 1L), (1L, 2L)))
      // batch 1's violation found in its delta; batch 2 sees only its own
      // rows plus the cross-snapshot duplicate against batch 1's keys
      assert(rs(0).deltaViolations.filter(col("keyword") === "minimum").count() == 1)
      val uniq = rs(1).deltaViolations.filter(col("keyword") === "uniqueness").collect()
      assert(uniq.map(_.getAs[String]("doc_id")).toSeq == Seq(uuidA))
      assert(uniq.head.getAs[String]("message").contains("prior snapshot"))
      // merged manifest covers the WHOLE table after batch 2
      assert(rs(1).manifest.collect().map(_.getAs[Long]("row_count")).sum == 5L)
      // the same state dir serves a batch incremental run after the stream
      val r3 = graft.run.IncrementalValidation.validateDeltaAndCommit(
        spark, store, "seqs", None, None, cfg, s"$root/state", "post-stream")
      assert(r3.fromSnapshot == 2L && r3.toSnapshot == 2L)
      assert(r3.manifest.collect().map(_.getAs[Long]("row_count")).sum == 5L)
      // a replayed micro-batch (at-least-once foreachBatch) is a no-op:
      // the batchId-derived token resolves to the existing snapshot
      val replayed = store.commitAppend("seqs",
        store.readBetween("seqs", 0L, 1L).drop("_snap_id"), "part",
        idempotencyToken = Some("stream-batch-0"))
      assert(replayed == 1L)
      assert(store.committedIds("seqs") == Seq(1L, 2L))
      assert(store.readAsOf("seqs").count() == 5L)
    } finally q.stop()
  }

  test("streaming fuzzy dedup: per-batch pairs vs accumulated corpus equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.snapshot.AppendSnapshotStore
    import graft.table.Dedup
    def doc(id: Long, toks: Seq[Int]) = DedupDoc(id, toks.toArray, s"src${id % 2}")
    val base = Seq.range(1, 13)
    val other = Seq.range(100, 112)
    val root = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    val store = new AppendSnapshotStore(spark, s"$root/table")
    val seed = Seq(doc(1, base), doc(2, other))
    store.commitAppend("docs", seed.toDF(), "source")
    Dedup.minhashSignatures(seed.toDF(), "doc_id", "tokens")
      .write.parquet(s"$root/sigs/batch=seed")
    val input = MemoryStream[DedupDoc]
    val got = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    val q = graft.streaming.StreamingDedup.nearDupSink(
      input.toDF(), store, "docs", s"$root/sigs", "doc_id", "tokens", "source",
      minJaccard = 0.5,
      onPairs = p => got.synchronized {
        got ++= p.as[(Long, Long, Double)].collect()
      })
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 1: a near-copy of seed doc 1 + a brand-new doc
      val b1 = Seq(doc(10, base :+ 13), doc(11, Seq.range(200, 212)))
      input.addData(b1: _*); q.processAllAvailable()
      val afterB1 = got.synchronized(got.toSet)
      assert(afterB1.map(p => (p._1, p._2)) == Set((1L, 10L)))
      // batch 2: a copy of batch 1's doc 11 (fresh×earlier-batch) and a
      // copy of seed doc 1 (pairs with BOTH the seed and batch 1's near-copy)
      val b2 = Seq(doc(20, Seq.range(200, 212)), doc(21, base))
      input.addData(b2: _*); q.processAllAvailable()
      val finalPairs = got.synchronized(got.toSet)
      assert(finalPairs.map(p => (p._1, p._2)) ==
        Set((1L, 10L), (11L, 20L), (1L, 21L), (10L, 21L)))
      // the stream's union equals the batch incremental operator run once
      // over the same prior/fresh split — micro-batch boundaries invisible
      val expected = Dedup.incrementalLshPairs(seed.toDF(), (b1 ++ b2).toDF(),
        "doc_id", "tokens", minJaccard = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(finalPairs == expected)
      // every streamed batch is committed: the corpus accumulated
      assert(store.readAsOf("docs").count() == 6L)
    } finally q.stop()
  }

  test("windowed expectations match the batch suite per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.table.Expectations._
    val input = MemoryStream[StreamRow]
    val suite = Seq(
      RowCountBetween(3, 3),
      MeanBetween("n_tok", 0.0, 5.0),
      MatchRegexRate("source", "^w", 1.0))
    val out = StreamingValidation.windowedExpectations(
      input.toDF(), suite, "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("expwin")
      .outputMode("append").start()
    try {
      // window [0,10): 3 rows, mean n_tok = 4, all sources 'web' → all pass
      // window [10,20): 2 rows (count fails), mean 50 (fails), one 'books' (fails)
      input.addData(
        StreamRow(uuidA, Array(1), 3, "web", ts(0)),
        StreamRow(uuidA, Array(1), 4, "web", ts(1)),
        StreamRow(uuidA, Array(1), 5, "web", ts(2)),
        StreamRow(uuidA, Array(1), 40, "web", ts(12)),
        StreamRow(uuidA, Array(1), 60, "books", ts(13)))
      q.processAllAvailable()
      input.addData(StreamRow(uuidA, Array(1), 1, "web", ts(100)))
      q.processAllAvailable()
      val rows = spark.sql("select w_start, expectation, passed from expwin")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getBoolean(2)).toMap
      val w0 = ts(0).getTime - (ts(0).getTime % 10000)
      val w1 = w0 + 10000
      suite.foreach(e => assert(rows((w0, e.name)), s"w0 ${e.name}"))
      suite.foreach(e => assert(!rows((w1, e.name)), s"w1 ${e.name}"))
      // agrees with the batch evaluator on the same window contents
      val batch = graft.table.Expectations.check(
        Seq((40, "web"), (60, "books")).toDF("n_tok", "source"), suite)
        .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
      suite.foreach(e => assert(batch(e.name) == rows((w1, e.name))))
    } finally q.stop()
  }

  test("windowed PSI drift matches the batch psiDrift on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val baseline = (Seq.fill(50)("web") ++ Seq.fill(50)("books")).toDF("source")
    val out = StreamingValidation.windowedPsi(
      input.toDF(), baseline, "source", "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("psiwin")
      .outputMode("append").start()
    try {
      // window [0,10): 3x web + 1x code (unknown to baseline, q = eps);
      // window [10,20): 2+2 balanced → psi = 0
      input.addData(
        StreamRow(uuidA, Array(1), 1, "web", ts(0)),
        StreamRow(uuidA, Array(1), 1, "web", ts(1)),
        StreamRow(uuidA, Array(1), 1, "web", ts(2)),
        StreamRow(uuidA, Array(1), 1, "code", ts(3)),
        StreamRow(uuidA, Array(1), 1, "web", ts(12)),
        StreamRow(uuidA, Array(1), 1, "books", ts(13)),
        StreamRow(uuidA, Array(1), 1, "web", ts(14)),
        StreamRow(uuidA, Array(1), 1, "books", ts(15)))
      q.processAllAvailable()
      input.addData(StreamRow(uuidA, Array(1), 1, "web", ts(100)))
      q.processAllAvailable()
      val m = spark.sql("select w_start, psi from psiwin")
        .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
      val w0 = ts(0).getTime - (ts(0).getTime % 10000)
      val w1 = w0 + 10000
      // the batch operator on the identical window contents is the oracle
      def batchPsi(cur: Seq[String]): Double =
        graft.table.TableChecks.psiDrift(cur.map(Tuple1(_)).toDF("source"),
          baseline, "source").collect()(0).getDouble(0)
      val exp0 = batchPsi(Seq("web", "web", "web", "code"))
      assert(math.abs(m(w0) - exp0) < 1e-9, s"w0: ${m(w0)} vs batch $exp0")
      assert(math.abs(m(w1) - 0.0) < 1e-12, s"w1: ${m(w1)}")
    } finally q.stop()
  }

  test("windowed quantile drift: per-window t-digest vs static baseline quantiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    // baseline n_tok uniform 1..100 → p50 ≈ 50.5, p95 ≈ 95.05
    val baseline = (1 to 100).map(i => Tuple1(i)).toDF("n_tok")
    val out = StreamingValidation.windowedQuantileDrift(
      input.toDF(), baseline, "n_tok", "ts", "10 seconds", "5 seconds",
      probs = Seq(0.5, 0.95))
    val q = out.writeStream.format("memory").queryName("qdrift")
      .outputMode("append").start()
    try {
      // window [0,10): same 1..100 distribution → drift ~ 0;
      // window [10,20): shifted 201..300 → large drift
      val w0rows = (1 to 100).map(i =>
        StreamRow(uuidA, Array(1), i, "web", ts(i % 10)))
      val w1rows = (201 to 300).map(i =>
        StreamRow(uuidA, Array(1), i, "web", ts(10 + (i % 10))))
      input.addData(w0rows ++ w1rows: _*)
      q.processAllAvailable()
      input.addData(StreamRow(uuidA, Array(1), 1, "web", ts(100)))
      q.processAllAvailable()
      val m = spark.sql("select w_start, n_obs, drift from qdrift")
        .collect().map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      val w0 = ts(0).getTime - (ts(0).getTime % 10000)
      val w1 = w0 + 10000
      assert(m(w0)._1 === 100L && m(w1)._1 === 100L)
      // identical distribution: t-digest on 100 points is near-exact
      assert(m(w0)._2 < 0.02, s"w0 drift ${m(w0)._2}")
      // +200 shift: p50 drift ≈ 200/50.5 ≈ 4 — far above any sketch noise
      assert(m(w1)._2 > 2.0, s"w1 drift ${m(w1)._2}")
    } finally q.stop()
  }

  test("streaming uniqueness via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamRow]
    val out = StreamingValidation.streamingDuplicates(input.toDF(), "doc_id", "ts")
    val q = out.writeStream.format("memory").queryName("dups")
      .outputMode("append").start()
    try {
      input.addData(
        StreamRow(uuidA, Array(1), 1, "web", ts(0)),
        StreamRow(uuidB, Array(1), 1, "web", ts(1)))
      q.processAllAvailable()
      input.addData(StreamRow(uuidA, Array(2), 1, "web", ts(2))) // duplicate
      q.processAllAvailable()
      val dups = spark.sql("select doc_id from dups").collect().map(_.getString(0))
      assert(dups.toSeq === Seq(uuidA))
    } finally q.stop()
  }

  test("stateless curation stages compose on a stream: quality flags + pii redaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String)
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    // the same zero-shuffle map stages batch curation uses — quality flags,
    // then redaction on the keepers — run unchanged on micro-batches
    val flagged = graft.table.TextAnalysis.gopherQualityFlags(df, "text",
      minWords = 6, minStopwordHits = 1)
    val out = flagged.filter(col("keep"))
      .select(col("doc_id"),
        graft.table.TextAnalysis.piiRedact(col("text")).as("clean"))
    val q = out.writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the of and mail me at a@b.co for details today"),
        (2L, "too short"),
        (3L, "the and of word word word word word word"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, clean from curated_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L, 3L))
      assert(rows(1L).contains("<EMAIL>") && !rows(1L).contains("a@b.co"))
    } finally q.stop()
  }

  test("stateless DSIR scoring and line dedup run unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fit the DSIR ratio table ONCE on static corpora (driver-side arrays),
    // then score micro-batches with the same codegen'd projection the batch
    // path uses — the model is a reference object, so streaming costs nothing
    val toks = graft.expr.TextExprs.asciiTokens(col("text"))
    val target = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val raw = Seq((1L, "the cat sat on the mat"), (2L, "numbers 11 22 33 44"))
      .toDF("doc_id", "text")
    val table = graft.table.TextAnalysis.dsirRatioTable(
      graft.table.TextAnalysis.hashedBigramCounts(target, toks),
      graft.table.TextAnalysis.hashedBigramCounts(raw, toks))

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      graft.expr.DsirExprs.bigramLogSum(toks, table, 4096).as("w_scaled"),
      graft.table.TextAnalysis.dedupDocLines(
        split(col("text"), "\\|"), minLen = 10).as("clean_lines"))
    val q = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (10L, "the cat sat on the mat"),
        (11L, "numbers 11 22 33 44"),
        (12L, "a long repeated line|a long repeated line|tail"))
      q.processAllAvailable()
      val rows = spark.sql("select * from dsir_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
      assert(rows(10L)._1 > 0L && rows(11L)._1 < 0L) // target-like scores higher
      assert(rows(12L)._2 === Seq("a long repeated line", "tail"))
    } finally q.stop()
  }

  test("schema-driven repair runs unchanged on a stream (repaired side)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val doc = graft.model.SchemaParser.parse(
      """{"type":"object","properties":{
           "id":{"type":"integer"},
           "n":{"type":"integer","minimum":0,"maximum":10},
           "tag":{"enum":["a","b"],"default":"a"}}}""")
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("id", "n", "tag")
    // the repaired side is a stateless projection — it streams as-is; the
    // audit report is a batch aggregation and stays a batch-side concern
    val (rep, _) = graft.row.Repair.repair(df, doc)
    val q = rep.writeStream.format("memory").queryName("repair_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 42L, "zzz"), (2L, 5L, "b"))
      q.processAllAvailable()
      val rows = spark.sql("select id, n, tag from repair_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(rows(1L) == ((10L, "a"))) // clamped + enum default
      assert(rows(2L) == ((5L, "b")))  // untouched
    } finally q.stop()
  }

  test("stateless sequence chunking runs unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Seq[Int])]
    val df = input.toDF().toDF("doc_id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    // chunking is filter + explode + slice — no state, no watermark needed
    val out = graft.tokens.Packing.chunkSequences(df, seqLen = 4, stride = 4)
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      input.addData(("a", 1 to 10), ("b", Seq.empty[Int]))
      q.processAllAvailable()
      input.addData(("c", 1 to 4))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, chunk_idx, chunk_len from chunk_stream")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      assert(rows.toSet === Set(("a", 0, 4), ("a", 1, 4), ("a", 2, 2), ("c", 0, 4)))
    } finally q.stop()
  }
}
