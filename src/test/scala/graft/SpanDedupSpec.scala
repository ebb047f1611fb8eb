package graft

import graft.table.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Exact-substring (repeated token-window) dedup: semantics pinned against a
  * brute-force in-memory reference, plus the winnowing detection guarantee
  * and the bounded-memory mega-repeat shape. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: token (d, i) removed iff covered by a repeated
    * window occurrence that is NOT the corpus-first ((doc, pos)-min)
    * occurrence of its content, and not covered by any repeated window's
    * first occurrence (the exemption that keeps one copy of everything). */
  private def bruteForce(docs: Seq[(Long, Seq[Int])], L: Int): Map[Long, (Seq[Int], Int)] = {
    val occ = for {
      (id, toks) <- docs
      p <- 0 to toks.length - L
    } yield (toks.slice(p, p + L), id, p)
    val groups = occ.groupBy(_._1)
    val firstOf = groups.map { case (w, os) => (w, os.map(o => (o._2, o._3)).min) }
    val repeated = groups.filter(_._2.size > 1).keySet
    docs.map { case (id, toks) =>
      def cover(pred: Int => Boolean): Set[Int] = (for {
        p <- 0 to toks.length - L
        if repeated(toks.slice(p, p + L)) && pred(p)
        j <- p until p + L
      } yield j).toSet
      val loserCov = cover(p => firstOf(toks.slice(p, p + L)) != ((id, p)))
      val winCov = cover(p => firstOf(toks.slice(p, p + L)) == ((id, p)))
      val removedPos = loserCov -- winCov
      val clean = toks.zipWithIndex.collect { case (t, i) if !removedPos(i) => t }
      (id, (clean, toks.length - clean.length))
    }.toMap
  }

  private val docs: Seq[(Long, Seq[Int])] = Seq(
    (0L, Seq(1, 2, 3, 4, 5, 6, 7, 8)),          // source of the shared span
    (1L, Seq(9, 1, 2, 3, 4, 5, 10, 11)),        // contains 1..5 (one window)
    (2L, Seq(1, 2, 3, 4, 5, 6, 20, 1, 2, 3, 4, 5, 6, 21)), // cross-doc + overlap
    (3L, Seq(7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7)), // within-doc repetition
    (4L, Seq(30, 31, 32)),                        // shorter than L: untouched
    (5L, Seq.empty[Int]))                         // empty doc survives

  test("dropRepeatedSpans matches the brute-force reference") {
    val L = 5
    val df = docs.toDF("id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = Dedup.dropRepeatedSpans(df, "id", "tokens", winLen = L)
      .collect().map(r => (r.getLong(0), (r.getSeq[Int](1), r.getInt(2)))).toMap
    val ref = bruteForce(docs, L)
    assert(out.keySet == ref.keySet)
    for ((id, (clean, nRem)) <- ref) {
      assert(out(id)._1 == clean, s"clean_tokens mismatch for doc $id")
      assert(out(id)._2 == nRem, s"n_removed mismatch for doc $id")
    }
    // the rule is load-bearing: doc 0 keeps everything (first occurrence),
    // doc 3's self-repetition collapses to the first L tokens (the winner
    // exemption keeps one window's worth, never eroding below L)
    assert(ref(0L)._2 == 0 && out(0L)._2 == 0)
    assert(out(3L)._1 == Seq(7, 7, 7, 7, 7) && out(3L)._2 == 7)
    assert(out(4L)._2 == 0 && out(5L)._2 == 0)
  }

  test("windowHashes: rolling equals direct polynomial; empty below L") {
    val toks = Seq(5, 0, -3, 1000000, 42, 7)
    val L = 3
    val df = Seq(Tuple1(toks)).toDF("tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val hs = df.select(graft.expr.SpanExprs.windowHashes(col("tokens"), L))
      .head.getSeq[Long](0)
    val direct = (0 to toks.length - L).map { p =>
      toks.slice(p, p + L).foldLeft(0L)((h, t) => h * graft.expr.SpanUtil.B + t)
    }
    assert(hs == direct)
    val short = Seq(Tuple1(Seq(1, 2))).toDF("tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
      .select(graft.expr.SpanExprs.windowHashes(col("tokens"), L))
      .head.getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("winnowing: repeated span of length >= L + w - 1 always shares an anchor") {
    val L = 4; val w = 3
    val rng = new scala.util.Random(7)
    // a 20-token shared span (>= L + w - 1 = 6) planted at DIFFERENT offsets
    // in two otherwise-random docs — alignment must not matter
    val span = Seq.fill(20)(rng.nextInt(1000) + 2000)
    val mk = (pre: Int, post: Int) =>
      Seq.fill(pre)(rng.nextInt(1000)) ++ span ++ Seq.fill(post)(rng.nextInt(1000))
    val df = Seq((0L, mk(3, 9)), (1L, mk(11, 2))).toDF("id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val hits = Dedup.winnowedRepeatAnchors(df, "id", "tokens", winLen = L, winnowW = w)
    // the later occurrence (doc 1, larger (id,pos)) must be flagged
    assert(hits.filter(col("id") === 1L).count() >= 1)
    // density: selected anchors ~ 2/(w+1) of positions, not all of them
    val nAnchors = df.select(explode(
      graft.expr.SpanExprs.winnowedAnchors(col("tokens"), L, w))).count()
    val nPositions = df.select(explode(
      graft.expr.SpanExprs.windowHashes(col("tokens"), L))).count()
    assert(nAnchors < nPositions, "winnowing must emit fewer fingerprints than positions")
  }

  test("output plan: token payload never shuffles (starts relation broadcasts)") {
    // the 100 TB property: below broadcastRemovalMax the clean output is a
    // broadcast-joined codegen'd projection over the UNSHUFFLED corpus —
    // zero ShuffleExchange in the final plan
    val df = docs.toDF("id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = Dedup.dropRepeatedSpans(df, "id", "tokens", winLen = 5)
    assert(graft.snapshot.BucketedTables.shuffleExchangeCount(out) === 0,
      "final span-dedup plan must not shuffle the token payload")
  }

  test("mega-repeat: one window repeated across every doc stays bounded and exact") {
    // 2,000 docs all containing the same 6-token boilerplate — the hot-hash
    // group holds 2,000 (id, pos) entries but only count/min aggregate over
    // it (no collect_list), so memory stays O(1) per group
    val boiler = Seq(100, 101, 102, 103, 104, 105)
    val rows = (0L until 2000L).map(i => (i, Seq(i.toInt + 5000) ++ boiler ++ Seq(i.toInt + 9000)))
    val df = rows.toDF("id", "tokens")
      .withColumn("tokens", col("tokens").cast("array<int>"))
    val out = Dedup.dropRepeatedSpans(df, "id", "tokens", winLen = 6)
    val removed = out.agg(sum("n_removed")).head.getLong(0)
    // every doc after the first loses exactly the 6 boilerplate tokens
    assert(removed == 1999L * 6)
    assert(out.filter(col("id") === 0L).head.getInt(2) == 0)
  }
}
