package graft

import graft.table.{Dedup, SnapshotDiff}
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    ("a", Seq(1, 2, 3), 3, "s0"),
    ("b", Seq(4, 5), 2, "s0"),
    ("c", Seq(6), 1, "s1"),
    ("d", Seq.empty[Int], 0, "s1"),
    ("e", null.asInstanceOf[Seq[Int]], 0, "s2")
  ).toDF("doc_id", "tokens", "n_tok", "source")

  test("snapshotDiff: added / removed / changed with per-column attribution") {
    val cur = Seq(
      ("a", Seq(1, 2, 3), 3, "s0"),      // identical — not emitted
      ("b", Seq(4, 99), 2, "s9"),        // tokens + source changed
      // c removed
      ("d", Seq.empty[Int], 0, "s1"),    // identical empty array — not emitted
      ("e", null.asInstanceOf[Seq[Int]], 0, "s2"), // identical null — not emitted
      ("f", Seq(7, 8), 2, "s1")          // added
    ).toDF("doc_id", "tokens", "n_tok", "source")
    val diff = SnapshotDiff.snapshotDiff(cur, base, "doc_id",
      Seq("tokens", "n_tok", "source"))
      .as[(String, String, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(diff.keySet == Set("b", "c", "f"))
    assert(diff("b") == (("changed", Seq("source", "tokens"))))
    assert(diff("c") == (("removed", Seq.empty[String])))
    assert(diff("f") == (("added", Seq.empty[String])))
  }

  test("snapshotDiff: null vs empty token array is a change (null-safe compare)") {
    val cur = base.withColumn("tokens",
      when(col("doc_id") === "d", lit(null).cast("array<int>"))
        .when(col("doc_id") === "e", array().cast("array<int>"))
        .otherwise(col("tokens")))
    val diff = SnapshotDiff.snapshotDiff(cur, base, "doc_id",
      Seq("tokens", "n_tok", "source"))
      .as[(String, String, Seq[String])].collect().map(r => r._1 -> r._2).toMap
    assert(diff == Map("d" -> "changed", "e" -> "changed"))
  }

  test("snapshotsEqual short-circuit verdict") {
    assert(SnapshotDiff.snapshotsEqual(base, base, "doc_id",
      Seq("tokens", "n_tok", "source")))
    assert(!SnapshotDiff.snapshotsEqual(base.filter($"doc_id" =!= "a"), base,
      "doc_id", Seq("tokens", "n_tok", "source")))
  }

  test("dropRepeatedParagraphs keeps first corpus-wide occurrence, exempts short") {
    val docs = Seq(
      (1L, Seq("the quick brown fox", "jumps over it", "xx")),
      (2L, Seq("the quick brown fox", "something new here", "xx")),
      (3L, Seq("jumps over it", "jumps over it", "the quick brown fox"))
    ).toDF("doc_id", "paras")
    val out = Dedup.dropRepeatedParagraphs(docs, "doc_id", "paras", minChars = 5)
      .as[(Long, Seq[String], Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 is first for both long paras; "xx" (< 5 chars) always kept
    assert(out(1L) == ((Seq("the quick brown fox", "jumps over it", "xx"), 3, 0)))
    assert(out(2L) == ((Seq("something new here", "xx"), 3, 1)))
    // doc 3: all three paras seen earlier (including its own second copy)
    assert(out(3L) == ((Seq.empty[String], 3, 3)))
  }

  test("dropRepeatedParagraphs within-doc repeats: first kept, later dropped") {
    val docs = Seq((7L, Seq("alpha beta gamma", "alpha beta gamma", "delta epsilon")))
      .toDF("doc_id", "paras")
    val out = Dedup.dropRepeatedParagraphs(docs, "doc_id", "paras", minChars = 5)
      .as[(Long, Seq[String], Int, Int)].collect().head
    assert(out == ((7L, Seq("alpha beta gamma", "delta epsilon"), 3, 1)))
  }

  test("schemaDiff reports added/removed/type-changed columns, zero jobs") {
    val cur = Seq((1L, "a", 2.0)).toDF("id", "name", "score")
    val old = Seq((1, "a", Seq(1))).toDF("id", "name", "tokens")
    val d = graft.table.SnapshotDiff.schemaDiff(cur, old)
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(d.keySet == Set("id", "score", "tokens"))
    assert(d("score") == (("added", "DOUBLE", null)))
    assert(d("tokens") == (("removed", null, "ARRAY<INT>")))
    assert(d("id") == (("type_changed", "BIGINT", "INT")))
    assert(graft.table.SnapshotDiff.schemaDiff(cur, cur).isEmpty)
  }

  test("dropRepeatedParagraphs is stable under repartitioning") {
    val docs = (0L until 200L).map(i =>
      (i, Seq(s"common boilerplate footer", s"unique paragraph number $i")))
      .toDF("doc_id", "paras")
    val a = Dedup.dropRepeatedParagraphs(docs, "doc_id", "paras", minChars = 5)
    val b = Dedup.dropRepeatedParagraphs(docs.repartition(13), "doc_id", "paras", minChars = 5)
    val am = a.as[(Long, Seq[String], Int, Int)].collect().map(r => r._1 -> r).toMap
    val bm = b.as[(Long, Seq[String], Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(am == bm)
    assert(am(0L)._2.contains("common boilerplate footer"))
    assert((1L until 200L).forall(i => am(i)._4 == 1))
  }
}
