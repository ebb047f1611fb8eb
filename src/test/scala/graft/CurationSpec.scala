package graft

import graft.table.Curation
import org.apache.spark.sql.functions._

/** End-to-end curation composite: stage order, monotone attrition, and
  * per-stage semantics on a corpus with one planted case per stage. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate: each stage drops exactly its planted case; report is monotone") {
    val goodText = ("the of and " * 12 + "alpha beta gamma delta " * 5).trim // 56 words
    val docs = Seq(
      (1L, goodText, "en"),                       // survives everything
      (2L, goodText, "en"),                       // exact duplicate of 1 → dropped at exact_dedup
      (3L, goodText + " extra", "en"),            // near-dup of 1 → dropped at fuzzy_dedup
      (4L, goodText, "fr"),                       // dropped at lang_filter
      (5L, "the of too short", "en"),             // dropped at quality_filter (4 words)
      (6L, ("the of and " * 10 + "unique seq one two three four five six " * 3).trim, "en"))
      .toDF("doc_id", "text", "lang")
    // benchmark shares doc 6's distinctive tail → 6 dropped at decontaminate
    val bench = Seq((100L, "unique seq one two three four five six", "en"))
      .toDF("doc_id", "text", "lang")

    val (curated, report) = Curation.curate(docs, "doc_id", "text", "lang", bench,
      keepLangs = Seq("en"), minWords = 20, minJaccard = 0.5, benchMinHits = 3)

    val counts = report.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(counts === Map("input" -> 6L, "lang_filter" -> 5L, "quality_filter" -> 4L,
      "exact_dedup" -> 3L, "fuzzy_dedup" -> 2L, "decontaminate" -> 1L))

    val out = curated.select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L))

    // report ordinals are the stage order and counts never increase
    val ordered = report.orderBy("ord").select("n_rows").as[Long].collect()
    assert(ordered.sameElements(ordered.sorted.reverse))
  }

  test("curate: redaction applies to the curated text without changing attrition") {
    val base = ("the of and contact bob@example.com now " * 8).trim // 48 words
    val docs = Seq((1L, base, "en")).toDF("doc_id", "text", "lang")
    val bench = Seq((9L, "zzz yyy xxx www vvv", "en")).toDF("doc_id", "text", "lang")
    val (curated, report) = Curation.curate(docs, "doc_id", "text", "lang", bench,
      keepLangs = Seq("en"), minWords = 20)
    assert(report.filter(col("stage") === "decontaminate")
      .select("n_rows").as[Long].collect()(0) === 1L)
    val txt = curated.select("text").as[String].collect()(0)
    assert(txt.contains("<EMAIL>") && !txt.contains("bob@example.com"))
  }

  test("curate: line dedup before dedup stages unmasks an exact duplicate") {
    // docs 1 and 2 differ ONLY in how often a boilerplate line repeats —
    // with in-doc line dedup enabled they collapse to the same cleaned text
    // and the exact-dedup stage drops one of them
    val body = ("the of and words enough for quality " * 6).trim
    val boiler = "subscribe to our newsletter today"
    val docs = Seq(
      (1L, s"$body\n$boiler", "en"),
      (2L, s"$body\n$boiler\n$boiler\n$boiler", "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq((9L, "zzz yyy xxx www vvv", "en")).toDF("doc_id", "text", "lang")

    val (plainOut, _) = Curation.curate(docs, "doc_id", "text", "lang", bench,
      keepLangs = Seq("en"), minWords = 20, minJaccard = 0.99)
    assert(plainOut.count() === 2) // texts differ → both survive exact dedup

    val (cleanOut, report) = Curation.curate(docs, "doc_id", "text", "lang", bench,
      keepLangs = Seq("en"), minWords = 20, minJaccard = 0.99,
      lineDedupMinLen = Some(10))
    assert(cleanOut.select("doc_id").as[Long].collect().toSet === Set(1L))
    assert(report.filter(col("stage") === "exact_dedup")
      .select("n_rows").as[Long].collect()(0) === 1L)
  }

  test("curate: DSIR selection stage keeps the target-like head") {
    val targetLike = ("the cat sat on the mat again and again and over " * 5).trim
    // off-target docs still need stopword evidence AND Gopher-passing word
    // shapes (mean word length >= 3) to reach the DSIR stage
    val offTarget = ("the number eleven of twenty the number thirty of forty " * 5).trim
    // per-doc salt with DISTINCT ascii tokens (first codepoint + length):
    // varying length makes each doc unique through tokenization, keeping the
    // groups apart at the fuzzy-dedup stage without collapsing within-group
    val docs = ((0 until 10).map(i =>
      (i.toLong, s"$targetLike ${"q" * (i + 1)} ${"r" * (i + 1)} ${"s" * (i + 1)}", "en")) ++
      (10 until 20).map(i =>
        (i.toLong, s"$offTarget ${"q" * (i - 9)} ${"r" * (i - 9)} ${"s" * (i - 9)}", "en")))
      .toDF("doc_id", "text", "lang")
    val bench = Seq((99L, "zzz yyy xxx www vvv", "en")).toDF("doc_id", "text", "lang")
    val target = Seq((100L, targetLike, "en")).toDF("doc_id", "text", "lang")

    val (out, report) = Curation.curate(docs, "doc_id", "text", "lang", bench,
      keepLangs = Seq("en"), minWords = 20, minJaccard = 0.99,
      dsirTarget = Some(target), dsirKeepFraction = 0.5)
    val kept = out.select("doc_id").as[Long].collect().toSet
    val stageCounts = report.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kept === (0L until 10L).toSet, s"kept $kept stages $stageCounts")
    assert(report.filter(col("stage") === "dsir_select")
      .select("n_rows").as[Long].collect()(0) === 10L)
  }
}
