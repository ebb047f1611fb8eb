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
}
