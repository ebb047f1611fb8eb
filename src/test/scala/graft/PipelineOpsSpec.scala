package graft

import graft.table.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** PII scan/redaction, Gopher/C4 quality flags, and semantic (embedding)
  * dedup clustering. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiScan counts each category; piiRedact replaces every occurrence") {
    val df = Seq(
      (1L, "reach me at alice@example.com or bob@test.org thanks"),
      (2L, "card 1234-5678-9012-3456 ssn 123-45-6789"),
      (3L, "call 555-867-5309 or 555.867.5310 from 10.0.0.1"),
      (4L, "perfectly clean prose with no identifiers at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(df, "text")
      .select("doc_id", "email_hits", "card_hits", "ssn_hits", "phone_hits",
        "ipv4_hits", "pii_total", "has_pii")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(out(1L) === Seq(2L, 0L, 0L, 0L, 0L, 2L, true))
    assert(out(2L) === Seq(0L, 1L, 1L, 0L, 0L, 2L, true))
    assert(out(3L) === Seq(0L, 0L, 0L, 2L, 1L, 3L, true))
    assert(out(4L) === Seq(0L, 0L, 0L, 0L, 0L, 0L, false))

    val red = df.select(col("doc_id"), TextAnalysis.piiRedact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "reach me at <EMAIL> or <EMAIL> thanks")
    assert(red(2L) === "card <CARD> ssn <SSN>")
    assert(red(3L) === "call <PHONE> or <PHONE> from <IPV4>")
    assert(red(4L) === "perfectly clean prose with no identifiers at all")
  }

  test("piiRedact: card is consumed whole, not as partial phone/ssn matches") {
    val df = Seq((1L, "pay 1234 5678 9012 3456 now")).toDF("doc_id", "text")
    val r = df.select(TextAnalysis.piiRedact(col("text"))).collect()(0).getString(0)
    assert(r === "pay <CARD> now")
  }

  test("gopherQualityFlags: each rule flips keep independently") {
    val longGood = (("the of and " * 20) + ("word " * 40)).trim // 100 words, stopwords present
    val tooShort = "the of and word word"                        // 5 words
    val noStops = ("word " * 60).trim                            // no stopword evidence
    val longWords = (("extraordinarily " * 50) + "the of").trim  // 52 words, mean len > 10
    val df = Seq((1L, longGood), (2L, tooShort), (3L, noStops), (4L, longWords))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFlags(df, "text")
      .select("doc_id", "ok_word_count", "ok_mean_word_len", "ok_stopwords",
        "ok_symbol_ratio", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(out(1L) === ((true, true, true, true, true)))
    assert(out(2L)._1 === false); assert(out(2L)._5 === false)
    assert(out(3L)._3 === false); assert(out(3L)._5 === false)
    assert(out(4L)._2 === false); assert(out(4L)._5 === false)
  }

  test("semanticDedupClusters: transitive cosine chains collapse to min id") {
    // 1 ~ 2 and 2 ~ 3 (cosine ≈ 0.97/0.97) but 1·3 ≈ 0.89 < threshold —
    // the cluster still collapses transitively; 4 is orthogonal
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.97f, 0.24f, 0.0f)),
      (3L, Seq(0.88f, 0.47f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupClusters(df, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }
}
