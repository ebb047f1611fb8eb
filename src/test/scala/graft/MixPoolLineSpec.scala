package graft

import graft.table.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-3 additions: within-doc line dedup, temperature mixing, mean-pooled
  * embeddings — semantics + determinism. */
class MixPoolLineSpec extends SparkSpec {
  import spark.implicits._

  test("dedupDocLines keeps first occurrences, exempts short lines, preserves order") {
    val df = Seq((1L, Seq("the same long line!", "x", "the same long line!",
      "another distinct line", "x"))).toDF("id", "paras")
    val out = df.select(TextAnalysis.dedupDocLines(col("paras"), minLen = 10).as("c"))
      .as[Seq[String]].head()
    assert(out == Seq("the same long line!", "x", "another distinct line", "x"))
  }

  test("dedupDocLines counts length in code points") {
    // 9 two-byte chars: under a minLen of 10 only by the code-point measure
    val nine = "é" * 9
    val df = Seq((1L, Seq(nine, nine))).toDF("id", "paras")
    val out = df.select(TextAnalysis.dedupDocLines(col("paras"), minLen = 10).as("c"))
      .as[Seq[String]].head()
    assert(out == Seq(nine, nine)) // exempt: 9 code points < 10
  }

  test("mixWithTemperature: tau=1 keeps everything, high tau flattens the head") {
    val docs = (0 until 900).map { i =>
      val src = if (i < 600) "big" else if (i < 850) "mid" else "small"
      (i.toLong, src, 100L)
    }.toDF("id", "source", "w")
    val nat = Sampling.mixWithTemperature(docs, "source", "id", "w", tau = 1.0)
    assert(nat.count() == 900) // natural shares are already achievable
    val flat = Sampling.mixWithTemperature(docs, "source", "id", "w", tau = 100.0)
    val kept = flat.groupBy("source").count().as[(String, Long)].collect().toMap
    // near-uniform target: the smallest stratum is kept whole, heads downsampled
    assert(kept("small") == 50)
    assert(kept("big") < 100 && kept("mid") < 100)
    assert(math.abs(kept("big").toDouble - kept("mid").toDouble) < 20)
    // deterministic across repartitioning
    val flat2 = Sampling.mixWithTemperature(docs.repartition(7), "source", "id", "w", 100.0)
    assert(flat2.select("id").as[Long].collect().toSet ==
      flat.select("id").as[Long].collect().toSet)
  }

  test("wordChunks matches the HOF formulation exactly, including edge shapes") {
    val texts = Seq("a b c d e f g h i", "one two three four", "single", "",
      "x y", "a  b   c") // empty words from repeated spaces preserved
    val df = texts.toDF("text")
    val native = df.select(graft.expr.TextExprs.wordChunks(col("text"), 4).as("c"))
      .as[Seq[String]].collect().toSeq
    val words = split(col("text"), " ", -1)
    val nSeg = ((size(words) + 3) / 4).cast("int")
    val hof = df.select(transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(words, i * 4 + 1, lit(4)), " ")).as("c"))
      .as[Seq[String]].collect().toSeq
    assert(native == hof)
    assert(native.head == Seq("a b c d", "e f g h", "i"))
    assert(native(3) == Seq("")) // split of "" is [""] → one empty chunk
  }

  test("meanPoolQuantized matches a driver-side replay and ignores null vectors") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 5.0f)),
      (1, Seq(-1.0f, 0.5f))).toDF("label", "embedding")
    val out = Similarity.meanPoolQuantized(df, "label", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(2)), (r.getLong(1), r.getDouble(3)))).toMap
    assert(out((0, 1)) == ((2L, 2.0)) && out((0, 2)) == ((2L, 3.5)))
    assert(out((1, 1)) == ((1L, -1.0)) && out((1, 2)) == ((1L, 0.5)))
  }
}
