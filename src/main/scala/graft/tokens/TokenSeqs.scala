package graft.tokens

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical `(doc_id:string, tokens:array<int32>, n_tok:int32,
  * source:string)` table (BASELINE.json input_hint), obtained two ways:
  *
  *  1. [[fromDocuments]] — deterministically DERIVED from the driver-generated
  *     `documents` parquet, using only arithmetic both Spark and DuckDB
  *     express identically (the DuckDB oracle recomputes the same tokens).
  *     token(word) = ascii(first char)·32 + min(len(word),31) → vocab < 4096.
  *  2. [[synthesize]] — a seeded generator at arbitrary scale with a
  *     configurable injected-violation rate, for correctness tests and the
  *     throughput benchmark (BASELINE.md protocol). Generated distributed via
  *     `spark.range` — no driver-side materialization.
  */
object TokenSeqs {

  val VocabSize = 4096

  // token(word) = ascii(word)·32 + min(len(word), 31) — the canonical token
  // definition lives in ONE place, graft.expr.TextUtil.asciiTokens (mirrored
  // in the DuckDB oracle SQL as `ascii(w)*32 + least(length(w), 31)`).

  /** Derive the canonical table from the `documents` table. The tokenizer is
    * a native codegen'd expression (graft.expr.AsciiTokens) — the
    * transform-over-split HOF form ran interpreted in every derived query. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      graft.expr.TextExprs.asciiTokens(col("text")).as("tokens"),
      col("source"))
      .withColumn("n_tok", size(col("tokens")).cast("int"))
      .select("doc_id", "tokens", "n_tok", "source")

  /** Token sanitization — the pre-training guard on a pre-tokenized table:
    * ids outside [0, vocab) become `unkId`, and `n_oov` records how many were
    * clamped per row (alert on it; a nonzero rate means tokenizer/vocab
    * drift upstream). One zero-shuffle codegen'd projection
    * (graft.expr.SanitizeTokens/OovCount) — 100 TB in, 100 TB out. */
  def sanitize(df: DataFrame, tokensCol: String = "tokens",
               vocab: Int = VocabSize, unkId: Int = 0): DataFrame =
    df.withColumn("n_oov",
        graft.expr.TextExprs.oovCount(col(tokensCol), vocab))
      .withColumn(tokensCol,
        graft.expr.TextExprs.sanitizeTokens(col(tokensCol), vocab, unkId))

  /** Seeded synthetic generator (scales to any row count; fully distributed).
    *
    * Row i is derived from a SplitMix64-style avalanche of (seed, i) — pure
    * Column arithmetic, so generation itself is codegen'd and embarrassingly
    * parallel. ~`violationRate` of rows carry exactly one injected violation,
    * cycling through the violation mix of FIXTURES.md §1.
    */
  def synthesize(spark: SparkSession, rows: Long, seed: Long = 42L,
                 violationRate: Double = 0.01,
                 numPartitions: Int = 0): DataFrame = {
    val base = if (numPartitions > 0) spark.range(0, rows, 1, numPartitions)
               else spark.range(rows)

    // xxhash64 avalanche of (id, salt, seed) — codegen'd, ANSI-safe (no
    // checked-overflow multiplies), deterministic across partitionings.
    def mix(i: Column, salt: Int): Column = xxhash64(i, lit(salt), lit(seed))
    def mixPos(i: Column, salt: Int): Column = mix(i, salt).bitwiseAND(lit(Long.MaxValue))

    val id = col("id")
    // violation selector: 0 = clean; 1..7 = violation kinds
    val sel = when(pmod(mixPos(id, 1), lit(10000)) < lit((violationRate * 10000).toInt),
      pmod(mixPos(id, 2), lit(7)) + 1).otherwise(lit(0))

    // UUID-shaped doc_id from two hashes (hex formatted 8-4-4-4-12)
    val h1 = mixPos(id, 3)
    val h2 = mixPos(id, 4)
    val hex1 = lpad(hex(h1), 16, "0")
    val hex2 = lpad(hex(h2), 16, "0")
    val uuid = lower(concat(
      substring(hex1, 1, 8), lit("-"), substring(hex1, 9, 4), lit("-"),
      substring(hex1, 13, 4), lit("-"), substring(hex2, 1, 4), lit("-"),
      substring(hex2, 5, 12)))

    // 1..512 tokens per row. Native codegen'd generator (graft.expr.
    // SynthTokens, bit-identical to the HOF form — parity-pinned in
    // PropertySpec): the transform-over-sequence formulation evaluated one
    // interpreted xxhash64 tree per token.
    val tokens = graft.expr.TextExprs.synthTokens(id, seed, VocabSize)

    // Zipf-ish skew: 70% web, 15% books, 10% code, 5% wiki (skew-join test bed)
    val r = pmod(mixPos(id, 7), lit(100))
    val source = when(r < 70, lit("web")).when(r < 85, lit("books"))
      .when(r < 95, lit("code")).otherwise(lit("wiki"))

    val clean = base.select(
      uuid.as("doc_id"), tokens.as("tokens"),
      size(tokens).cast("int").as("n_tok"), source.as("source"), sel.as("_sel"), id)

    // violation injection (one per selected row; FIXTURES §1 mix)
    clean.select(
      when(col("_sel") === 1, lit(null).cast("string"))              // required
        .when(col("_sel") === 2, lit("not-a-uuid"))                  // format:uuid
        .when(col("_sel") === 3, concat(lit("dup-"),
          pmod(col("id"), lit(1000)).cast("string")))                // uniqueness
        .otherwise(col("doc_id")).as("doc_id"),
      when(col("_sel") === 4, concat(array(lit(-1)), col("tokens"))) // items minimum
        .when(col("_sel") === 5, slice(col("tokens"), 1, 0))         // minItems
        .otherwise(col("tokens")).as("tokens"),
      when(col("_sel") === 6, col("n_tok") + 7)                      // n_tok invariant
        .otherwise(when(col("_sel") === 4, col("n_tok") + 1)
          .when(col("_sel") === 5, lit(0)).otherwise(col("n_tok"))).cast("int").as("n_tok"),
      when(col("_sel") === 7, lit("reddit"))                         // RI / enum
        .otherwise(col("source")).as("source"))
  }

  /** The canonical constraint schema for this table (SURVEY §7.2). */
  def canonicalSchemaJson(vocabSize: Int = VocabSize, maxTokens: Int = 8192): String =
    s"""{
      "type": "object",
      "required": ["doc_id", "tokens", "n_tok", "source"],
      "properties": {
        "doc_id": {"type": "string", "format": "uuid"},
        "tokens": {
          "type": "array",
          "items": {"type": "integer", "minimum": 0, "maximum": ${vocabSize - 1}},
          "minItems": 1, "maxItems": $maxTokens
        },
        "n_tok": {"type": "integer", "minimum": 1, "maximum": $maxTokens},
        "source": {"enum": ["web", "books", "code", "wiki"]}
      }
    }"""
}
