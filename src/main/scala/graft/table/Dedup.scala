package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, over the canonical
  * token-sequence table. All hashing is explicit deterministic arithmetic
  * (NOT engine hash functions) so results are engine-portable — the DuckDB
  * oracle reproduces them bit-for-bit.
  *
  * Scale design:
  *  - exact: one shuffle on the full content key, map-side combined.
  *  - n-gram Jaccard / MinHash-LSH: candidate generation only ever joins on
  *    shingle/band keys; hot shingles are capped (`maxDocFreq`) before the
  *    self-join — the standard guard against the quadratic blowup of
  *    stop-shingles at web scale.
  *  - SimHash: per-doc signature is a single projection; candidates pair up
  *    by signature band equality.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1

  /** Deterministic 3-gram shingles of a token array, as longs:
    * s_i = t_i·2^20 + t_{i+1}·2^10 + t_{i+2} (tokens < 4096 < 2^12 keep this
    * collision-free for vocab ≤ 1024; for 4096 use 2^24/2^12 spacing). */
  def shingles3(tokens: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(tokens) - 2, lit(0))),
      i => element_at(tokens, i).cast("long") * lit(16777216L) +
           element_at(tokens, i + 1).cast("long") * lit(4096L) +
           element_at(tokens, i + 2).cast("long")))

  /** Exact duplicates by full content: returns groups (content key, ids). */
  def exactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(count(lit(1)).as("dup_count"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("dup_count") > 1)

  /** Exact-dedup keep-first: drop all but the min-id row per content group —
    * shuffle on content hash only. */
  def dropExactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** N-gram Jaccard similar pairs: explode distinct shingles, self-join on
    * shingle (hot shingles capped at `maxDocFreq` docs), count shared, then
    * |A∪B| = |A|+|B|-shared. Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def jaccardPairs(df: DataFrame, idCol: String, tokensCol: String,
                   minJaccard: Double, maxDocFreq: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles3(col(tokensCol)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    // cap stop-shingles: a shingle in > maxDocFreq docs generates O(F²) pairs
    val freqOk = exploded.withColumn("_f", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("_f") <= maxDocFreq).drop("_f")
    val a = freqOk.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("s"))
    val b = freqOk.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("s"))
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"),
        first("n_a").as("n_a"), first("n_b").as("n_b"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic MinHash coefficients — seeded LCG so the oracle SQL embeds
    * the identical constants. */
  def minhashCoeffs(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x % (P - 1)) + 1 }
    Seq.fill(k)((next(), next()))
  }

  /** MinHash signature columns: minhash_j = min over shingles of (a_j·(s mod P) + b_j) mod P. */
  def minhashSignature(tokens: Column, coeffs: Seq[(Long, Long)]): Seq[Column] = {
    val sh = shingles3(tokens)
    coeffs.zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(sh, s => (pmod(s, lit(P)) * lit(a) + lit(b)) % lit(P)))
        .as(s"mh_$j")
    }
  }

  /** MinHash-LSH candidate pairs: K=16 hashes in 4 bands of 4; docs sharing
    * any band bucket become candidates; exact Jaccard verifies. The band join
    * shuffles only (band_idx, band_key, id) triples. */
  def minhashLshPairs(df: DataFrame, idCol: String, tokensCol: String,
                      minJaccard: Double, k: Int = 16, bands: Int = 4,
                      seed: Long = 42L): DataFrame = {
    val coeffs = minhashCoeffs(k, seed)
    val r = k / bands
    val withSig = df
      .select(col(idCol).as("id"), col(tokensCol).as("tokens"))
      .filter(size(col(tokensCol)) > 2)
      .select(col("id") +: col("tokens") +: minhashSignature(col("tokens"), coeffs): _*)
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        concat_ws("_", (0 until r).map(j => col(s"mh_${bi * r + j}")): _*).as("key"))
    }
    // the band join and the candidate-pair dedup move ONLY (band, key, id)
    // triples — token arrays never enter a shuffle key. Payload joins back
    // once, for the (rare) verified candidates.
    val buckets = withSig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
    val aSide = buckets.select(col("bk"), col("id").as("id_a"))
    val bSide = buckets.select(col("bk"), col("id").as("id_b"))
    val cand = aSide.join(bSide, Seq("bk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val toks = df.select(col(idCol).as("id"), col(tokensCol).as("tokens"))
      .filter(size(col(tokensCol)) > 2)
    val withToks = cand
      .join(toks.select(col("id").as("id_a"), col("tokens").as("t_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("tokens").as("t_b")), Seq("id_b"))
    // exact verification on the candidate set only
    val sa = array_distinct(shingles3(col("t_a")))
    val sb = array_distinct(shingles3(col("t_b")))
    withToks.withColumn("jaccard",
        size(array_intersect(sa, sb)).cast("double") /
        size(array_union(sa, sb)).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** 32-bit SimHash over token multiset: bit b of the signature is the sign
    * of Σ_tokens (bit b of h(t) ? +1 : -1), h(t) = (a·t + b) mod P.
    * Pure Column arithmetic — engine-portable. */
  def simhash32(tokens: Column, seed: Long = 42L): Column = {
    val Seq((a, b)) = minhashCoeffs(1, seed)
    val hashes = transform(tokens, t => (t.cast("long") * lit(a) + lit(b)) % lit(P))
    val bitSums = (0 until 32).map { bit =>
      // Σ (2·bit_b(h) - 1) > 0  → bit set
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftrightunsigned(h, bit) % 2) * 2 - 1)
      when(s > 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bitSums.reduce(_ + _)
  }

  /** SimHash near-dup candidates: equal signatures (exact) — for hamming ≤ d,
    * band the 32 bits into (d+1) chunks and join per chunk. */
  def simhashDuplicates(df: DataFrame, idCol: String, tokensCol: String,
                        seed: Long = 42L): DataFrame =
    df.select(col(idCol).as("id"), simhash32(col(tokensCol), seed).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("dup_count"),
        sort_array(collect_list(col("id"))).as("ids"))
      .filter(col("dup_count") > 1)

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ threshold.
    * Brute-force O(n²) within a self-join — the scale path buckets by
    * random-hyperplane LSH first (see Similarity.lshBuckets). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        minCosine: Double): DataFrame = {
    val norm = sqrt(aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val normalized = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double") / norm).as("v"))
    val a = normalized.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = normalized.select(col("id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", zip_with(col("v_a"), col("v_b"), (x, y) => x * y)
        .pipe(s => aggregate(s, lit(0.0d), (acc, x) => acc + x)))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  private implicit class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
