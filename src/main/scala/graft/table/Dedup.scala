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
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.table.Dedup")

  /** Deterministic 3-gram shingles of a token array, as longs:
    * s_i = t_i·2^24 + t_{i+1}·2^12 + t_{i+2} (collision-free for vocab ≤ 4096).
    * Native codegen'd Catalyst expression (graft.expr.Shingles3) — the HOF
    * formulation was CodegenFallback and dominated every dedup query. */
  def shingles3(tokens: Column): Column = graft.expr.ShingleExprs.shingles3(tokens)

  /** Hashes with more than one row — the (tiny) exact-dup candidate key set.
    * Only (hash, count) pairs shuffle, with map-side combine; the content
    * column never enters this aggregation. */
  private def dupHashes(df: DataFrame, contentCol: String): DataFrame =
    df.select(xxhash64(col(contentCol)).as("_h"))
      .groupBy("_h").agg(count(lit(1)).as("_hc")).filter(col("_hc") > 1)
      .select("_h")

  /** Exact duplicates by full content: returns groups (content key, ids).
    *
    * Two-phase so the corpus payload never shuffles: (1) aggregate 64-bit
    * content-hash counts (map-side combined — shuffles only (hash, count));
    * (2) the rows whose hash collides (a ~dup-rate fraction of the input)
    * semi-join the broadcast hot-hash list and confirm by exact content
    * grouping — hash collisions between distinct contents fall out at the
    * final `dup_count > 1` filter. */
  def exactDuplicates(df: DataFrame, idCol: String, contentCol: String,
                      maxIds: Int = 10000): DataFrame = {
    // no forced broadcast of the hot-hash list: its size is O(n·dup_rate)
    // and unbounded at web scale — AQE broadcasts it when small and falls
    // back to a (graceful) shuffled semi-join when it is not
    val candidates = df
      .withColumn("_h", xxhash64(col(contentCol)))
      .join(dupHashes(df, contentCol), Seq("_h"), "left_semi")
    // dup_count is EXACT; ids is the full group up to `maxIds` members and a
    // bounded sample beyond (a degenerate mega-group — millions of identical
    // docs — must not materialize one multi-million-element agg buffer)
    candidates.groupBy(col(contentCol))
      .agg(count(lit(1)).as("dup_count"),
        sort_array(slice(graft.expr.CappedCollectList(col(idCol), maxIds),
          1, maxIds)).as("ids"))
      .filter(col("dup_count") > 1)
  }

  /** Exact-dedup keep-first: drop all but the min-id row per content group.
    * Rows whose content hash is unique (the overwhelming majority) pass
    * through without any payload shuffle; only hash-colliding rows shuffle —
    * on (hash, content) — for the keep-first window. */
  def dropExactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    // like exactDuplicates: the hot-hash list is O(n·dup_rate), so the join
    // strategy is left to AQE rather than a forced (unbounded) broadcast
    val hot = dupHashes(df, contentCol)
    val withH = df.withColumn("_h", xxhash64(col(contentCol)))
    val uniques = withH.join(hot, Seq("_h"), "left_anti")
    val w = Window.partitionBy(col("_h"), col(contentCol)).orderBy(col(idCol))
    val keepers = withH.join(hot, Seq("_h"), "left_semi")
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    uniques.unionByName(keepers).drop("_h")
  }

  /** N-gram Jaccard similar pairs: explode distinct shingles, self-join on
    * shingle (hot shingles capped at `maxDocFreq` docs), count shared, then
    * |A∪B| = |A|+|B|-shared. Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def jaccardPairs(df: DataFrame, idCol: String, tokensCol: String,
                   minJaccard: Double, maxDocFreq: Int = 1000): DataFrame = {
    // nondeterministic no-op guard: stops CollapseProject from substituting
    // the (interpreted HOF) shingle construction into every downstream
    // reference — `n_sh = size(sh)` and the explode must read the SAME
    // materialized array, not rebuild it (measured 2× cost without this).
    val sh = df.select(col(idCol).as("id"),
        when(spark_partition_id() >= 0, shingles3(col(tokensCol))).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    // The expensive part is shingle CONSTRUCTION (interpreted HOFs over the
    // token array) — it must run in exactly ONE scan. A self-join on the
    // exploded table would recompute it per join side (and a groupBy
    // frequency pass a third time), so instead: group the single exploded
    // pass into per-shingle posting lists, drop hot shingles (posting list >
    // maxDocFreq — stop-shingles whose pair fan-out is O(F²), the standard
    // web-scale guard), and generate co-occurring pairs INSIDE each list.
    // The wide exchanges carry only (shingle, id) and (id_a, id_b).
    // (id, n_sh) rides along into the posting lists so nothing ever needs to
    // re-derive shingles for the per-doc set sizes.
    // CappedCollectList bounds each posting buffer at maxDocFreq+1 slots —
    // a stop-shingle at web scale costs O(cap) memory, not O(doc_freq),
    // before the size filter drops it
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val postings = exploded.groupBy("s")
      .agg(sort_array(graft.expr.CappedCollectList(
        struct(col("id"), col("n_sh")), maxDocFreq)).as("ids"))
      .filter(size(col("ids")).between(2, maxDocFreq))
    // ordered pairs within each posting list: (ids[i], ids[j]) for i < j —
    // native codegen'd expression (graft.expr.PostingPairs)
    val pairs = postings
      .select(explode(graft.expr.ShingleExprs.postingPairs(col("ids"))).as("p"))
      .select(col("p.*"))
    pairs.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"), first("n_a").as("n_a"), first("n_b").as("n_b"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Sub-document (partial-overlap) near-dup pairs by the OVERLAP COEFFICIENT
    * |A∩B| / min(|A|, |B|): a boilerplate header pasted into a long page, or a
    * doc fully contained in another, scores ~1.0 here while its Jaccard stays
    * low — the complementary metric to [[jaccardPairs]] for training-data
    * dedup. Identical plan shape (one shingle scan → capped posting lists →
    * in-list pair generation); only the final scoring expression differs. */
  def containmentPairs(df: DataFrame, idCol: String, tokensCol: String,
                       minOverlap: Double, maxDocFreq: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        when(spark_partition_id() >= 0, shingles3(col(tokensCol))).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val postings = exploded.groupBy("s")
      .agg(sort_array(graft.expr.CappedCollectList(
        struct(col("id"), col("n_sh")), maxDocFreq)).as("ids"))
      .filter(size(col("ids")).between(2, maxDocFreq))
    val pairs = postings
      .select(explode(graft.expr.ShingleExprs.postingPairs(col("ids"))).as("p"))
      .select(col("p.*"))
    pairs.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"), first("n_a").as("n_a"), first("n_b").as("n_b"))
      .withColumn("overlap", col("shared").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("overlap") >= minOverlap)
      .select("id_a", "id_b", "overlap")
  }

  /** End-to-end fuzzy dedup — the full pipeline stage a training-data run
    * actually executes: MinHash-LSH near-dup PAIRS → connected-component
    * clustering ([[Components.connectedComponents]], so A~B, B~C collapse
    * transitively even when A~C was never a candidate) → one cluster label
    * per row. Returns every input id with its cluster `component` (= min id
    * in the cluster; singletons label themselves). Rows where
    * `component = id` are the canonical keepers. Scale shape: the pair
    * generation is the capped banded-LSH plan of [[minhashLshPairs]]; the
    * clustering is O(log² n) rounds of canonical-edge shuffles over the
    * (pair-count-sized, ≪ corpus) edge list. */
  def fuzzyDedupClusters(df: DataFrame, idCol: String, tokensCol: String,
                         minJaccard: Double, k: Int = 16, bands: Int = 4,
                         seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, tokensCol, minJaccard, k, bands, seed, maxBucket)
    val cc = Components.connectedComponents(pairs, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(cc, col("id") === col("node"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Keep-one-per-cluster fuzzy dedup: survivors of [[fuzzyDedupClusters]]
    * (the min-id representative of every near-dup cluster plus all
    * singletons), with original columns intact. */
  def dropFuzzyDuplicates(df: DataFrame, idCol: String, tokensCol: String,
                          minJaccard: Double, k: Int = 16, bands: Int = 4,
                          seed: Long = 42L, maxBucket: Int = 1000): DataFrame =
    Components.dedupByPairs(df, idCol,
      minhashLshPairs(df, idCol, tokensCol, minJaccard, k, bands, seed, maxBucket),
      "id_a", "id_b")

  /** Deterministic MinHash coefficients — seeded LCG so the oracle SQL embeds
    * the identical constants. */
  def minhashCoeffs(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x % (P - 1)) + 1 }
    Seq.fill(k)((next(), next()))
  }

  /** Full MinHash signature as ONE array column, computed in a single pass
    * over the shingle set: acc_j ← min(acc_j, (a_j·(s mod P) + b_j) mod P).
    * Native codegen'd expression (graft.expr.MinHashSignature) — K separate
    * `array_min(transform(shingles…))` trees rebuilt the shingle set K times
    * in interpreted HOF eval, the round-1 hot spot. */
  def minhashSignature(tokens: Column, coeffs: Seq[(Long, Long)]): Column =
    graft.expr.ShingleExprs.minhashSignature(shingles3(tokens), coeffs)

  /** MinHash-LSH candidate pairs: K=16 hashes in 4 bands of 4; docs sharing
    * any band bucket become candidates; exact Jaccard verifies. The band join
    * shuffles only (band_idx, band_key, id) triples. */
  /** Distinct ordered candidate pairs from per-bucket posting lists, hot
    * buckets (> maxBucket members) dropped — shared by every banded-LSH
    * operator here. Input: (bucketCol, "id"). */
  private def lshCandidatePairs(buckets: DataFrame, bucketCol: String,
                                maxBucket: Int): DataFrame =
    buckets.groupBy(bucketCol)
      .agg(sort_array(graft.expr.CappedCollectList(
        struct(col("id").as("id"), lit(0).as("n")), maxBucket)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(graft.expr.ShingleExprs.postingPairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()

  def minhashLshPairs(df: DataFrame, idCol: String, tokensCol: String,
                      minJaccard: Double, k: Int = 16, bands: Int = 4,
                      seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val coeffs = minhashCoeffs(k, seed)
    val r = k / bands
    val withSig = df
      .select(col(idCol).as("id"), col(tokensCol).as("tokens"))
      .filter(size(col(tokensCol)) > 2)
      .select(col("id"), minhashSignature(col("tokens"), coeffs).as("sig"))
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        concat_ws("_", (0 until r).map(j =>
          element_at(col("sig"), bi * r + j + 1).cast("string")): _*).as("key"))
    }
    // candidate generation moves ONLY (band, key, id) triples — token arrays
    // never enter a shuffle key — and pairs up INSIDE per-bucket posting
    // lists, with hot buckets capped (`maxBucket`): an uncapped bucket of F
    // docs contributes O(F²) pairs of mostly-dissimilar docs, the classic
    // banded-LSH blowup at web scale. Payload joins back once, for the
    // (rare) surviving candidates.
    val buckets = withSig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
    val cand = lshCandidatePairs(buckets, "bk", maxBucket)
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

  /** Per-doc MinHash signatures as a persistable (id, sig: array<long>)
    * table — the corpus-side state an append-only dedup pipeline stores so
    * tomorrow's increment never recomputes today's shingles (a signature row
    * is K longs vs the document's whole token array). */
  def minhashSignatures(df: DataFrame, idCol: String, tokensCol: String,
                        k: Int = 16, seed: Long = 42L): DataFrame =
    df.select(col(idCol).as("id"), col(tokensCol).as("tokens"))
      .filter(size(col("tokens")) > 2)
      .select(col("id"), minhashSignature(col("tokens"), minhashCoeffs(k, seed)).as("sig"))

  /** Incremental MinHash-LSH near-dup pairs for append-only corpora: verified
    * pairs that involve at least one FRESH doc — fresh×fresh and fresh×prior.
    * prior×prior pairs were found when the prior batches were ingested, so a
    * daily increment pays the increment's share of the work, not a corpus
    * rescan:
    *  - prior signatures come from the persisted [[minhashSignatures]] table
    *    when supplied (`priorSigs`) — the prior corpus' token arrays are then
    *    never read for candidate generation, only for verifying the (rare)
    *    surviving candidate pairs;
    *  - in-bucket pair generation carries a fresh/prior flag in the posting
    *    struct and drops prior-only pairs BEFORE the distinct shuffle;
    *  - hot buckets are capped as in [[minhashLshPairs]].
    * Same band/bucket geometry as [[minhashLshPairs]]: running it on
    * (prior ∪ fresh) and filtering to fresh-involving pairs yields the
    * identical result (the oracle replays exactly that). */
  def incrementalLshPairs(prior: DataFrame, fresh: DataFrame, idCol: String,
                          tokensCol: String, minJaccard: Double, k: Int = 16,
                          bands: Int = 4, seed: Long = 42L, maxBucket: Int = 1000,
                          priorSigs: Option[DataFrame] = None): DataFrame = {
    val r = k / bands
    val pSigs = priorSigs.getOrElse(minhashSignatures(prior, idCol, tokensCol, k, seed))
      .select(col("id"), col("sig"), lit(0).as("f"))
    val fSigs = minhashSignatures(fresh, idCol, tokensCol, k, seed)
      .select(col("id"), col("sig"), lit(1).as("f"))
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        concat_ws("_", (0 until r).map(j =>
          element_at(col("sig"), bi * r + j + 1).cast("string")): _*).as("key"))
    }
    val buckets = pSigs.unionByName(fSigs)
      .select(col("id"), col("f"), explode(array(bandCols: _*)).as("bk"))
    // the posting struct's second slot carries the fresh flag; n_a + n_b = 0
    // (a prior×prior pair) is dropped in-list, before the distinct exchange
    val cand = buckets.groupBy("bk")
      .agg(sort_array(graft.expr.CappedCollectList(
        struct(col("id"), col("f").as("n")), maxBucket)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(graft.expr.ShingleExprs.postingPairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), (col("p.n_a") + col("p.n_b")).as("_fr"))
      .filter(col("_fr") > 0)
      .select("id_a", "id_b").distinct()
    val toks = prior.unionByName(fresh)
      .select(col(idCol).as("id"), col(tokensCol).as("tokens"))
      .filter(size(col(tokensCol)) > 2)
    val withToks = cand
      .join(toks.select(col("id").as("id_a"), col("tokens").as("t_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("tokens").as("t_b")), Seq("id_b"))
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
    * Native codegen'd expression (graft.expr.SimHash32) — the Column form
    * built 32 separate interpreted folds, each rebuilding the hash array. */
  def simhash32(tokens: Column, seed: Long = 42L): Column = {
    val Seq((a, b)) = minhashCoeffs(1, seed)
    graft.expr.ShingleExprs.simhash32(tokens, a, b)
  }

  /** SimHash near-dup candidates: equal signatures (exact). */
  def simhashDuplicates(df: DataFrame, idCol: String, tokensCol: String,
                        seed: Long = 42L, maxIds: Int = 10000): DataFrame =
    df.select(col(idCol).as("id"), simhash32(col(tokensCol), seed).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("dup_count"),
        // exact count; id list bounded at maxIds (sample beyond — see
        // exactDuplicates) so a mega-group cannot blow one agg buffer
        sort_array(slice(graft.expr.CappedCollectList(col("id"), maxIds),
          1, maxIds)).as("ids"))
      .filter(col("dup_count") > 1)

  /** SimHash near-duplicates within hamming distance `maxHamming`: band the
    * 32-bit signature into (maxHamming+1) chunks — by pigeonhole, any pair
    * within distance d agrees exactly on at least one chunk — join per chunk,
    * then verify bit_count(sig_a XOR sig_b) ≤ d exactly. The band join
    * carries only (band, chunk-key, id, 8-byte sig); candidate fan-out is
    * bounded by the per-bucket density like every banded-LSH operator here. */
  def simhashNearDups(df: DataFrame, idCol: String, tokensCol: String,
                      maxHamming: Int = 3, seed: Long = 42L,
                      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming in [0, 32)")
    val bands = maxHamming + 1
    val bandBits = 32 / bands
    val sigs = df.select(col(idCol).as("id"), simhash32(col(tokensCol), seed).as("sig"))
    val bandCols = (0 until bands).map { b =>
      val lo = b * bandBits
      val width = if (b == bands - 1) 32 - lo else bandBits
      struct(lit(b).as("b"),
        shiftrightunsigned(col("sig"), lo).bitwiseAND(lit((1L << width) - 1)).as("key"))
    }
    // per-bucket posting lists (hot buckets capped) — the 8-byte signature
    // rides in the list's second slot so verification needs no join-back
    val buckets = sigs.select(col("id"), col("sig"), explode(array(bandCols: _*)).as("bk"))
    buckets.groupBy("bk")
      .agg(sort_array(graft.expr.CappedCollectList(
        struct(col("id"), col("sig")), maxBucket)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(graft.expr.ShingleExprs.postingPairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        col("p.n_a").as("sig_a"), col("p.n_b").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** (id, raw vector, L2 norm): the norm is computed ONCE per row and carried
    * as a scalar — normalizing the array in place would either rebuild the
    * norm aggregate per element (HOF lambda bodies re-evaluate their
    * subexpressions) or fight CollapseProject; cosine is dot/(n_a·n_b). */
  private def vecsWithNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.l2norm(col(vecCol)).as("n"))

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ threshold.
    * Delegates to the sign-LSH bucketed path unless the table is small enough
    * (`bruteForceMax`) that the exact O(n²) self-join is cheaper than
    * bucketing — brute force is the exactness baseline, LSH the scale path. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        minCosine: Double, bruteForceMax: Long = 10000L,
                        numPlanes: Int = 16, numTables: Int = 4,
                        seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    // auto-routing probes with limit(max+1).count() — an eager action, but it
    // reads at most bruteForceMax+1 rows (the limit short-circuits the scan),
    // never the full input. Callers that already know their scale should call
    // bruteForceNearDups / lshNearDups directly.
    require(bruteForceMax < Int.MaxValue, "bruteForceMax must fit an Int limit")
    val probe = df.select(col(idCol)).limit(bruteForceMax.toInt + 1).count()
    if (probe <= bruteForceMax) bruteForceNearDups(df, idCol, vecCol, minCosine)
    else {
      // surface the exact→approximate switch: LSH drops hot buckets and can
      // miss pairs, which must never be mistaken for the exact result.
      // numPlanes must keep 2^planes ≫ n/maxBucket or whole buckets exceed
      // the cap and are dropped wholesale (measured: 8 planes at 10^6
      // vectors = 256 buckets/table, EVERY bucket over the cap — recall
      // collapsed to ~0); the 16-plane default holds to ~10^7 rows per
      // table and larger corpora should raise it ~log2(n/1000)
      log.warn(
        s"embeddingNearDups: input exceeds bruteForceMax=$bruteForceMax rows; " +
          s"routing to APPROXIMATE sign-LSH (numPlanes=$numPlanes, hot buckets " +
          "capped). Call bruteForceNearDups explicitly if exact pairs are required.")
      lshNearDups(df, idCol, vecCol, minCosine, numPlanes, numTables, seed, maxBucket)
    }
  }

  /** Exact O(n²) near-dup pairs — small-n baseline ONLY (cartesian). */
  def bruteForceNearDups(df: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double): DataFrame = {
    val vn = vecsWithNorm(df, idCol, vecCol)
    val a = vn.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val b = vn.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** Sign-LSH bucketed near-dup pairs — the 100 TB shape: candidates pair up
    * only inside (table, bucket) cells, the candidate join carries ONLY
    * (table, bucket, id), and vectors join back once for the surviving pairs.
    * Approximate: recall is tuned by numPlanes (bucket granularity) and
    * numTables (independent chances to collide). */
  def lshNearDups(df: DataFrame, idCol: String, vecCol: String, minCosine: Double,
                  numPlanes: Int = 8, numTables: Int = 4, seed: Long = 42L,
                  maxBucket: Int = 1000): DataFrame = {
    val vn = vecsWithNorm(df, idCol, vecCol)
    val dim = Similarity.vecDim(df, vecCol)
    val tables = (0 until numTables).map { t =>
      struct(lit(t).as("t"),
        Similarity.lshBucket(col("v"), Similarity.hyperplaneSigns(numPlanes, dim, seed + 1000 * t)).as("b"))
    }
    // bucket-LOCAL verification (graft.expr.CosinePairs): each bucket's
    // O(B²) dot products run inside one codegen'd expression on co-located
    // (id, vector, norm) rows; only pairs meeting the threshold are emitted.
    // Nothing but survivors reaches a shuffle — no candidate-pair
    // materialization, no vector join-back (measured 380s → seconds at 10^6
    // vectors). Hot buckets (> maxBucket members, O(B²) mostly-dissimilar
    // work) are dropped, the standard banded-LSH guard.
    // the capped collect bounds a degenerate bucket (e.g. near-zero vectors
    // all signing to bucket 0) at maxBucket+1 VECTORS of buffer, not the
    // whole cluster's worth, before the size filter drops it
    val buckets = vn.select(
      struct(col("id"), col("v").cast("array<double>").as("v"), col("n")).as("m"),
      explode(array(tables: _*)).as("tb"))
    buckets.groupBy("tb")
      .agg(graft.expr.CappedCollectList(col("m"), maxBucket).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(explode(graft.expr.VectorExprs.cosinePairs(col("ms"), minCosine)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cosine"))
      .distinct() // the same surviving pair may emerge from several tables
  }

  /** End-to-end SEMANTIC dedup over an embedding column — the embedding-space
    * analogue of [[fuzzyDedupClusters]] (SemDeDup-style, Abbas et al. 2023):
    * cosine near-dup PAIRS → connected-component clustering → one cluster
    * label per row (component = min id; `component = id` marks the keepers).
    * Pair generation routes like [[embeddingNearDups]]: exact O(n²) under
    * `bruteForceMax` rows, bucketed sign-LSH above it — at 10^9 vectors the
    * LSH path's candidate shuffles carry only (table, bucket, id) triples and
    * the clustering runs over the (pair-count-sized, ≪ corpus) edge list. */
  def semanticDedupClusters(df: DataFrame, idCol: String, vecCol: String,
                            minCosine: Double,
                            bruteForceMax: Long = 10000L,
                            numPlanes: Int = 16, numTables: Int = 4,
                            seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val pairs = embeddingNearDups(df, idCol, vecCol, minCosine, bruteForceMax,
      numPlanes, numTables, seed, maxBucket)
    val cc = Components.connectedComponents(pairs, "id_a", "id_b")
    df.select(col(idCol).cast("long").as("id"))
      .join(cc, col("id") === col("node"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Corpus-level repeated-paragraph removal (RefinedWeb/CCNet-style line
    * dedup): every occurrence of a paragraph AFTER its first — first =
    * smallest (doc_id, position) across the whole corpus — is removed from
    * its document; paragraphs shorter than `minChars` (headings, blanks,
    * separators) are exempt and always kept. Sub-document granularity
    * catches the cross-page boilerplate (navigation bars, license footers,
    * cookie banners) that document-level dedup cannot.
    *
    * Input: (idCol: numeric doc id, parasCol: array<string> — the document
    * pre-split into paragraphs/lines/segments by the caller's rule).
    * Output: one row per input doc —
    * (id, clean_paras: array<string> in original order, n_paras, n_removed).
    *
    * Scale shape (10^12 docs):
    *  1. the first-occurrence winner per paragraph group is decided on a
    *     KEY-ONLY projection — (xxhash64(para), id, pos) triples shuffle
    *     with map-side combine; paragraph text never enters this exchange;
    *  2. the removal set (occurrences ≠ winner) is diff-sized; it probes
    *     with limit(max+1).count and broadcast-anti-joins back against the
    *     unshuffled exploded table in the common case (zero text shuffle),
    *     falling back to a shuffled anti-join when removals are huge;
    *  3. reassembly shuffles kept text once on the doc id — output-sized
    *     and unavoidable (the result IS the regrouped document).
    * Hash collisions: two distinct paragraphs colliding on xxhash64 would
    * share a winner; at 64 bits the corpus-level collision odds stay
    * negligible past 10^9 distinct paragraphs (standard content-hash dedup
    * trade, same as [[exactDuplicates]] phase 1). */
  def dropRepeatedParagraphs(df: DataFrame, idCol: String, parasCol: String,
                             minChars: Int = 1,
                             broadcastRemovalMax: Int = 4000000): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"),
      posexplode(col(parasCol)).as(Seq("_pos", "_para")))
    // phase 1: winners per paragraph hash, key-only
    val occ = exploded.filter(length(col("_para")) >= minChars)
      .select(xxhash64(col("_para")).as("_k"), col("_id"), col("_pos"))
    val winners = occ.groupBy("_k")
      .agg(min(struct(col("_id"), col("_pos"))).as("_w"), count(lit(1)).as("_c"))
      .filter(col("_c") > 1)
    // phase 2: losing occurrences = the removal set (still key-only)
    val removals = occ.join(winners, Seq("_k"))
      .filter(struct(col("_id"), col("_pos")) =!= col("_w"))
      .select("_id", "_pos")
    // the removal set is diff-sized: collect it ONCE (capped) and join the
    // exploded corpus against the local relation — a broadcast(removals)
    // after a count probe would evaluate the winners subtree twice
    val removalRows = removals.limit(broadcastRemovalMax + 1).collect()
    val kept =
      if (removalRows.length <= broadcastRemovalMax) {
        val local = df.sparkSession.createDataFrame(
          java.util.Arrays.asList(removalRows: _*), removals.schema)
        exploded.join(broadcast(local), Seq("_id", "_pos"), "left_anti")
      } else {
        log.warn(s"dropRepeatedParagraphs: > $broadcastRemovalMax removals; " +
          "falling back to shuffled anti-join of the exploded corpus")
        exploded.join(removals, Seq("_id", "_pos"), "left_anti")
      }
    // phase 3: reassemble in original order; docs whose every paragraph was
    // removed still appear (left join from the doc spine), with empty output
    val agg = kept.groupBy("_id").agg(
      transform(array_sort(collect_list(struct(col("_pos"), col("_para")))),
        x => x.getField("_para")).as("clean_paras"),
      count(lit(1)).as("_nk"))
    df.select(col(idCol).as("_id"), size(col(parasCol)).as("n_paras"))
      .join(agg, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("clean_paras"),
          array().cast("array<string>")).as("clean_paras"),
        col("n_paras"),
        (col("n_paras") - coalesce(col("_nk"), lit(0L))).cast("int").as("n_removed"))
  }

  /** Corpus-level EXACT-SUBSTRING dedup — the token-window form of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better", their
    * ExactSubstr): every token covered by a length-`winLen` window whose exact
    * content occurs EARLIER in the corpus is removed — UNLESS it is also
    * covered by the FIRST occurrence of some repeated window. "Earlier" =
    * smaller (doc id, position). The exemption guarantees every repeated
    * window's content survives at least once (at its corpus-first
    * occurrence): shared boilerplate is kept exactly once, and a periodic
    * self-repeat (aaaa…) collapses to one window's worth instead of eroding
    * its own first occurrence below winLen. Within-document repetition (the
    * same span later in one doc) is cut by the same rule — this operator
    * subsumes within-doc de-repetition. Adjacent/overlapping repeated
    * windows merge into one removed span, so a repeated region of any
    * length ≥ winLen is removed in full at its later occurrences.
    *
    * Output: one row per input doc — (id, clean_tokens: array<int> in
    * original order, n_removed: int).
    *
    * Scale shape (the reference point is Lee et al.'s single-machine suffix
    * array, which cannot shard):
    *  1. window fingerprints are a ROLLING hash (graft.expr.WindowHashes,
    *     codegen'd): a doc's n−L+1 windows cost O(n) total and no window
    *     content is ever materialized;
    *  2. the only corpus-scale shuffle carries (hash, id, pos) triples with
    *     map-side combine on the hash — ~20 B per token position, the
    *     distributed analogue of the suffix-array sort, and the token
    *     payload never enters it;
    *  3. the removal set (occurrences after the first) is diff-sized; it is
    *     grouped to per-doc sorted start arrays and broadcast-joined back,
    *     so clean output is produced by a zero-shuffle codegen'd projection
    *     (graft.expr.RemoveCoveredSpans) over the unshuffled corpus —
    *     falling back to a shuffled join only past `broadcastRemovalMax`;
    *  4. when even the (hash,id,pos) shuffle is too hot, use
    *     [[winnowedRepeatAnchors]] to cut it by ~2/(w+1) with a detection
    *     guarantee instead of exact removal.
    * Hash collisions: 64-bit content-hash trade as in [[exactDuplicates]]
    * phase 1 — two distinct windows colliding would share a winner;
    * negligible below ~10^9 distinct windows and caught by the oracle
    * compare at test scale (the oracle groups by actual window content). */
  def dropRepeatedSpans(df: DataFrame, idCol: String, tokensCol: String,
                        winLen: Int = 50,
                        broadcastRemovalMax: Int = 4000000): DataFrame = {
    val spark = df.sparkSession
    val exploded = df.select(col(idCol).as("_id"),
      posexplode(graft.expr.SpanExprs.windowHashes(col(tokensCol), winLen))
        .as(Seq("_pos", "_h")))
    // phase 1: first-occurrence winner per repeated window hash — key-only
    val winners = exploded.groupBy("_h")
      .agg(min(struct(col("_id"), col("_pos"))).as("_w"), count(lit(1)).as("_c"))
      .filter(col("_c") > 1)
    // phase 2: losing occurrences = removal window starts; winning
    // occurrences of the same repeated groups = exempt coverage. Both are
    // diff-sized and key-only ((id, pos) pairs)
    val occ = exploded.join(winners, Seq("_h"))
      .select(col("_id"), col("_pos"),
        (struct(col("_id"), col("_pos")) === col("_w")).as("_isWin"))
    // phase 3: group starts per doc. The repeated-occurrence set is
    // diff-sized: collect once (capped) and fold to sorted start arrays on
    // the driver — the common case joins a broadcast local relation, zero
    // corpus shuffle
    val occRows = occ.limit(broadcastRemovalMax + 1).collect()
    val idType = df.schema(idCol).dataType
    val intArray = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
    val startsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id", idType),
      org.apache.spark.sql.types.StructField("_lstarts", intArray),
      org.apache.spark.sql.types.StructField("_wstarts", intArray)))
    val starts =
      if (occRows.length <= broadcastRemovalMax) {
        val byDoc = occRows.groupBy(_.get(0)).map { case (id, rows) =>
          val (win, lose) = rows.partition(_.getBoolean(2))
          org.apache.spark.sql.Row(id,
            lose.map(_.getInt(1)).sorted.toSeq, win.map(_.getInt(1)).sorted.toSeq)
        }.toSeq
        broadcast(spark.createDataFrame(
          java.util.Arrays.asList(byDoc: _*), startsSchema))
      } else {
        log.warn(s"dropRepeatedSpans: > $broadcastRemovalMax repeated windows; " +
          "falling back to a shuffled starts join")
        occ.groupBy("_id").agg(
          sort_array(collect_list(when(!col("_isWin"), col("_pos")))).as("_lstarts"),
          sort_array(collect_list(when(col("_isWin"), col("_pos")))).as("_wstarts"))
      }
    val cut = graft.expr.SpanExprs.removeCoveredSpans(
      col(tokensCol),
      coalesce(col("_lstarts"), array().cast("array<int>")),
      coalesce(col("_wstarts"), array().cast("array<int>")), winLen)
    df.select(col(idCol).as("_id"), col(tokensCol))
      .join(starts, Seq("_id"), "left")
      .select(col("_id").as(idCol), cut.as("_cut"))
      .select(col(idCol), col("_cut.clean_tokens").as("clean_tokens"),
        col("_cut.n_removed").as("n_removed"))
  }

  /** Winnowed repeated-span DETECTION (Schleimer et al., SIGMOD 2003) — the
    * sub-linear-shuffle scale path for [[dropRepeatedSpans]]: each doc emits
    * only its winnowing-selected anchor fingerprints (expected density
    * 2/(w+1) of positions instead of every position), and any repeated span
    * of length ≥ winLen + winnowW − 1 is GUARANTEED to share at least one
    * anchor across its occurrences (selection is content-local, hence
    * self-synchronizing). Returns the non-first occurrences of repeated
    * anchors — (id, pos, h) rows marking where repeated content sits; feed
    * the flagged (doc, neighborhood) pairs to exact verification or use the
    * per-doc flag density as a boilerplate score. Detection-only by design:
    * removal at anchor granularity would under-cut spans (anchors are a
    * sample of the repeat), so exact removal stays with dropRepeatedSpans. */
  def winnowedRepeatAnchors(df: DataFrame, idCol: String, tokensCol: String,
                            winLen: Int = 50, winnowW: Int = 16): DataFrame = {
    val anchors = df.select(col(idCol).as("_id"),
      explode(graft.expr.SpanExprs.winnowedAnchors(col(tokensCol), winLen, winnowW))
        .as("_a"))
      .select(col("_id"), col("_a.pos").as("_pos"), col("_a.h").as("_h"))
    val winners = anchors.groupBy("_h")
      .agg(min(struct(col("_id"), col("_pos"))).as("_w"), count(lit(1)).as("_c"))
      .filter(col("_c") > 1)
    anchors.join(winners, Seq("_h"))
      .filter(struct(col("_id"), col("_pos")) =!= col("_w"))
      .select(col("_id").as(idCol), col("_pos").as("pos"), col("_h").as("anchor_hash"))
  }
}
