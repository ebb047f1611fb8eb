package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for data-mixing pipelines. Unlike
  * `df.sample` (partition-order-dependent RNG), these key every keep/drop
  * decision on a content hash, so a sample is (a) reproducible run-to-run
  * and across engines — the DuckDB oracle takes the identical rows — and
  * (b) stable under repartitioning, speculative re-execution, and input
  * reordering, which is what a 1000-executor retry-heavy run actually needs.
  * md5 (not xxhash64) because both engines implement it identically.
  *
  * All decisions are per-row projections/filters — no shuffle at all for the
  * fractional forms; one per-stratum shuffle for the exact-k form. */
object Sampling {

  /** Uniform [0, 1e6) bucket from the md5 of `key` (first 8 hex digits). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 1000000L

  /** Keep ~`fraction` of rows, decided by the key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < (fraction * 1e6).toLong)

  /** Per-stratum fractions (data-mixing weights): strata not in `fractions`
    * use `default`. A plain codegen'd filter — nothing shuffles. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * 1e6).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * 1e6).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Down-sample to a TARGET MIXTURE of a weight column (data mixing): given
    * target shares per stratum — e.g. web 0.6 / code 0.2 / books 0.2 of total
    * TOKENS — compute the largest achievable total under those shares and the
    * per-stratum keep fractions that realize it, then apply the deterministic
    * stratified filter. The scarcest stratum (min avail_s/share_s) keeps
    * everything; stratum s keeps share_s·T/avail_s where T = min_s
    * avail_s/share_s; strata absent from `targetShares` are dropped.
    *
    * Keep decisions are hash-per-row, so realized shares converge to the
    * target as 1/√n per stratum (exact at web scale, approximate on small
    * tables) — the standard probabilistic mixer; use [[exactKPerStratum]]
    * when row-exact counts matter more than weight-exact shares.
    *
    * Cost: ONE map-side-combined aggregation to |strata| rows (collected to
    * the driver — strata are domain-bounded) + the zero-shuffle filter. */
  def mixToTarget(df: DataFrame, strataCol: String, keyCol: String,
                  weightCol: String, targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0.0),
      "targetShares must be non-empty with positive shares")
    val avail = df.filter(col(strataCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(strataCol).agg(sum(col(weightCol).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mixWithAvail(df, strataCol, keyCol, targetShares, avail)
  }

  /** [[mixToTarget]]'s fraction arithmetic over PRECOMPUTED per-stratum
    * availabilities — lets callers that already aggregated the weights
    * (mixWithTemperature) skip a second identical scan of the input. */
  private def mixWithAvail(df: DataFrame, strataCol: String, keyCol: String,
                           targetShares: Map[String, Double],
                           avail: Map[String, Long]): DataFrame = {
    // deterministic iteration order: fraction arithmetic must be
    // bit-reproducible across runs AND engines (the DuckDB oracle replays it)
    val present = targetShares.toSeq.sortBy(_._1).filter(s => avail.getOrElse(s._1, 0L) > 0L)
    require(present.nonEmpty, "no target stratum present in the data")
    val achievable = present.map { case (s, share) => avail(s) / share }.min
    val fractions = present.map { case (s, share) =>
      s -> math.min(1.0, share * achievable / avail(s))
    }.toMap
    stratifiedSample(df, strataCol, keyCol, fractions, default = 0.0)
  }

  /** Deterministic train/val/test split assignment: the md5 key hash lands
    * in [0, 10^6) and each named split owns a contiguous range sized by its
    * share (boundaries at ⌊cumulative·10^6⌋ — engine-portable integer
    * arithmetic; shares should sum to 1, the last split absorbs rounding).
    * Reproducible across engines, repartitioning, and reruns; a zero-shuffle
    * codegen'd projection — the split column costs nothing at 100 TB. */
  def assignSplits(df: DataFrame, keyCol: String,
                   shares: Seq[(String, Double)]): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 > 0), "positive shares required")
    require(math.abs(shares.map(_._2).sum - 1.0) < 1e-9, "shares must sum to 1")
    val bounds = shares.scanLeft(0.0)(_ + _._2).tail.map(c => (c * 1e6).toLong)
    val h = hashBucket(col(keyCol))
    val split = shares.zip(bounds).reverse.foldLeft(lit(shares.last._1)) {
      case (acc, ((name, _), upper)) => when(h < upper, lit(name)).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** LEAKAGE-SAFE split: every member of a near-duplicate cluster lands in
    * the SAME split, so eval can never score a near-copy of a training row
    * (the train/test contamination a per-row hash split cannot prevent).
    * `clusters` is a `(node, component)` edge-closure table
    * ([[graft.table.Components.connectedComponents]] over near-dup pairs);
    * unclustered rows hash on their own id. The hash key is the cluster
    * REPRESENTATIVE, so the whole cluster moves together by construction.
    *
    * Scale shape: one join of the corpus against the dup-rate-sized cluster
    * table (AQE broadcasts it while it fits), then the zero-shuffle split
    * projection. */
  def assignSplitsByCluster(df: DataFrame, idCol: String, clusters: DataFrame,
                            shares: Seq[(String, Double)]): DataFrame = {
    val joined = df.join(clusters.select(col("node"), col("component")),
        df(idCol) === col("node"), "left")
      .withColumn("_skey", coalesce(col("component"), df(idCol)))
      .drop("node", "component")
    assignSplits(joined, "_skey", shares).drop("_skey")
  }

  /** Temperature-flattened data mixing (the multilingual/UniMax recipe —
    * Arivazhagan et al. 2019 §4.2 use p ∝ c^(1/τ)): derive target shares
    * from the OBSERVED per-stratum weights, share_s ∝ w_s^(1/τ), then feed
    * them through [[mixToTarget]]'s scarcest-stratum-whole fraction
    * arithmetic. τ = 1 reproduces natural proportions (keeps everything);
    * τ → ∞ flattens toward uniform, down-sampling the head strata. Shares
    * are rounded to 9dp so the derived table is engine-portable (the DuckDB
    * oracle replays the same pow/normalize/round pipeline). Same libm caveat
    * as [[graft.table.TextAnalysis.dsirRatioTable]]: a 1-ulp `pow`
    * divergence at an exact half-way 9th decimal could flip a rounded
    * share — on platforms where that matters, compute the shares once and
    * pass them to [[mixToTarget]] directly.
    *
    * Cost on top of mixToTarget: one extra map-side-combined aggregation to
    * |strata| rows — the 100 TB side still only ever runs the zero-shuffle
    * deterministic keep filter. */
  def mixWithTemperature(df: DataFrame, strataCol: String, keyCol: String,
                         weightCol: String, tau: Double): DataFrame = {
    require(tau >= 1.0, s"temperature tau must be >= 1, got $tau")
    val avail = df.groupBy(strataCol).agg(sum(col(weightCol).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .filter(_._2 > 0L).sortBy(_._1)
    require(avail.nonEmpty, "no stratum with positive weight")
    val pows = avail.map { case (s, w) => s -> math.pow(w.toDouble, 1.0 / tau) }
    val tot = pows.map(_._2).sum
    val shares = pows.map { case (s, p) =>
      s -> BigDecimal(p / tot).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    // reuse the availabilities already aggregated above — routing through
    // mixToTarget re-ran the identical groupBy/sum/collect (a second full
    // scan of the input just to recompute `avail`)
    mixWithAvail(df, strataCol, keyCol, shares, avail.toMap)
  }

  /** EXACTLY `k` rows per stratum (fewer when the stratum is smaller):
    * uniform without replacement by ranking on the key hash — a
    * deterministic reservoir. One shuffle on the stratum key; at web scale
    * the per-stratum sort is the standard top-k window (rank ties broken by
    * the key itself so the result is total-ordered and engine-portable). */
  def exactKPerStratum(df: DataFrame, strataCol: String, keyCol: String,
                       k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }
}
