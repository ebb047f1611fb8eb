package graft.streaming

import graft.model.SchemaDoc
import graft.row.RowValidator
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Constraint validation under Structured Streaming.
  *
  * The compiled constraint plan is a STATELESS projection (one Column DAG per
  * row — SURVEY §3.1's unrolled `ValidateSubSchema`), so the same compiled
  * expressions run unchanged on a streaming DataFrame: `readStream` sources
  * micro-batch through the identical whole-stage-codegen'd operators. The
  * reference is strictly batch (SURVEY §2.6 "Streaming: none"), so this is
  * engine surface beyond parity, built on the same compiler.
  *
  * Stateful pieces use the streaming-native primitives:
  *  - windowed violation counts: watermark + tumbling-window aggregation
  *  - streaming uniqueness: `flatMapGroupsWithState` keyed by doc_id — a
  *    repeated key within the state-retention horizon emits a violation row,
  *    the streaming analogue of the batch salted-groupBy uniqueness check.
  */
object StreamingValidation {

  /** Violation rows for a streaming micro-batched input — same output schema
    * as the batch path (doc_id, keyword, keywordLocation, instanceLocation,
    * message). Stateless: safe in any output mode. */
  def violations(stream: DataFrame, doc: SchemaDoc, idCol: String): DataFrame =
    RowValidator.withValidation(stream, doc)
      .filter(size(col("_violations")) > 0)
      .select(col(idCol).cast("string").as("doc_id"),
        explode(col("_violations")).as("v"))
      .select(col("doc_id"),
        col("v.keyword").as("keyword"),
        col("v.keywordLocation").as("keywordLocation"),
        col("v.instanceLocation").as("instanceLocation"),
        col("v.message").as("message"))

  /** Per-window, per-keyword violation counts with a watermark — the
    * continuous-monitoring analogue of the batch per-partition manifest. */
  def windowedViolationCounts(stream: DataFrame, doc: SchemaDoc, idCol: String,
                              eventTimeCol: String, windowDuration: String,
                              watermarkDelay: String): DataFrame =
    RowValidator.withValidation(stream, doc)
      .withWatermark(eventTimeCol, watermarkDelay)
      .select(col(eventTimeCol), explode_outer(col("_violations")).as("v"))
      .groupBy(window(col(eventTimeCol), windowDuration),
        coalesce(col("v.keyword"), lit("_none")).as("keyword"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming referential integrity: stream-static LEFT-ANTI join against
    * the (small) dimension — Spark broadcasts the static side into every
    * micro-batch, so the stream never shuffles. Stateless → any output mode. */
  def streamingRiViolations(stream: DataFrame, dim: DataFrame, factKey: String,
                            dimKey: String, idCol: String): DataFrame =
    stream.join(broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
        Seq(factKey), "left_anti")
      .select(col(idCol).cast("string").as("doc_id"),
        lit("referential").as("keyword"),
        lit(s"#/$$dataset/referential/$factKey").as("keywordLocation"),
        concat(lit(s"#/$factKey="), coalesce(col(factKey).cast("string"), lit("null")))
          .as("instanceLocation"),
        concat(lit(s"value of $factKey not in dimension: "),
          coalesce(col(factKey).cast("string"), lit("null"))).as("message"))

  /** Per-window chi-squared drift of `catCol` frequencies against a STATIC
    * baseline distribution — the continuous analogue of the batch chi2 check.
    *
    * Uses the algebraic identity Σ_cats (o − f·N)²/(f·N) = (Σ o²/f)/N − N
    * (f = baseline fraction, N = window total, Σf = 1), which needs only
    * SUMS — so the whole statistic fits Structured Streaming's chained
    * windowed-aggregation pattern (counts per (window, category), then one
    * re-window aggregation), zero-observed baseline categories included
    * exactly. Categories absent from the baseline get the same 0.5
    * pseudo-count as the batch path. */
  def windowedChiSquared(stream: DataFrame, baseline: DataFrame, catCol: String,
                         eventTimeCol: String, windowDuration: String,
                         watermarkDelay: String): DataFrame = {
    val base = baseline.groupBy(col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("eRaw"))
    val eTot = base.agg(sum("eRaw")).collect()(0).getLong(0).toDouble
    val fracs: Map[String, Double] =
      base.collect().map(r => r.getString(0) -> r.getLong(1) / eTot).toMap
    val fExpr = coalesce(element_at(typedLit(fracs), col("k")), lit(0.5 / eTot))
    val counts = stream.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"),
        col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("o"))
    counts
      .groupBy(window(col("w"), windowDuration).as("w"))
      .agg((sum(pow(col("o"), 2) / fExpr) / sum("o") - sum("o")).as("chi2_stat"),
        sum("o").as("n_obs"))
      .select(col("w").getField("start").as("w_start"), col("chi2_stat"), col("n_obs"))
  }

  /** Per-window PSI (population stability index) of `catCol` frequencies
    * against a STATIC baseline — the streaming analogue of
    * `TableChecks.psiDrift`.
    *
    * PSI = Σ (p−q)·ln(p/q) with p = o/N for observed categories (eps for a
    * zero-observed baseline category) and q = the baseline fraction (eps for
    * a category unknown to the baseline). The statistic decomposes into
    * per-category SUM terms — Σ o(ln o − ln q), Σ q(ln o − ln q), Σ q, and
    * the baseline-membership partial sums — plus driver-side constants of
    * the static baseline (Σ q·ln q, Σ ln q, Σ q, |categories|), so the whole
    * thing fits the chained windowed-aggregation pattern exactly like
    * [[windowedChiSquared]]: counts per (window, category), then ONE
    * re-window aggregation; zero-observed baseline categories enter through
    * the constants. (The batch psiDrift floors p at eps also for observed
    * categories; that differs only when 0 < o/N < eps — negligible by
    * construction and absent for any window with N < 1/eps rows.) */
  def windowedPsi(stream: DataFrame, baseline: DataFrame, catCol: String,
                  eventTimeCol: String, windowDuration: String,
                  watermarkDelay: String, eps: Double = 1e-6): DataFrame = {
    val base = baseline.groupBy(col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("eRaw"))
    val eTot = base.agg(sum("eRaw")).collect()(0).getLong(0).toDouble
    val fracs: Map[String, Double] =
      base.collect().map(r => r.getString(0) -> r.getLong(1) / eTot).toMap
    // driver-side constants of the static baseline
    val kCats = fracs.size
    val c1 = fracs.values.map(q => q * math.log(q)).sum
    val c2 = fracs.values.map(math.log).sum
    val c3 = fracs.values.sum
    val lnEps = math.log(eps)

    val qCol = coalesce(element_at(typedLit(fracs), col("k")), lit(eps))
    val inBase = element_at(typedLit(fracs), col("k")).isNotNull
    val lnRatio = log(col("o")) - log(qCol) // ln o − ln q, per category

    val counts = stream.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"),
        col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("o"))
    counts
      .groupBy(window(col("w"), windowDuration).as("w"))
      .agg(
        sum(col("o")).as("n"),
        sum(col("o") * lnRatio).as("a"),       // Σ o(ln o − ln q)
        sum(qCol * lnRatio).as("c"),           // Σ q(ln o − ln q)
        sum(qCol).as("d"),                     // Σ q over observed
        sum(when(inBase, qCol * log(qCol)).otherwise(0.0)).as("s1"),
        sum(when(inBase, log(qCol)).otherwise(0.0)).as("s2"),
        sum(when(inBase, qCol).otherwise(0.0)).as("s3"),
        sum(when(inBase, 1L).otherwise(0L)).as("m_obs"))
      .select(col("w").getField("start").as("w_start"), col("n").as("n_obs"),
        // observed part: Σ (o/N − q)(ln o − ln N − ln q)
        ((col("a") / col("n")) - log(col("n")) + log(col("n")) * col("d") - col("c") +
          // zero-observed baseline categories: Σ (eps − q)(ln eps − ln q)
          (lit(kCats) - col("m_obs")) * lit(eps * lnEps) -
          lit(eps) * (lit(c2) - col("s2")) -
          lit(lnEps) * (lit(c3) - col("s3")) +
          (lit(c1) - col("s1"))).as("psi"))
  }

  /** Per-window TOKEN-level unigram drift against a STATIC baseline corpus —
    * the streaming form of [[graft.table.TableChecks.tokenUnigramDrift]]:
    * PSI of each window's token-frequency distribution vs the baseline's,
    * over the vocabulary as the category domain (catches a tokenizer or
    * encoding regression within one window of it landing).
    *
    * The explode is STATELESS and precedes the watermark/window, so state
    * stays O(windows × vocab) partial counts — never O(tokens); everything
    * else is [[windowedPsi]]'s sum-decomposed chained windowed aggregation
    * (append-mode compatible, one shuffle per window batch). */
  def windowedTokenDrift(stream: DataFrame, baseline: DataFrame, tokensCol: String,
                         eventTimeCol: String, windowDuration: String,
                         watermarkDelay: String, eps: Double = 1e-6): DataFrame =
    windowedPsi(
      stream.select(col(eventTimeCol), explode(col(tokensCol)).as("tok")),
      baseline.select(explode(col(tokensCol)).as("tok")),
      "tok", eventTimeCol, windowDuration, watermarkDelay, eps)

  /** Bridge STREAMING into the INCREMENTAL engine: each micro-batch commits
    * as one append snapshot of `table` and is validated incrementally —
    * delta-only row checks, mergeable sketch/expectation state, merged
    * table-wide manifest — via [[graft.run.IncrementalValidation]]. The
    * stream thereby gets everything the standing batch job has (lineage,
    * resumable manifests, cross-snapshot uniqueness, the schema-promotion
    * guard) instead of a parallel stateful implementation; and after the
    * stream stops, the SAME state dir serves batch incremental runs.
    *
    * Exactly-once discipline: foreachBatch delivers at-least-once, so the
    * snapshot commit is keyed by an idempotency token derived from the
    * batchId — a replayed micro-batch (crash before the streaming checkpoint
    * advanced) finds its token in the commit marker and returns the existing
    * snapshot instead of appending a duplicate; the incremental validation
    * of an already-validated snapshot is itself a no-op. A crashed HALF
    * commit (data, no marker) is invisible and cleared on the retry. An
    * EMPTY micro-batch is a no-op (no empty snapshots). `onResult` receives
    * each batch's [[graft.run.IncrementalResult]] — write
    * violations/manifest wherever the job sinks them.
    *
    * Returns a DataStreamWriter — call `.start()` (and optionally set a
    * checkpointLocation) to run. */
  def incrementalSink(stream: DataFrame, store: graft.snapshot.AppendSnapshotStore,
                      table: String, partitionCol: String,
                      dim: Option[DataFrame], baseline: Option[DataFrame],
                      cfg: graft.run.PipelineConfig, stateDir: String,
                      onResult: graft.run.IncrementalResult => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val snap = store.commitAppend(table, batch, partitionCol,
          idempotencyToken = Some(s"stream-batch-$batchId"))
        val r = graft.run.IncrementalValidation.validateDeltaAndCommit(
          batch.sparkSession, store, table, dim, baseline, cfg, stateDir,
          s"stream-batch-$batchId-snap-$snap")
        onResult(r)
      }
    }

  /** Per-window EXPECTATION suite — the streaming form of
    * [[graft.table.Expectations.check]]: every expectation evaluated within
    * each event-time window, one verdict row per (window, expectation).
    * The whole suite rides ONE windowed aggregation (same lowering as the
    * batch form), so state is O(windows × expectations).
    *
    * [[graft.table.Expectations.DistinctCountBetween]] is rejected:
    * streaming aggregations cannot hold exact distinct state — use the
    * approx form by pre-aggregating, or check it on the batch snapshot. */
  def windowedExpectations(stream: DataFrame,
                           suite: Seq[graft.table.Expectations.Expectation],
                           eventTimeCol: String, windowDuration: String,
                           watermarkDelay: String): DataFrame = {
    import graft.table.Expectations
    require(suite.nonEmpty, "empty expectation suite")
    require(!suite.exists(_.isInstanceOf[Expectations.DistinctCountBetween]),
      "distinct_count_between is not streaming-expressible; evaluate it on the batch snapshot")
    val low = suite.map(Expectations.lowered)
    val aggs = low.zipWithIndex.map { case ((c, _, _), i) => c.as(s"_e$i") }
    val grouped = stream.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    suite.zip(low).zipWithIndex.map { case ((e, (_, lo, hi)), i) =>
      val obs = col(s"_e$i").cast("double")
      grouped.select(col("w").getField("start").as("w_start"),
        lit(e.name).as("expectation"), obs.as("observed"),
        lit(lo).as("lo"), lit(hi).as("hi"),
        coalesce(obs >= lo && obs <= hi, lit(false)).as("passed"))
    }.reduce(_ unionByName _)
  }

  /** Per-window QUANTILE drift of a numeric column against a STATIC
    * baseline — the streaming form of the manifest's t-digest quantile
    * metrics. Baseline quantiles are computed exactly ONCE at stream setup
    * (a driver action on the static side); each window then aggregates one
    * mergeable t-digest ([[graft.functions.TDigestQuantiles]] — constant
    * sketch state per window group, so state size is O(windows), not
    * O(rows)) and emits its quantiles plus the max relative deviation
    * `drift = max_i |q_w[i] − q_base[i]| / max(|q_base[i]|, 1)`.
    * One windowed aggregation, append-mode compatible. */
  def windowedQuantileDrift(stream: DataFrame, baseline: DataFrame, numCol: String,
                            eventTimeCol: String, windowDuration: String,
                            watermarkDelay: String,
                            probs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(probs.nonEmpty, "probs must be non-empty")
    val arr = probs.map(p => s"${p}D").mkString(", ")
    val exact: Seq[Double] = baseline
      .agg(expr(s"percentile($numCol, array($arr))"))
      .collect()(0).getSeq[Double](0)
    val agged = stream.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration).as("w"))
      .agg(graft.functions.TDigestQuantiles(col(numCol), probs).as("qs"),
        count(lit(1)).as("n_obs"))
    val devs = probs.indices.map { i =>
      abs(element_at(col("qs"), i + 1) - lit(exact(i))) /
        greatest(abs(lit(exact(i))), lit(1.0))
    }
    val drift = if (devs.size == 1) devs.head else greatest(devs: _*)
    agged.select(col("w").getField("start").as("w_start"), col("n_obs"),
      col("qs").as("quantiles"), drift.as("drift"))
  }

  final case class SeenKey(occurrences: Long)
  final case class DupViolation(doc_id: String, keyword: String,
                                keywordLocation: String, instanceLocation: String,
                                message: String)

  /** Streaming uniqueness of `idCol`: keyed state remembers seen ids and
    * emits a violation per re-occurrence. State expires `retentionMs` past
    * the key's last event time once the WATERMARK passes it — expiry rides
    * the data clock, so memory stays bounded by keys-per-retention-window
    * at any throughput (the streaming analogue of bounding the batch
    * uniqueness shuffle via salting). */
  def streamingDuplicates(stream: DataFrame, idCol: String, eventTimeCol: String,
                          watermarkDelay: String = "10 seconds",
                          retentionMs: Long = 3600000L): Dataset[DupViolation] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(idCol).cast("string").as("id"),
        col(eventTimeCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeenKey, DupViolation](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (id: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[SeenKey]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val incoming = batch.size.toLong
            val prior = state.getOption.getOrElse(SeenKey(0L))
            val totalNow = prior.occurrences + incoming
            state.update(SeenKey(totalNow))
            state.setTimeoutTimestamp(batch.map(_._2.getTime).max + retentionMs)
            // first occurrence is legal; every additional one is a violation
            val dups = if (prior.occurrences > 0) incoming else incoming - 1
            Iterator.fill(dups.toInt)(DupViolation(
              id, "uniqueness", s"#/$$dataset/uniqueness", s"#/$id",
              s"key occurs $totalNow times within retention window"))
          }
      }
  }
}
