package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the standard behavioral
  * grouping operator (a "session" = a maximal run of one user's events with
  * no silence longer than `gapSeconds` between consecutive events). The
  * reference has no temporal operators; this belongs to the dataset-scope
  * analytics surface alongside the window operators of SURVEY §2.6.
  *
  * Scale design (10^12 events):
  *  - ONE shuffle, on the user key. The session-boundary window
  *    (`lag` + running `sum`) and the per-session aggregation both require
  *    clustering by user; Spark reuses the window's hash partitioning for the
  *    downstream `groupBy(user, session)` (subset-key satisfaction), so the
  *    whole operator is scan → exchange → sort → result.
  *  - Order within a user is (ts, tiebreaker) — deterministic under ties, so
  *    results are reproducible across engines and retries.
  *  - Skew caveat: sessionization is inherently order-dependent per user, so
  *    one pathological user (a bot with 10^8 events) serializes in one task.
  *    That is a property of the SEMANTICS, not the plan; the mitigation is
  *    upstream (bot filtering / per-user event caps), not salting — a salted
  *    split would break session continuity at salt boundaries.
  */
object Sessions {

  /** Assigns `session_idx` (0-based per user, in time order) to every event.
    * A new session starts at the first event and whenever the gap since the
    * previous event exceeds `gapSeconds`. `tieCol` breaks equal-timestamp
    * ordering deterministically. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    // epoch seconds: NTZ parquet timestamps cast through TIMESTAMP (UTC
    // session) then truncate to whole seconds — the identical boundary
    // arithmetic to DuckDB's epoch(ts)::BIGINT, engine-portable
    val sec = col(tsCol).cast("timestamp").cast("long")
    val newSession = when(
      lag(sec, 1).over(w).isNull || sec - lag(sec, 1).over(w) > gapSeconds, 1L
    ).otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-session aggregates: (user, session_idx, n_events, start_s, dur_s).
    * Runs on [[sessionize]]'s output partitioning without a second exchange. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapSeconds: Long, tieCol: String): DataFrame = {
    val sec = col(tsCol).cast("timestamp").cast("long")
    sessionize(df, userCol, tsCol, gapSeconds, tieCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(sec).as("start_s"),
        (max(sec) - min(sec)).as("dur_s"))
  }
}
