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
