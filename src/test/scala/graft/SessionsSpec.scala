package graft

import graft.table.Sessions
import org.apache.spark.sql.functions._

/** Gap-based sessionization: boundary semantics, determinism under ties, and
  * the one-exchange plan shape. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long)*) = // (user, epoch_s, event_id)
    rows.toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

  test("gap over threshold starts a new session; boundary gap does not") {
    // user 1: events at 0, 100, 1900 (gap 1800 exactly — same session),
    // then 3701 (gap 1801 — new session)
    val df = ev((1L, 0L, 1L), (1L, 100L, 2L), (1L, 1900L, 3L), (1L, 3701L, 4L))
    val out = Sessions.sessionize(df, "user_id", "ts", 1800L, "event_id")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("sessions are per-user; stats aggregate count/start/duration") {
    val df = ev(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 5000L, 3L),
      (2L, 15L, 4L))
    val stats = Sessions.sessionStats(df, "user_id", "ts", 1800L, "event_id")
      .select("user_id", "session_idx", "n_events", "start_s", "dur_s")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stats == Set(
      (1L, 0L, 2L, 10L, 10L),   // events at 10, 20
      (1L, 1L, 1L, 5000L, 0L),  // lone event after the gap
      (2L, 0L, 1L, 15L, 0L)))
  }

  test("equal timestamps order by the tiebreaker deterministically") {
    // two events at the same second: tie broken by event_id, so the session
    // assignment is stable no matter the input partitioning
    val df = ev((1L, 50L, 9L), (1L, 50L, 3L), (1L, 5000L, 5L)).repartition(4)
    val out = Sessions.sessionize(df, "user_id", "ts", 1800L, "event_id")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 0L, 9L -> 0L, 5L -> 1L))
  }

  test("plan shape: ONE exchange shared by the window and the aggregation") {
    val df = ev((1L, 0L, 1L), (2L, 10L, 2L))
    val plan = Sessions.sessionStats(df, "user_id", "ts", 1800L, "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
