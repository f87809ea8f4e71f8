package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** Event-behavior analytics (SURVEY.md §2b): transitions, funnels,
  * cohort retention — hand-computed expectations on a constructed log. */
class EventAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  // user 1: view → click → purchase (full funnel)
  // user 2: view → purchase → click (purchase BEFORE click: depth 2 only)
  // user 3: click only (never enters the view funnel)
  // user 4: view only (depth 1)
  private def events = Seq(
    (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "purchase"),
    (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "purchase"), (2L, ts(3), 6L, "click"),
    (3L, ts(1), 7L, "click"),
    (4L, ts(5), 8L, "view")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("funnelSteps: strict ordering, partial depths, non-entrants excluded") {
    val out = EventAnalytics.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    // user1 → 3 steps, user2 → 2 (purchase precedes click), user4 → 1;
    // user3 never did 'view' → absent
    assert(out === Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("transitionCounts: lag pairs per user, first events excluded") {
    val out = EventAnalytics.transitionCounts(events,
        "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("view", "click") -> 1L,
      ("click", "purchase") -> 1L,
      ("view", "purchase") -> 1L,
      ("purchase", "click") -> 1L))
  }

  test("cohortRetention: same-day cohort, distinct users per offset") {
    val d1 = Timestamp.valueOf("2024-01-01 09:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 23:00:00")
    val d3 = Timestamp.valueOf("2024-01-03 01:00:00")
    val ev = Seq(
      (1L, d1), (1L, d2), (1L, d2),  // active day 0 and 1 (dup same day)
      (2L, d2), (2L, d3)             // cohort Jan 2, active offsets 0 and 1
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("2024-01-01 00:00:00.0", 0L) -> 1L,
      ("2024-01-01 00:00:00.0", 1L) -> 1L,
      ("2024-01-02 00:00:00.0", 0L) -> 1L,
      ("2024-01-02 00:00:00.0", 1L) -> 1L))
  }
}
