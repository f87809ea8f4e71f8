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

  test("eventSequences: exact motif counts, short streams contribute none") {
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (1L, ts(4), 4L, "a"), (1L, ts(5), 5L, "b"), (1L, ts(6), 6L, "c"),
      (2L, ts(1), 7L, "a"), (2L, ts(2), 8L, "b")   // too short for n=3
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.eventSequences(events,
        "user_id", "ts", "event_id", "event_type", n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // user 1 stream abcabc: windows abc, bca, cab, abc
    assert(out === Map("a>b>c" -> 2L, "b>c>a" -> 1L, "c>a>b" -> 1L),
      out.toString)
    intercept[IllegalArgumentException](EventAnalytics.eventSequences(
      events, "user_id", "ts", "event_id", "event_type", 1, 10))
  }

  test("eventSequences: a null type mid-window kills the window, not the separator") {
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // stream a, NULL, c, a: every 3-window contains the null → no motifs
    // (concat_ws would silently have emitted the truncated "a>c" and
    // "c>a" as fake 3-grams); 2-windows away from the null still count
    val events = Seq(
      (1L, ts(1), 1L, Option("a")), (1L, ts(2), 2L, Option.empty[String]),
      (1L, ts(3), 3L, Option("c")), (1L, ts(4), 4L, Option("a"))
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out3 = EventAnalytics.eventSequences(events,
        "user_id", "ts", "event_id", "event_type", n = 3, topK = 10)
      .collect()
    assert(out3.isEmpty, out3.mkString(","))
    val out2 = EventAnalytics.eventSequences(events,
        "user_id", "ts", "event_id", "event_type", n = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 === Map("c>a" -> 1L), out2.toString)
  }

  test("timeDecayAttribution: dyadic half-life credits, window + bounds") {
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 purchase at 10:00; touches at 09:50 (Δ10m → w=1),
    // 08:30 (Δ90m → 1 half-life → w=1/2), 05:00 (outside 4h lookback),
    // 10:05 (after conversion — excluded). credits: 1/(3/2)=2/3, (1/2)/(3/2)=1/3
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase"),
      (1L, ts("2024-01-01 09:50:00"), "click"),
      (1L, ts("2024-01-01 08:30:00"), "view"),
      (1L, ts("2024-01-01 05:00:00"), "click"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (2L, ts("2024-01-01 12:00:00"), "purchase")  // no touches → no rows
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.timeDecayAttribution(events, "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"),
        lookbackMinutes = 240, halfLifeMinutes = 60)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2)) ->
        ((r.getString(3), r.getDouble(4)))).toMap
    assert(out.size === 2, out.toString)
    assert(out((1L, ts("2024-01-01 09:50:00"))) === (("click", 0.666667)))
    assert(out((1L, ts("2024-01-01 08:30:00"))) === (("view", 0.333333)))
    // per-conversion credits sum to 1 (within the 6dp round)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 2e-6)
    intercept[IllegalArgumentException](
      EventAnalytics.timeDecayAttribution(events, "user_id", "ts",
        "event_type", "purchase", Seq("purchase"), 240, 60))

    // at-least-once replay: duplicating the whole feed changes nothing
    val replayed = EventAnalytics.timeDecayAttribution(
        events.unionAll(events), "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"), 240, 60)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2)) ->
        ((r.getString(3), r.getDouble(4)))).toMap
    assert(replayed === out, replayed.toString)
  }

  test("kaplanMeier: hand-checked product-limit steps, exhaustion pins S to 0") {
    // u1: dies day0; u2: censored day2; u3: dies day2; u4: dies day5
    val ev = Seq(
      (1L, "2024-01-01 09:00:00", 1L, "purchase"),
      (2L, "2024-01-01 09:00:00", 2L, "view"),
      (2L, "2024-01-03 09:00:00", 3L, "error"),
      (3L, "2024-01-01 09:00:00", 4L, "view"),
      (3L, "2024-01-03 09:00:00", 5L, "purchase"),
      (4L, "2024-01-01 09:00:00", 6L, "view"),
      (4L, "2024-01-06 09:00:00", 7L, "purchase")
    ).toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = EventAnalytics.kaplanMeier(ev, "user_id", "ts", "event_id",
      "event_type", "purchase")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // S(0) = 3/4; S(2) = 3/4 · 2/3 = 1/2; S(5): d = n_risk → exactly 0
    assert(out === Map(
      0L -> ((4L, 1L, 0L, 0.75)),
      2L -> ((3L, 1L, 1L, 0.5)),
      5L -> ((1L, 1L, 0L, 0.0))))
  }

  test("associationRules: hand-checked support/confidence/lift, duplicates collapse") {
    // u1:{a,b}, u2:{a,b,c}, u3:{a} — the repeated (u1,a) row must not count twice
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (2L, "c"), (3L, "a")).toDF("user_id", "event_type")
    val out = EventAnalytics.associationRules(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(out.size === 6)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a→b: 2 of 3 users, conf 2/3, lift exactly 1 (independent given coverage)
    assert(out(("a", "b")) ===
      ((3L, 2L, 2L, r6(2.0 / 3), r6(2.0 / 3), 1.0)))
    // c→b: conf 1, lift (1/3)/((1/3)(2/3)) = 1.5
    assert(out(("c", "b")) === ((1L, 2L, 1L, r6(1.0 / 3), 1.0, 1.5)))
  }
}
