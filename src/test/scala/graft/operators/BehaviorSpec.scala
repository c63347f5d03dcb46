package graft.operators

import java.time.LocalDateTime

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): LocalDateTime = LocalDateTime.parse(s)

  // (event_id, ts, user_id, event_type) — minimal funnel shape
  private def ev(rows: (Long, String, Long, String)*) =
    rows.map { case (id, ts, u, tp) => (id, t(ts), u, tp) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: ordering is strict — a purchase BEFORE the first view does not count") {
    val events = ev(
      (1L, "2026-01-01T10:00:00", 1L, "view"),
      (2L, "2026-01-01T11:00:00", 1L, "purchase"), // qualifies: after view
      (3L, "2026-01-02T09:00:00", 2L, "purchase"), // u2 purchase BEFORE any view
      (4L, "2026-01-02T10:00:00", 2L, "view"),
      (5L, "2026-01-03T08:00:00", 3L, "view") // view only
    )
    val out = Behavior.funnel(events, Seq("view", "purchase"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect()
    assert(out.toSeq == Seq((1, "view", 3L), (2, "purchase", 1L)))
  }

  test("funnel: a stage nobody reaches reports users = 0, not a missing row") {
    val events = ev(
      (1L, "2026-01-01T10:00:00", 1L, "view"),
      (2L, "2026-01-01T09:00:00", 1L, "purchase")) // before the view — never qualifies
    val out = Behavior.funnel(events, Seq("view", "purchase", "refund"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect()
    assert(out.toSeq == Seq((1, "view", 1L), (2, "purchase", 0L), (3, "refund", 0L)))
  }

  test("funnel: same-timestamp event qualifies (>= boundary)") {
    val events = ev(
      (1L, "2026-01-01T10:00:00", 1L, "view"),
      (2L, "2026-01-01T10:00:00", 1L, "purchase"))
    val out = Behavior.funnel(events, Seq("view", "purchase"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect()
    assert(out.toSeq == Seq((1, "view", 1L), (2, "purchase", 1L)))
  }

  test("retention: cohort is the user's own first day; week offsets are integer floors") {
    val events = ev(
      (1L, "2026-01-01T10:00:00", 1L, "view"), // u1 cohort 01-01
      (2L, "2026-01-06T10:00:00", 1L, "view"), // day 5 → week 0
      (3L, "2026-01-09T10:00:00", 1L, "view"), // day 8 → week 1
      (4L, "2026-01-09T11:00:00", 1L, "view"), // same week, distinct-folded
      (5L, "2026-01-09T10:00:00", 2L, "view") // u2 cohort 01-09, week 0
    )
    val out = Behavior.retention(events)
      .orderBy("cohort_day", "week_offset")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (d, w, n) => (d.toString, w, n) }
    assert(out.toSeq == Seq(
      ("2026-01-01", 0L, 1L), ("2026-01-01", 1L, 1L), ("2026-01-09", 0L, 1L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with null-safe compare") {
    val prev = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), None), // value NULL both sides → unchanged
      (3L, Some("c"), Some(3.0)), // removed
      (4L, None: Option[String], Some(4.0)) // type NULL→"x" → changed
    ).toDF("event_id", "event_type", "value")
    val cur = Seq(
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), None: Option[Double]),
      (4L, Some("x"), Some(4.0)),
      (5L, Some("new"), Some(5.0)) // added
    ).toDF("event_id", "event_type", "value")
    val out = DataQuality.snapshotDiff(cur, prev, "event_id", Seq("event_type", "value"))
      .orderBy("event_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq(
      (1L, "unchanged"), (2L, "unchanged"), (3L, "removed"), (4L, "changed"), (5L, "added")))
  }

  test("valuePercentiles: interpolated quantiles on a handmade distribution") {
    val df = (1 to 101).map(i => ("t", i.toDouble)).toDF("event_type", "value")
    val out = DataQuality.valuePercentiles(df, "event_type", "value")
      .as[(String, Double, Double, Double)].collect()
    // (n−1)·p lands exactly on elements for n=101
    assert(out.toSeq == Seq(("t", 51.0, 91.0, 100.0)))
  }
}
