package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("history opens a version per attribute change, with closed ranges") {
    val feed = Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), 1L),
      (1L, "bronze", ts("2024-01-02 00:00:00"), 2L), // no change — absorbed
      (1L, "silver", ts("2024-01-03 00:00:00"), 3L),
      (1L, "gold", ts("2024-01-05 00:00:00"), 4L),
      (2L, "bronze", ts("2024-02-01 00:00:00"), 5L)
    ).toDF("user_id", "tier", "ts", "event_id")
    val h = Scd2.history(feed, "user_id", Seq("tier"), "ts", "event_id")
      .orderBy("user_id", "effective_from")
      .as[(Long, String, Timestamp, Long, Option[Timestamp], Boolean)].collect()
    assert(h.toSeq == Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), 1L, Some(ts("2024-01-03 00:00:00")), false),
      (1L, "silver", ts("2024-01-03 00:00:00"), 3L, Some(ts("2024-01-05 00:00:00")), false),
      (1L, "gold", ts("2024-01-05 00:00:00"), 4L, None, true),
      (2L, "bronze", ts("2024-02-01 00:00:00"), 5L, None, true)))
  }

  test("open_<tieBreak> totalizes the order when attrs repeat at one instant") {
    // A,B,A at one identical timestamp: two A-versions tie on
    // (user_id, effective_from, v) and differ only in effective_to /
    // is_current — open_event_id is the only total sort key.
    val t0 = ts("2024-01-01 00:00:00")
    val feed = Seq(
      (1L, "a", t0, 1L), (1L, "b", t0, 2L), (1L, "a", t0, 3L)
    ).toDF("user_id", "v", "ts", "event_id")
    val h = Scd2.history(feed, "user_id", Seq("v"), "ts", "event_id")
      .orderBy("user_id", "effective_from", "open_event_id")
      .select("v", "open_event_id", "is_current")
      .as[(String, Long, Boolean)].collect()
    assert(h.toSeq == Seq(("a", 1L, false), ("b", 2L, false), ("a", 3L, true)))
  }

  test("a re-appearing old value opens a NEW version (no flattening)") {
    val feed = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "b", ts("2024-01-02 00:00:00"), 2L),
      (1L, "a", ts("2024-01-03 00:00:00"), 3L)
    ).toDF("user_id", "v", "ts", "event_id")
    val h = Scd2.history(feed, "user_id", Seq("v"), "ts", "event_id")
    assert(h.count() == 3)
    assert(h.filter($"v" === "a").count() == 2)
  }

  test("null attribute values compare null-safely (null→null is not a change)") {
    val feed = Seq(
      (1L, Option.empty[String], ts("2024-01-01 00:00:00"), 1L),
      (1L, Option.empty[String], ts("2024-01-02 00:00:00"), 2L),
      (1L, Some("x"), ts("2024-01-03 00:00:00"), 3L),
      (1L, Option.empty[String], ts("2024-01-04 00:00:00"), 4L)
    ).toDF("user_id", "v", "ts", "event_id")
    val h = Scd2.history(feed, "user_id", Seq("v"), "ts", "event_id")
      .orderBy("effective_from")
      .select("v", "is_current").as[(Option[String], Boolean)].collect()
    assert(h.toSeq == Seq((None, false), (Some("x"), false), (None, true)))
  }

  test("equal timestamps order by the tie-break, keeping history deterministic") {
    val t0 = ts("2024-01-01 00:00:00")
    val feed = Seq(
      (1L, "a", t0, 2L),
      (1L, "b", t0, 1L) // same instant; event 1 happened first
    ).toDF("user_id", "v", "ts", "event_id")
    val h = Scd2.history(feed, "user_id", Seq("v"), "ts", "event_id")
      .filter($"is_current").select("v").as[String].collect()
    assert(h.toSeq == Seq("a"))
  }

  test("plan: both windows share ONE key exchange (no re-shuffle between stages)") {
    val feed = Seq((1L, "a", ts("2024-01-01 00:00:00"), 1L))
      .toDF("user_id", "v", "ts", "event_id")
    val plan = Scd2.history(feed, "user_id", Seq("v"), "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"SCD2 must shuffle the feed exactly once:\n$plan")
  }

  test("multi-attribute tracking: a change in ANY attribute opens a version") {
    val feed = Seq(
      (1L, "a", 10L, ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", 20L, ts("2024-01-02 00:00:00"), 2L), // second attr changed
      (1L, "a", 20L, ts("2024-01-03 00:00:00"), 3L) // no change
    ).toDF("user_id", "v", "w", "ts", "event_id")
    assert(Scd2.history(feed, "user_id", Seq("v", "w"), "ts", "event_id").count() == 2)
  }
}
