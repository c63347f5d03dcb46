package graft.operators

import java.time.LocalDateTime

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = LocalDateTime.parse(s)

  test("points land in containing intervals; boundaries half-open; multi-bucket spans dedup-free") {
    val intervals = Seq(
      ("u1", t("2026-01-01T10:00:00"), t("2026-01-01T12:30:00"), "long"),  // spans 3 hour-buckets
      ("u1", t("2026-01-01T11:00:00"), t("2026-01-01T11:30:00"), "short"), // overlaps 'long'
      ("u2", t("2026-01-01T10:15:00"), t("2026-01-01T10:45:00"), "other")
    ).toDF("user", "start", "end", "tag")
    val points = Seq(
      ("u1", t("2026-01-01T10:00:00"), 1L),  // inclusive start of 'long'
      ("u1", t("2026-01-01T11:10:00"), 2L),  // in both u1 intervals
      ("u1", t("2026-01-01T12:29:59"), 3L),  // last second of 'long'
      ("u1", t("2026-01-01T12:30:00"), 4L),  // exclusive end -> no match
      ("u2", t("2026-01-01T10:30:00"), 5L),  // matches 'other', right user only
      ("u1", t("2026-01-01T10:30:00"), 6L)   // same ts as 5 but wrong key for 'other'
    ).toDF("user", "ts", "pid")

    val out = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", Seq("user"))
      .select("pid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "long"), (2L, "long"), (2L, "short"), (3L, "long"),
      (5L, "other"), (6L, "long")))
  }

  test("sub-second interval ends on a bucket boundary keep their trailing bucket") {
    // end = 11:00:00.5: floor-second 11:00:00 is a whole bucket
    // multiple, but the interval still reaches 500ms into the 11:00
    // bucket — second-truncated bucketing would drop point 2
    val intervals = Seq(
      ("u", t("2026-01-01T10:30:00"), t("2026-01-01T11:00:00.500"), "i1")
    ).toDF("user", "start", "end", "tag")
    val points = Seq(
      ("u", t("2026-01-01T10:59:59.900"), 1L), // in the 10:00 bucket
      ("u", t("2026-01-01T11:00:00.400"), 2L), // trailing sub-second window
      ("u", t("2026-01-01T11:00:00.500"), 3L)  // exclusive end -> no match
    ).toDF("user", "ts", "pid")
    val out = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", Seq("user"))
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L), s"trailing sub-second bucket lost: $out")
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val intervals = Seq(("u", t("2026-01-01T10:00:00"), t("2026-01-01T11:00:00"))).toDF("user", "start", "end")
    val points = Seq(("u", t("2026-01-01T10:30:00"), 1L)).toDF("user", "ts", "pid")
    val plan = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", Seq("user"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range explosion:\n$plan")
  }
}
