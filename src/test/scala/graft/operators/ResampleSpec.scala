package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("dailyFfill spans each key's own range, forward-fills gaps, null before first obs") {
    val obs = Seq(
      (1L, t("2024-01-01 10:00:00"), 5.0),
      (1L, t("2024-01-01 12:00:00"), 7.0), // same day → daily max 7.0
      (1L, t("2024-01-04 09:00:00"), 3.0), // gap: Jan 2–3 filled with 7.0
      (2L, t("2024-02-10 08:00:00"), 1.0) // single-day key → one row
    ).toDF("user_id", "ts", "value")
    val out = Resample.dailyFfill(obs, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .select("user_id", "day", "day_value", "value_ffill")
      .as[(Long, java.sql.Date, Option[Double], Option[Double])].collect()
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2.toString).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(u1.map(_._3).toSeq == Seq(Some(7.0), None, None, Some(3.0)))
    assert(u1.map(_._4).toSeq == Seq(Some(7.0), Some(7.0), Some(7.0), Some(3.0)))
    val u2 = out.filter(_._1 == 2L)
    assert(u2.map(r => (r._2.toString, r._4)).toSeq == Seq(("2024-02-10", Some(1.0))))
  }

  test("movingAverage: trailing frame mean over daily sums, per-key frames independent") {
    val obs = Seq(
      (1L, t("2024-01-01 10:00:00"), 2.0),
      (1L, t("2024-01-01 12:00:00"), 4.0), // day 1: sum 6, n 2
      (1L, t("2024-01-02 09:00:00"), 9.0), // day 2: sum 9, n 1
      (1L, t("2024-01-05 09:00:00"), 1.0), // day 3 (obs): frame still trails by ROWS
      (2L, t("2024-01-01 08:00:00"), 100.0) // other key: its own frame
    ).toDF("user_id", "ts", "value")
    val out = Resample.movingAverage(obs, "user_id", "ts", "value", windowDays = 7)
      .orderBy("user_id", "day")
      .select("user_id", "day", "day_sum", "moving_avg")
      .as[(Long, java.sql.Date, Double, Double)].collect()
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._3).toSeq == Seq(6.0, 9.0, 1.0))
    // trailing means over OBSERVED days (ROWS frame): 6/2, 15/3, 16/4
    assert(u1.map(_._4).toSeq == Seq(3.0, 5.0, 4.0))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq(100.0))

    // frame actually slides: with windowDays=1 each day stands alone
    val solo = Resample.movingAverage(obs, "user_id", "ts", "value", windowDays = 1)
      .orderBy("user_id", "day").select("moving_avg").as[Double].collect()
    assert(solo.toSeq == Seq(3.0, 9.0, 1.0, 100.0))
  }

  test("plan: grid explode is row-local; one key exchange feeds join and fill window") {
    val obs = Seq((1L, t("2024-01-01 10:00:00"), 5.0)).toDF("user_id", "ts", "value")
    val plan = Resample.dailyFfill(obs, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"grid must not cross-join:\n$plan")
  }
}
