package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream — the funnel /
  * retention layer a product warehouse builds on the curated events
  * tier (the reference stops at daily summaries; these are the next
  * two dashboards every consumer of that table asks for).
  *
  * Scale discipline:
  *  - the funnel is one stage-filtered aggregate per step joined on the
  *    user key — every join is an equi-join on `user`, co-partitioned
  *    after the first shuffle, and each stage's frame only ever holds
  *    users who survived the previous stage (monotonically shrinking);
  *  - retention reduces the corpus to the distinct (user, cohort, week)
  *    activity set FIRST (partial-aggregated), so the wide countDistinct
  *    never sees raw events;
  *  - everything output is exact integer counts — no floats anywhere.
  */
object Behavior {

  /** Strictly-ordered funnel: stage i counts users whose earliest
    * stage-i event happens at-or-after their earliest qualifying
    * stage-(i-1) event. Emits (stage_idx, stage, users) with
    * stage_idx 1-based in the given order. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // per-stage earliest qualifying timestamp per user, chained; each
    // stage frame is checkpointed so stage i's lineage doesn't
    // re-evaluate stages 1..i−1 (and the final union is ONE job, not a
    // driver-side count per stage)
    var reached = List.empty[(String, DataFrame)]
    stages.foreach { stage =>
      val ev = events.filter(col(typeCol) === stage)
        .select(col(userCol).as("__u"), col(tsCol).as("__t"))
      val qualified = reached.headOption match {
        case None => ev
        case Some((_, prev)) =>
          ev.join(prev.select(col("__u"), col("__ts").as("__prev")), Seq("__u"))
            .filter(col("__t") >= col("__prev"))
            .select("__u", "__t")
      }
      val first = qualified.groupBy("__u").agg(min(col("__t")).as("__ts"))
        .localCheckpoint(true)
      reached ::= (stage, first)
    }
    // scalar aggregates, not groupBy-after-union: a stage nobody
    // reaches must still report users = 0 (a grouped count would drop
    // the row entirely — and diverge from SQL's scalar COUNT(*))
    reached.reverse.zipWithIndex.map { case ((stage, df), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"), col("users"))
    }.reduce(_ unionByName _)
  }

  /** Retention matrix: users are cohorted by their FIRST active day
    * (no week truncation — `(day − first_day) / 7` integer arithmetic
    * is engine-neutral where date_trunc('week') is not), and each
    * (cohort_day, week_offset) cell counts the distinct users active
    * that week. Exact integers end-to-end. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val days = events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
    val first = days.groupBy("__u").agg(min(col("__d")).as("cohort_day"))
    val active = days.join(first, Seq("__u"))
      .select(col("__u"), col("cohort_day"),
        floor(datediff(col("__d"), col("cohort_day")) / 7).cast("long").as("week_offset"))
      .distinct()
    active.groupBy("cohort_day", "week_offset")
      .agg(count(lit(1)).as("active_users"))
  }
}
