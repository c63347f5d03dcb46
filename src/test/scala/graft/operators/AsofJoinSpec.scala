package graft.operators

import java.time.LocalDateTime

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = LocalDateTime.parse(s)

  test("backward as-of: latest right at or before each left ts, null when none") {
    val quotes = Seq( // (key, ts, price)
      ("A", t("2026-01-01T10:00:00"), 1.0),
      ("A", t("2026-01-01T10:05:00"), 2.0),
      ("B", t("2026-01-01T10:02:00"), 9.0)
    ).toDF("sym", "ts", "price")
    val trades = Seq(
      ("A", t("2026-01-01T09:59:00"), 100L), // before any quote -> null
      ("A", t("2026-01-01T10:00:00"), 101L), // tie -> matches 1.0 (>= semantics)
      ("A", t("2026-01-01T10:04:59"), 102L),
      ("A", t("2026-01-01T10:06:00"), 103L),
      ("B", t("2026-01-01T10:03:00"), 104L)
    ).toDF("sym", "ts", "trade_id")

    val out = AsofJoin.asofBackward(trades, quotes, "sym", "ts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("price_right"))).toMap
    assert(out(100L).isEmpty)
    assert(out(101L).contains(1.0))
    assert(out(102L).contains(1.0))
    assert(out(103L).contains(2.0))
    assert(out(104L).contains(9.0))
  }

  test("matched right row's NULL payload stays NULL (no stale fallback) and multi-column payloads stay atomic") {
    // quote at 10:02 has a null bid but a real venue; ASOF semantics
    // return THAT row's values — never 10:00's bid with 10:02's venue
    val quotes = Seq(
      ("A", t("2026-01-01T10:00:00"), Option(1.0), Option("X")),
      ("A", t("2026-01-01T10:02:00"), None, Option("Y")),
      ("A", t("2026-01-01T10:04:00"), Option(3.0), None)
    ).toDF("sym", "ts", "bid", "venue")
    val trades = Seq(
      ("A", t("2026-01-01T10:03:00"), 1L), // matches the null-bid row
      ("A", t("2026-01-01T10:05:00"), 2L)  // matches the null-venue row
    ).toDF("sym", "ts", "trade_id")

    val out = AsofJoin.asofBackward(trades, quotes, "sym", "ts", Seq("bid", "venue"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        ((Option(r.getAs[Any]("bid_right")), Option(r.getAs[Any]("venue_right"))))).toMap
    assert(out(1L) == ((None, Some("Y"))), s"expected matched row's NULL bid, got ${out(1L)}")
    assert(out(2L) == ((Some(3.0), None)), s"expected matched row's NULL venue, got ${out(2L)}")
  }

  test("tie-break orders by the raw column type (string ids stay deterministic)") {
    // two quotes at the SAME (key, ts): the greater string id wins
    val quotes = Seq(
      ("A", t("2026-01-01T10:00:00"), 1.0, "q-b"),
      ("A", t("2026-01-01T10:00:00"), 2.0, "q-a")
    ).toDF("sym", "ts", "price", "qid")
    val trades = Seq(("A", t("2026-01-01T10:00:00"), 1L)).toDF("sym", "ts", "trade_id")
    val out = AsofJoin.asofBackward(trades, quotes, "sym", "ts", Seq("price"),
      tieBreak = Some("qid")).collect()
    assert(out.head.getAs[Double]("price_right") == 1.0) // "q-b" sorts last
  }

  test("plan is one keyed shuffle + window, no nested-loop join") {
    val quotes = Seq(("A", t("2026-01-01T10:00:00"), 1.0)).toDF("sym", "ts", "price")
    val trades = Seq(("A", t("2026-01-01T10:01:00"), 1L)).toDF("sym", "ts", "trade_id")
    val plan = AsofJoin.asofBackward(trades, quotes, "sym", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range explosion:\n$plan")
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
  }

  test("forward as-of: earliest right at or after each left ts; equal-ts ties pick min tieBreak") {
    val quotes = Seq(
      ("A", t("2026-01-01T10:00:00"), 1.0, 10L),
      ("A", t("2026-01-01T10:05:00"), 2.0, 11L),
      ("A", t("2026-01-01T10:05:00"), 3.0, 12L), // same instant, larger id
      ("B", t("2026-01-01T10:02:00"), 9.0, 13L)
    ).toDF("sym", "ts", "price", "qid")
    val trades = Seq(
      ("A", t("2026-01-01T09:59:00"), 100L), // next is 10:00 -> 1.0
      ("A", t("2026-01-01T10:00:00"), 101L), // tie -> 1.0 (>= inclusive)
      ("A", t("2026-01-01T10:01:00"), 102L), // next 10:05, min qid -> 2.0
      ("A", t("2026-01-01T10:06:00"), 103L), // nothing after -> null
      ("B", t("2026-01-01T10:03:00"), 104L)  // nothing after -> null
    ).toDF("sym", "ts", "trade_id")
    val out = AsofJoin.asofForward(trades, quotes, "sym", "ts", Seq("price"),
        tieBreak = Some("qid"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("price_right"))).toMap
    assert(out(100L).contains(1.0))
    assert(out(101L).contains(1.0))
    assert(out(102L).contains(2.0))
    assert(out(103L).isEmpty)
    assert(out(104L).isEmpty)
  }

  test("tolerance nulls a match outside the window, in both directions") {
    val quotes = Seq(("A", t("2026-01-01T10:00:00"), 1.0)).toDF("sym", "ts", "price")
    val trades = Seq(
      ("A", t("2026-01-01T10:30:00"), 1L), // 30 min after the quote
      ("A", t("2026-01-01T12:00:00"), 2L) // 2 h after
    ).toDF("sym", "ts", "trade_id")
    val back = AsofJoin.asofBackward(trades, quotes, "sym", "ts", Seq("price"),
        tolerance = Some("1 HOUR"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("price_right"))).toMap
    assert(back(1L).contains(1.0) && back(2L).isEmpty)
    val fwdTrades = Seq(
      ("A", t("2026-01-01T09:45:00"), 3L), // 15 min before the quote
      ("A", t("2026-01-01T08:00:00"), 4L) // 2 h before
    ).toDF("sym", "ts", "trade_id")
    val fwd = AsofJoin.asofForward(fwdTrades, quotes, "sym", "ts", Seq("price"),
        tolerance = Some("30 MINUTE"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("price_right"))).toMap
    assert(fwd(3L).contains(1.0) && fwd(4L).isEmpty)
  }
}
