package graft.streaming

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{EventGenerator, JsonIngest, PartitionedJsonSink}

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def landHour(root: String, nthHour: Int, n: Int, seed: Long): Unit =
    PartitionedJsonSink.write(
      EventGenerator.events(spark, n, seed, startEpochSeconds = 1735689600L + nthHour * 3600L),
      root)

  private def writeGz(path: String, lines: Seq[String]): Unit = {
    val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
    out.write(lines.mkString("\n").getBytes)
    out.close()
  }

  test("AvailableNow drains landed partitions incl. corrupt rows; checkpoint restart reads only new files") {
    val root = Files.createTempDirectory("graft_stream").toString
    val cp = Files.createTempDirectory("graft_cp").toString
    landHour(root, 0, 60, seed = 1)
    landHour(root, 1, 40, seed = 2)
    // one malformed line, hand-landed in hour 1
    val h1 = PartitionedJsonSink.hourPath(root, LocalDateTime.of(2025, 1, 1, 1, 0))
    writeGz(s"$h1/manual-bad.json.gz", Seq("""{"event_id": broken"""))

    var batches = List.empty[(Long, Long, Long)] // (batchId, parsed, corrupt)
    def run(): Unit = {
      val q = StreamIngest.runAvailableNow(
        StreamIngest.stream(spark, root), cp,
        (df, id) => {
          val parsed = df.filter($"event_id".isNotNull).count()
          val corrupt = JsonIngest.corruptCount(df)
          batches ::= (id, parsed, corrupt)
        })
      q.awaitTermination(120000)
    }

    run()
    assert(batches.map(_._2).sum == 100L, s"parsed rows: $batches")
    assert(batches.map(_._3).sum == 1L, s"corrupt rows: $batches")

    // restart with the same checkpoint: nothing new -> no reprocessing
    val before = batches
    run()
    assert(batches.map(_._2).sum == 100L, "restart re-read already-committed files")

    // land a new hour, restart: exactly the new rows arrive
    landHour(root, 2, 25, seed = 3)
    run()
    assert(batches.map(_._2).sum == 125L, s"expected only the 25 new rows: $batches")
    assert(batches.size > before.size)
  }

  test("windowedCounts: watermarked tumbling window over the stream (O4/O5)") {
    val root = Files.createTempDirectory("graft_win").toString
    val cp = Files.createTempDirectory("graft_wincp").toString
    landHour(root, 0, 90, seed = 5) // 90 events over 90 s -> one 1-hour window
    // append mode would only emit windows the watermark has closed —
    // with a single AvailableNow drain nothing closes, so observe the
    // running state via complete mode (the watermark is then advisory).
    val q = StreamIngest.windowedCounts(StreamIngest.stream(spark, root))
      .writeStream.format("memory").queryName("win_complete").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("win_complete").collect()
    assert(rows.map(_.getAs[Long]("event_count")).sum == 90L)
    // all events fall in the 00:00-01:00 window
    assert(rows.forall(_.getAs[java.time.LocalDateTime]("window_start") ==
      java.time.LocalDateTime.of(2025, 1, 1, 0, 0)))
  }

  test("slidingCounts: every event lands in exactly window/slide overlapping windows") {
    val root = Files.createTempDirectory("graft_slide").toString
    val cp = Files.createTempDirectory("graft_slidecp").toString
    landHour(root, 0, 90, seed = 6) // 90 events in the first 90 s
    val q = StreamIngest.slidingCounts(StreamIngest.stream(spark, root))
      .writeStream.format("memory").queryName("slide_complete").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("slide_complete").collect()
    // 1 h / 15 min = 4 windows per event — total count is exactly 4×
    assert(rows.map(_.getAs[Long]("event_count")).sum == 4 * 90L)
    // the 90 s of events at 00:00.. fall in windows starting 23:00,
    // 23:15, 23:30, 23:45 (prev day) and 00:00 — starts are 15-min aligned
    val starts = rows.map(_.getAs[java.time.LocalDateTime]("window_start")).distinct
    assert(starts.forall(s => s.getMinute % 15 == 0 && s.getSecond == 0))
    assert(starts.length >= 4, s"expected >= 4 overlapping windows, got ${starts.toSeq}")
  }

  test("sessionCounts: streaming session_window matches the batch twin") {
    val root = Files.createTempDirectory("graft_sess").toString
    val cp = Files.createTempDirectory("graft_sesscp").toString
    landHour(root, 0, 60, seed = 9)
    val q = StreamIngest.sessionCounts(StreamIngest.stream(spark, root))
      .writeStream.format("memory").queryName("sess_complete").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_complete").collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[java.time.LocalDateTime]("session_start"),
        r.getAs[java.time.LocalDateTime]("session_end"), r.getAs[Long]("event_count"))).toSet

    val batch = graft.sources.JsonIngest.readJson(spark, root)
      .filter($"event_id".isNotNull)
      .select($"user_id", $"event_timestamp")
      .groupBy($"user_id",
        org.apache.spark.sql.functions.session_window($"event_timestamp".cast("timestamp"), "30 minutes"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("event_count"))
      .select($"user_id",
        $"session_window.start".cast("timestamp_ntz").as("s"),
        $"session_window.end".cast("timestamp_ntz").as("e"), $"event_count")
      .collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[java.time.LocalDateTime]("s"),
        r.getAs[java.time.LocalDateTime]("e"), r.getAs[Long]("event_count"))).toSet
    assert(streamed == batch, s"stream/batch session divergence: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    assert(streamed.nonEmpty)
  }

  test("foreachBatch dedup-insert into the curated tier survives checkpoint loss without duplicates (O6)") {
    val root = Files.createTempDirectory("graft_cur").toString
    val curated = Files.createTempDirectory("graft_cur_out").toString + "/events"
    landHour(root, 0, 40, seed = 11)

    def insertBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val parsed = df.filter($"event_id".isNotNull)
        .select("event_id", "event_timestamp", "event_type", "user_id")
      val target =
        if (new java.io.File(curated).exists) spark.read.parquet(curated)
        else parsed.limit(0)
      graft.operators.EventOps
        .dedupInsert(parsed.dropDuplicates("event_id"), target)
        .write.mode("append").parquet(curated)
    }

    val cp1 = Files.createTempDirectory("graft_curcp1").toString
    val q1 = StreamIngest.runAvailableNow(StreamIngest.stream(spark, root), cp1, insertBatch)
    q1.awaitTermination(120000)
    assert(spark.read.parquet(curated).count() == 40L)

    // LOSE the checkpoint (fresh cp dir): the stream re-reads everything,
    // but the anti-join keeps the curated tier exactly-once.
    val cp2 = Files.createTempDirectory("graft_curcp2").toString
    landHour(root, 1, 15, seed = 12)
    val q2 = StreamIngest.runAvailableNow(StreamIngest.stream(spark, root), cp2, insertBatch)
    q2.awaitTermination(120000)
    val out = spark.read.parquet(curated)
    assert(out.count() == 55L, s"duplicates after checkpoint loss: ${out.count()}")
    assert(out.groupBy("event_id").count().filter($"count" > 1).count() == 0L)
  }

  test("dedupEvents drops in-stream redeliveries, keeps distinct keys, bounds state by watermark") {
    val root = Files.createTempDirectory("graft_sdedup").toString
    val cp = Files.createTempDirectory("graft_sdedup_cp").toString
    // land the same 50 events twice (separate files, same ids) plus one
    // unique extra — the rescan-redelivery shape
    landHour(root, 0, 50, seed = 7)
    landHour(root, 0, 50, seed = 7) // identical generator output, new files
    landHour(root, 1, 30, seed = 8)

    val q = StreamIngest.dedupEvents(StreamIngest.stream(spark, root))
      .filter($"event_id".isNotNull)
      .select("event_id")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    assert(q.awaitTermination(120000), "drain timed out")

    val out = spark.table("sdedup_out").as[String].collect()
    assert(out.length == out.distinct.length, "emitted a duplicate key")
    assert(out.length == 80, s"expected 50 + 30 distinct ids, got ${out.length}")
  }

  test("maxFileAge ignores stale files discovered after the first batch (O8)") {
    val root = Files.createTempDirectory("graft_age").toString
    val cp = Files.createTempDirectory("graft_agecp").toString
    landHour(root, 0, 20, seed = 13)

    var rows = 0L
    def drain(): Unit = {
      val q = StreamIngest.runAvailableNow(
        StreamIngest.stream(spark, root, maxFileAge = Some("24h")), cp,
        (df, _) => { rows += df.count(); () })
      q.awaitTermination(120000)
    }
    drain()
    assert(rows == 20L) // first batch: everything is valid regardless of age

    // a stale landing (mtime 72 h back) appearing later is outside the
    // retention window and must be skipped; a fresh one is picked up
    landHour(root, 1, 15, seed = 14)
    val h1 = PartitionedJsonSink.hourPath(root, LocalDateTime.of(2025, 1, 1, 1, 0))
    Files.walk(java.nio.file.Paths.get(h1)).iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".gz"))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 72L * 3600 * 1000))
    }
    landHour(root, 2, 10, seed = 15)
    drain()
    assert(rows == 30L, s"stale landing should be outside maxFileAge; total rows $rows")
  }

  test("totalInputRows sums progress metrics (A4)") {
    val root = Files.createTempDirectory("graft_a4").toString
    val cp = Files.createTempDirectory("graft_a4cp").toString
    landHour(root, 0, 30, seed = 9)
    // the body must run an action — an unconsumed micro-batch reads 0 rows
    val q = StreamIngest.runAvailableNow(StreamIngest.stream(spark, root), cp, (df, _) => { df.count(); () })
    q.awaitTermination(120000)
    assert(StreamIngest.totalInputRows(q) == 30L)
  }

  test("intervalJoin pairs per key within [ts, ts+within], boundaries inclusive") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val views = Seq(("v1", t("2024-01-01 10:00:00"), "u1"), ("v2", t("2024-01-01 10:00:00"), "u2"))
      .toDF("event_id", "event_timestamp", "user_id")
    val buys = Seq(
      ("p1", t("2024-01-01 10:00:00"), "u1"), // exactly at view ts — included
      ("p2", t("2024-01-01 11:00:00"), "u1"), // exactly at +1h bound — included
      ("p3", t("2024-01-01 11:00:01"), "u1"), // 1s past — excluded
      ("p4", t("2024-01-01 09:59:59"), "u1"), // before the view — excluded
      ("p5", t("2024-01-01 10:30:00"), "u2") // other key
    ).toDF("event_id", "event_timestamp", "user_id")
    val out = StreamIngest.intervalJoin(views, buys, "user_id", "1 HOUR",
        leftPrefix = "v_", rightPrefix = "p_")
      .select("v_event_id", "p_event_id").as[(String, String)].collect().toSet
    assert(out == Set(("v1", "p1"), ("v1", "p2"), ("v2", "p5")))
  }

  test("enrichWithDim left-joins dim attributes; unmatched keys keep null") {
    import spark.implicits._
    val events = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("event_id", "user_id")
    val dim = Seq((10L, "alpha"), (20L, "beta")).toDF("k", "name")
    val out = StreamIngest.enrichWithDim(events, dim, $"user_id", $"k", Seq($"name"))
      .orderBy("event_id").select("event_id", "name")
      .as[(Long, Option[String])].collect()
    assert(out.toSeq == Seq((1L, Some("alpha")), (2L, Some("beta")), (3L, None)))
    // inner drops the miss
    assert(StreamIngest.enrichWithDim(events, dim, $"user_id", $"k", Seq($"name"),
      joinType = "inner").count() == 2)
  }
}
