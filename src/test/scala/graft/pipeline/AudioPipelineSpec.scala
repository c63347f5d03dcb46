package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.operators.Multimodal

class AudioPipelineSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = AudioPipeline.resetTreadmill(spark)

  /** Deterministic payload of `halves` 48-byte half-windows: with
    * window 96 / hop 48 it yields halves−1 overlapping windows. A
    * re-encode reuses the seed (identical windows); a CLIP drops the
    * first `cutHalves` half-windows (a hop-aligned suffix, so its
    * window set is a subset of the source's). */
  private def pay(seed: Int, halves: Int = 6): Array[Byte] =
    Array.tabulate(48 * halves)(i => (33 + (seed * 31 + i * 7) % 90).toByte)

  private def clip(seed: Int, cutHalves: Int, halves: Int = 6): Array[Byte] =
    pay(seed, halves).drop(48 * cutHalves)

  private def audio(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("audio_id", "bytes")
      .select($"audio_id", lit("audio").as("kind"), lit("raw").as("format"), $"bytes")

  test("bootstrap self-dedups; second batch reconciles re-encodes AND clips against the STORED index only") {
    // slice 1: two originals + an in-batch re-encode of the first
    val r1 = AudioPipeline.ingestBatch(spark,
      audio(1L -> pay(1), 2L -> pay(2), 3L -> pay(1)))
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("tier_audio") == 0L) // bootstrap
    assert(r1.metrics("batch_in") == 3L && r1.metrics("batch_kept") == 2L,
      r1.metrics.toString)
    assert(spark.table(AudioPipeline.TierTable).select("audio_id")
      .as[Long].collect().toSet == Set(1L, 2L))

    // slice 2: a RE-ENCODE of tier clip 2 (jaccard 1), a CLIP of tier
    // clip 1 (3 of 5 windows: jaccard 0.6 — misses; containment 1 —
    // catches), and a fresh original
    val r2 = AudioPipeline.ingestBatch(spark,
      audio(10L -> pay(2), 11L -> clip(1, cutHalves = 2), 12L -> pay(7)))
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("batch_kept") == 1L && r2.metrics("batch_dropped") == 2L,
      r2.metrics.toString)
    val tier = spark.table(AudioPipeline.TierTable).select("audio_id").as[Long].collect().toSet
    assert(tier == Set(1L, 2L, 12L), tier.toString)

    // the stored index carries each tier clip's DISTINCT window-hash
    // set, equal to a fresh re-derivation from the tier arrays
    val idx = spark.table(AudioPipeline.WindowIndexTable)
    val fresh = Multimodal.audioIndex(spark.table(AudioPipeline.TierTable))
      .as[(Long, Long)].collect().toSet
    assert(idx.select("audio_id", "window_hash").as[(Long, Long)].collect().toSet == fresh)
  }

  test("tier equals batch-global audioDedup across slices (convergence contract)") {
    val all = audio(1L -> pay(1), 2L -> pay(2), 3L -> pay(3),
      20L -> pay(1), 21L -> pay(4), 22L -> pay(4), 23L -> clip(3, 2))
    val r1 = AudioPipeline.ingestBatch(spark,
      audio(1L -> pay(1), 2L -> pay(2), 3L -> pay(3)))
    val r2 = AudioPipeline.ingestBatch(spark,
      audio(20L -> pay(1), 21L -> pay(4), 22L -> pay(4), 23L -> clip(3, 2)))
    assert(r1.ok && r2.ok)
    val expected = Multimodal.audioDedup(Multimodal.audioHashes(all))
      .select("audio_id").as[Long].collect().toSet
    val tier = spark.table(AudioPipeline.TierTable).select("audio_id").as[Long].collect().toSet
    assert(tier == expected, s"$tier vs $expected")
  }

  test("an undecodable payload passes through as a singleton, never deleted") {
    val r = AudioPipeline.ingestBatch(spark,
      audio(1L -> pay(1), 2L -> Array.empty[Byte]))
    assert(r.ok, r.stages.toString)
    val tier = spark.table(AudioPipeline.TierTable)
      .collect().map(row => row.getAs[Long]("audio_id") ->
        Option(row.getSeq[Long](1)).getOrElse(Seq.empty).size).toMap
    assert(tier.keySet == Set(1L, 2L), tier.toString)
    assert(tier(2L) == 0, s"corrupt clip keeps an EMPTY hash set: $tier")
    // no index rows for the empty set
    assert(spark.table(AudioPipeline.WindowIndexTable)
      .filter(col("audio_id") === 2L).count() == 0L)
  }

  private def caps(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("audio_id", "caption", "score")

  test("transcript treadmill: a better transcript on a dropped clip replaces; convergence to batch-global") {
    val r1 = AudioPipeline.ingestBatch(spark,
      audio(1L -> pay(1), 2L -> pay(2)),
      captions = Some(caps((1L, "rough transcript", 0.3), (2L, "b roll audio", 0.5))))
    assert(r1.ok && r1.metrics("caption_components_touched") == 2L, r1.metrics.toString)
    // a CLIP of tier clip 1 (dropped by containment) carries the better
    // transcript — it must replace; a re-encode of 2 a worse one
    val r2 = AudioPipeline.ingestBatch(spark,
      audio(10L -> clip(1, 2), 11L -> pay(2), 12L -> pay(7)),
      captions = Some(caps((10L, "clean studio transcript", 0.9),
        (11L, "noisy auto-sub", 0.1), (12L, "fresh recording", 0.6))))
    assert(r2.ok && r2.metrics("bridged_components") == 0L, r2.metrics.toString)
    val got = spark.table(AudioPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("audio_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got(1L) == (("clean studio transcript", 10L, 1L)), got.toString)
    assert(got(2L) == (("b roll audio", 2L, 1L)), got.toString)
    assert(got(12L) == (("fresh recording", 12L, 0L)), got.toString)
    // convergence: equals the fold against an empty store over ONE
    // closure of all clips + transcripts (batch-global keep-best)
    val allSets = Multimodal.audioHashes(audio(1L -> pay(1), 2L -> pay(2),
      10L -> clip(1, 2), 11L -> pay(2), 12L -> pay(7)))
    val comps = graft.operators.Components.connectedComponents(
      Multimodal.audioNearDupPairs(allSets).select("a_id", "b_id"))
    val emptyStored = Seq.empty[(Long, String, Long, Option[Double], Long)]
      .toDF("media_id", "kept_caption", "kept_from", "kept_score", "dropped_count")
    val allCaps = caps((1L, "rough transcript", 0.3), (2L, "b roll audio", 0.5),
      (10L, "clean studio transcript", 0.9), (11L, "noisy auto-sub", 0.1),
      (12L, "fresh recording", 0.6))
    val want = Multimodal.captionKeepBestAgainst(comps, emptyStored,
        allCaps.withColumnRenamed("audio_id", "media_id"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got == want, s"$got vs $want")
  }

  test("transcript treadmill: a REDELIVERED batch folds as a no-op (at-least-once replay safety)") {
    val r1 = AudioPipeline.ingestBatch(spark,
      audio(1L -> pay(1), 2L -> pay(2)),
      captions = Some(caps((1L, "first cut", 0.3), (2L, "second cut", 0.5))))
    assert(r1.ok, r1.stages.toString)
    val slice2 = audio(10L -> pay(1), 11L -> pay(7))
    val caps2 = caps((10L, "studio master", 0.9), (11L, "fresh recording", 0.6))
    val r2 = AudioPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r2.ok && r2.metrics("caption_replay_skipped") == 0L, r2.metrics.toString)
    val before = spark.table(AudioPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("audio_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    val r3 = AudioPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r3.ok, r3.stages.toString)
    assert(r3.metrics("tier_audio_after") == 3L, r3.metrics.toString)
    assert(r3.metrics("caption_replay_skipped") == 2L, r3.metrics.toString)
    assert(r3.metrics("caption_components_touched") == 0L, r3.metrics.toString)
    val after = spark.table(AudioPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("audio_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    assert(after == before, s"$after vs $before")
  }

  test("captioned streamIngest: restart drains fold transcripts into stored winners") {
    val land = java.nio.file.Files.createTempDirectory("ap_land").toString
    val cp = java.nio.file.Files.createTempDirectory("ap_cp").toString
    def landed(rows: Seq[(Long, Array[Byte], String, Double)]) =
      rows.toDF("audio_id", "bytes", "caption", "score")
        .select($"audio_id", lit("audio").as("kind"), lit("raw").as("format"),
          $"bytes", $"caption", $"score")
    landed(Seq((1L, pay(1), "first", 0.4), (2L, pay(2), "second", 0.5)))
      .coalesce(1).write.mode("append").parquet(land)
    assert(AudioPipeline.streamIngest(spark, land, cp, captioned = true)
      .awaitTermination(120000))
    assert(spark.table(AudioPipeline.TierTable).count() == 2L)
    // slice 2 (restart): a re-encode of tier clip 1 carries the better
    // transcript
    landed(Seq((10L, pay(1), "better first", 0.9)))
      .coalesce(1).write.mode("append").parquet(land)
    assert(AudioPipeline.streamIngest(spark, land, cp, captioned = true)
      .awaitTermination(120000))
    val got = spark.table(AudioPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("audio_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(got == Map(1L -> "better first", 2L -> "second"), got.toString)
  }
}
