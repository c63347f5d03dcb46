package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.operators.Multimodal

class VideoPipelineSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = VideoPipeline.resetTreadmill(spark)

  /** Deterministic 40-byte frame payload per (video seed, frame no) —
    * distinct seeds give disjoint frame-hash sets, a re-mux reuses the
    * SOURCE seed (identical payloads → identical hashes), a trim takes
    * a suffix of the source's frames. */
  private def fp(seed: Int, k: Int): Array[Byte] =
    Array.tabulate(40)(i => (33 + (seed * 31 + k * 17 + i * 7) % 90).toByte)

  private def video(id: Long, seed: Int, from: Int = 0, n: Int = 8) =
    (from until from + n).map(k => (id, k - from, fp(seed, k)))

  private def frames(rows: Seq[(Long, Int, Array[Byte])]) =
    rows.toDF("video_id", "frame_no", "bytes")
      .select($"video_id", $"frame_no", lit("image").as("kind"),
        lit("raw").as("format"), $"bytes")

  test("bootstrap self-dedups; second batch reconciles re-muxes AND trims against the STORED index only") {
    // slice 1: two originals + an in-batch re-mux of the first
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(video(1L, seed = 1) ++ video(2L, seed = 2) ++ video(3L, seed = 1)))
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("tier_videos") == 0L) // bootstrap
    assert(r1.metrics("batch_in") == 3L && r1.metrics("batch_kept") == 2L,
      r1.metrics.toString)
    assert(spark.table(VideoPipeline.TierTable).select("video_id")
      .as[Long].collect().toSet == Set(1L, 2L))

    // slice 2: a RE-MUX of tier video 2 (jaccard 1), a TRIM of tier
    // video 1 (frames 2..7: jaccard 0.75 — misses; containment 1 —
    // catches), and a fresh original
    val r2 = VideoPipeline.ingestBatch(spark,
      frames(video(10L, seed = 2) ++ video(11L, seed = 1, from = 2, n = 6) ++
        video(12L, seed = 7)))
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("batch_kept") == 1L && r2.metrics("batch_dropped") == 2L,
      r2.metrics.toString)
    val tier = spark.table(VideoPipeline.TierTable).select("video_id").as[Long].collect().toSet
    assert(tier == Set(1L, 2L, 12L), tier.toString)

    // the stored index carries each tier video's DISTINCT hash set,
    // id-for-id, equal to a fresh re-derivation from the tier arrays
    val idx = spark.table(VideoPipeline.FrameIndexTable)
    val fresh = Multimodal.videoIndex(spark.table(VideoPipeline.TierTable))
      .as[(Long, Long)].collect().toSet
    assert(idx.select("video_id", "frame_hash").as[(Long, Long)].collect().toSet == fresh)
  }

  test("tier equals batch-global videoDedup across slices (convergence contract)") {
    val all = video(1L, 1) ++ video(2L, 2) ++ video(3L, 3) ++
      video(20L, 1) ++ video(21L, 4) ++ video(22L, 4) ++
      video(23L, 3, from = 2, n = 6)
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(video(1L, 1) ++ video(2L, 2) ++ video(3L, 3)))
    val r2 = VideoPipeline.ingestBatch(spark,
      frames(video(20L, 1) ++ video(21L, 4) ++ video(22L, 4) ++
        video(23L, 3, from = 2, n = 6)))
    assert(r1.ok && r2.ok)
    val expected = Multimodal.videoDedup(Multimodal.frameHashes(frames(all)))
      .select("video_id").as[Long].collect().toSet
    val tier = spark.table(VideoPipeline.TierTable).select("video_id").as[Long].collect().toSet
    assert(tier == expected, s"$tier vs $expected")
  }

  test("a batch video matching only a tier LOSER's surviving canonical still collapses") {
    // the index stores SURVIVORS: a later re-mux of a dropped in-batch
    // duplicate must still reconcile through the kept canonical
    // (identical frame sets → same index rows)
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(video(1L, seed = 5) ++ video(2L, seed = 5))) // 2 drops, 1 kept
    assert(r1.ok && r1.metrics("batch_kept") == 1L)
    val r2 = VideoPipeline.ingestBatch(spark, frames(video(9L, seed = 5)))
    assert(r2.ok && r2.metrics("batch_kept") == 0L, r2.metrics.toString)
    assert(spark.table(VideoPipeline.TierTable).count() == 1L)
  }

  test("capped cross buckets are REPORTED, never silent") {
    // one shared frame across many tier videos: with maxBucketSize 2
    // the combined population on that frame-hash bucket exceeds the
    // cap — the cross candidates drop and the metric must say so
    val shared = fp(99, 0)
    def withShared(id: Long, seed: Int) =
      Seq((id, 0, shared)) ++ video(id, seed, from = 1, n = 5)
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(withShared(1L, 11) ++ withShared(2L, 12) ++ withShared(3L, 13)),
      maxBucketSize = 2)
    assert(r1.ok)
    assert(r1.metrics("skipped_batch_buckets") == 1L, r1.metrics.toString)
    val r2 = VideoPipeline.ingestBatch(spark, frames(withShared(10L, 14)),
      maxBucketSize = 2)
    assert(r2.ok)
    assert(r2.metrics("skipped_cross_buckets") == 1L, r2.metrics.toString)
  }

  test("streamIngest drains slices through a checkpoint; a RESTART picks up only new files") {
    val land = java.nio.file.Files.createTempDirectory("vp_land").toString
    val cp = java.nio.file.Files.createTempDirectory("vp_cp").toString
    frames(video(1L, 1) ++ video(2L, 2)).coalesce(1)
      .write.mode("append").parquet(land)
    assert(VideoPipeline.streamIngest(spark, land, cp).awaitTermination(120000))
    assert(spark.table(VideoPipeline.TierTable).count() == 2L)
    // slice 2: a re-mux of tier video 1 + a fresh one; restarted query
    frames(video(10L, 1) ++ video(11L, 6)).coalesce(1)
      .write.mode("append").parquet(land)
    assert(VideoPipeline.streamIngest(spark, land, cp).awaitTermination(120000))
    val tier = spark.table(VideoPipeline.TierTable).select("video_id").as[Long].collect().toSet
    assert(tier == Set(1L, 2L, 11L), tier.toString)
    // re-draining with nothing new is a no-op (file checkpoint dedup)
    assert(VideoPipeline.streamIngest(spark, land, cp).awaitTermination(120000))
    assert(spark.table(VideoPipeline.TierTable).count() == 3L)
  }

  private def caps(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("video_id", "caption", "score")

  test("video caption treadmill: a later better caption on a dropped trim replaces; convergence to batch-global") {
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(video(1L, seed = 1) ++ video(2L, seed = 2)),
      captions = Some(caps((1L, "some clip", 0.3), (2L, "b roll", 0.5))))
    assert(r1.ok && r1.metrics("caption_components_touched") == 2L, r1.metrics.toString)
    // slice 2: a TRIM of tier video 1 (dropped by containment) carries
    // the better caption — it must replace; a RE-MUX of 2 carries a
    // worse one — it must not; a fresh video brings its own
    val r2 = VideoPipeline.ingestBatch(spark,
      frames(video(10L, seed = 1, from = 2, n = 6) ++ video(11L, seed = 2) ++
        video(12L, seed = 7)),
      captions = Some(caps((10L, "the director's cut", 0.9),
        (11L, "shaky remux", 0.1), (12L, "fresh footage", 0.6))))
    assert(r2.ok && r2.metrics("bridged_components") == 0L, r2.metrics.toString)
    val got = spark.table(VideoPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("video_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got(1L) == (("the director's cut", 10L, 1L)), got.toString)
    assert(got(2L) == (("b roll", 2L, 1L)), got.toString)
    assert(got(12L) == (("fresh footage", 12L, 0L)), got.toString)
    // convergence: equals batch-global captionKeepBest over the video
    // closure of ALL videos + captions (keep-best is an associative
    // min — the media treadmill's contract on the video id space)
    val allVids = Multimodal.frameHashes(frames(
      video(1L, 1) ++ video(2L, 2) ++ video(10L, 1, from = 2, n = 6) ++
        video(11L, 2) ++ video(12L, 7)))
    val comps = graft.operators.Components.connectedComponents(
      Multimodal.videoNearDupPairs(allVids).select("a_id", "b_id"))
    val allCaps = caps((1L, "some clip", 0.3), (2L, "b roll", 0.5),
      (10L, "the director's cut", 0.9), (11L, "shaky remux", 0.1),
      (12L, "fresh footage", 0.6))
    val emptyStored = Seq.empty[(Long, String, Long, Option[Double], Long)]
      .toDF("media_id", "kept_caption", "kept_from", "kept_score", "dropped_count")
    val want = Multimodal.captionKeepBestAgainst(comps, emptyStored,
        allCaps.withColumnRenamed("video_id", "media_id"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got == want, s"$got vs $want")
  }

  test("captioned streamIngest: the caption rides frame 0; restart drains fold into stored winners") {
    val land = java.nio.file.Files.createTempDirectory("vpc_land").toString
    val cp = java.nio.file.Files.createTempDirectory("vpc_cp").toString
    def capFrames(rows: Seq[(Long, Int, Array[Byte])], cs: Map[Long, (String, Double)]) =
      frames(rows).withColumn("caption",
          when($"frame_no" === 0, element_at(
            typedLit(cs.map { case (k, v) => k -> v._1 }), $"video_id"))
            .otherwise(lit(null).cast("string")))
        .withColumn("score",
          when($"frame_no" === 0, element_at(
            typedLit(cs.map { case (k, v) => k -> v._2 }), $"video_id"))
            .otherwise(lit(null).cast("double")))
    capFrames(video(1L, 1) ++ video(2L, 2),
        Map(1L -> ("first", 0.4), 2L -> ("second", 0.5)))
      .coalesce(1).write.mode("append").parquet(land)
    assert(VideoPipeline.streamIngest(spark, land, cp, captioned = true)
      .awaitTermination(120000))
    capFrames(video(10L, 1), Map(10L -> ("better first", 0.9)))
      .coalesce(1).write.mode("append").parquet(land)
    assert(VideoPipeline.streamIngest(spark, land, cp, captioned = true)
      .awaitTermination(120000))
    val got = spark.table(VideoPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("video_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(got == Map(1L -> "better first", 2L -> "second"), got.toString)
  }

  test("video caption treadmill: a REDELIVERED batch folds as a no-op (at-least-once replay safety)") {
    // the MediaPipeline watermark contract on the video id space: a
    // foreachBatch redelivery (crash after merge, before checkpoint
    // commit) must not fold the same candidates a second time
    val r1 = VideoPipeline.ingestBatch(spark,
      frames(video(1L, seed = 1) ++ video(2L, seed = 2)),
      captions = Some(caps((1L, "some clip", 0.3), (2L, "b roll", 0.5))))
    assert(r1.ok, r1.stages.toString)
    val slice2 = frames(video(10L, seed = 1) ++ video(11L, seed = 7))
    val caps2 = caps((10L, "remux take", 0.9), (11L, "fresh footage", 0.6))
    val r2 = VideoPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r2.ok && r2.metrics("caption_replay_skipped") == 0L, r2.metrics.toString)
    val before = spark.table(VideoPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    val r3 = VideoPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r3.ok, r3.stages.toString)
    // the redelivered video ids dedup at the APPEND (insertAppendOnce);
    // the caption fold must skip them BEFORE the merge via the watermark
    assert(r3.metrics("tier_videos_after") == 3L, r3.metrics.toString)
    assert(r3.metrics("caption_replay_skipped") == 2L, r3.metrics.toString)
    assert(r3.metrics("caption_components_touched") == 0L, r3.metrics.toString)
    val after = spark.table(VideoPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("video_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    assert(after == before, s"$after vs $before")
  }
}
