package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.operators.Multimodal

class MediaPipelineSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = MediaPipeline.resetTreadmill(spark)

  /** 96-byte ASCII payloads: the dHash grid reads bytes 0..71, so a
    * "re-encode" shares the first 72 bytes and differs in the tail
    * (hamming 0) — the phash gate fixture's shape. */
  private def payload(seed: Int): Array[Byte] =
    Array.tabulate(96)(i => (33 + (seed * 31 + i * 7) % 90).toByte)

  private def reencode(seed: Int): Array[Byte] = {
    val p = payload(seed)
    (0 until 24).foreach(i => p(72 + i) = (33 + (seed * 13 + i) % 90).toByte)
    p
  }

  private def media(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "bytes")
      .select($"media_id", lit("image").as("kind"), lit("raw").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), $"bytes")

  test("bootstrap self-dedups, second batch reconciles against the STORED index only") {
    val slice1 = media(1L -> payload(1), 2L -> payload(2), 3L -> reencode(1))
    val r1 = MediaPipeline.ingestBatch(spark, slice1)
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("tier_media") == 0L) // bootstrap
    assert(r1.metrics("batch_kept") == 2L && r1.metrics("batch_dropped") == 1L,
      r1.metrics.toString) // the in-batch re-encode collapses to min id
    assert(spark.table(MediaPipeline.TierTable).select("media_id")
      .as[Long].collect().toSet == Set(1L, 2L))

    // slice 2: a re-encode of a TIER asset (cross dup: must reconcile
    // against the stored index), a fresh asset, and an in-batch pair
    val slice2 = media(10L -> reencode(2), 11L -> payload(7), 12L -> reencode(7))
    val r2 = MediaPipeline.ingestBatch(spark, slice2)
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("batch_kept") == 1L && r2.metrics("batch_dropped") == 2L,
      r2.metrics.toString)
    val tier = spark.table(MediaPipeline.TierTable).select("media_id").as[Long].collect().toSet
    assert(tier == Set(1L, 2L, 11L), tier.toString)

    // the index covers the tier 4 chunk rows per asset, id-for-id, and
    // equals a fresh hash of the tier (nothing stale, nothing extra)
    val idx = spark.table(MediaPipeline.PhashIndexTable)
    assert(idx.count() == 4 * tier.size)
    val fresh = Multimodal.phashIndex(spark.table(MediaPipeline.TierTable))
      .select("media_id", "phash", "chunk", "key")
      .as[(Long, Long, Int, Long)].collect().toSet
    val stored = idx.select("media_id", "phash", "chunk", "key")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(stored == fresh)
  }

  test("REAL PNGs through the treadmill: brightness-shifted re-encodes reconcile via the stored index (ImageIoGrid)") {
    // the grid seam composed with the pin/reconcile path: StubGrid is
    // the gate/decade workhorse, so the real decoder must be proven to
    // ride the same ingestBatch machinery — real PNG bytes, a real
    // javax.imageio decode inside the ONE hash pass, cross-slice
    // collapse through the STORED index only
    def img(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xFF; im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def png(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val grid = new Multimodal.ImageIoGrid()
    val diag = png(img(36, 32)((x, y) => 20 + x * 4 + y * 2))
    val rev = png(img(36, 32)((x, y) => 20 + (35 - x) * 4 + y * 2))
    def slice(rows: (Long, Array[Byte])*) =
      rows.toSeq.toDF("media_id", "bytes")
        .select($"media_id", lit("image").as("kind"), lit("png").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"), $"bytes")

    val r1 = MediaPipeline.ingestBatch(spark, slice(1L -> diag, 2L -> rev), grid = grid)
    assert(r1.ok && r1.metrics("batch_kept") == 2L, r1.metrics.toString)

    // slice 2: a +30-brightness RE-RENDER of tier image 1 (different
    // octets, dHash-identical — MultimodalSpec's proven invariance), a
    // 2x UPSCALE of tier image 2 (within hamming 3), a genuinely new
    // image, and a corrupt blob (must not kill the batch)
    val bright = png(img(36, 32)((x, y) => 50 + x * 4 + y * 2))
    val revBig = png(img(72, 64)((x, y) => 20 + (35 - x / 2) * 4 + (y / 2) * 2))
    // fresh image: ascending rows on top, descending below — half the
    // dHash bits flip vs either pure gradient (a y-only gradient would
    // hash all-zeros and COLLIDE with the reversed-x gradient)
    val vert = png(img(36, 32)((x, y) => if (y < 16) 20 + x * 4 else 170 - x * 4))
    val r2 = MediaPipeline.ingestBatch(spark,
      slice(10L -> bright, 11L -> revBig, 12L -> vert,
        13L -> Array[Byte](9, 9, 9)), grid = grid)
    assert(r2.ok, r2.stages.toString)
    val tier = spark.table(MediaPipeline.TierTable).select("media_id").as[Long].collect().toSet
    assert(tier == Set(1L, 2L, 12L, 13L),
      s"re-render and upscale must collapse onto the tier; the fresh image enters; " +
        s"the undecodable blob passes through (null hash never clusters — a corrupt " +
        s"byte must not silently delete an asset): $tier")
    // the corrupt blob contributed NO index rows: the stored index
    // covers exactly the decodable survivors, 4 chunk rows each
    assert(spark.table(MediaPipeline.PhashIndexTable).count() == 4 * 3)
  }

  test("tier equals batch-global phashDedup across slices (convergence contract)") {
    val all = media(
      1L -> payload(1), 2L -> payload(2), 3L -> payload(3),
      20L -> reencode(1), 21L -> payload(4), 22L -> reencode(4), 23L -> reencode(3))
    val r1 = MediaPipeline.ingestBatch(spark, media(
      1L -> payload(1), 2L -> payload(2), 3L -> payload(3)))
    val r2 = MediaPipeline.ingestBatch(spark, media(
      20L -> reencode(1), 21L -> payload(4), 22L -> reencode(4), 23L -> reencode(3)))
    assert(r1.ok && r2.ok)
    val expected = Multimodal.phashDedup(all).select("media_id").as[Long].collect().toSet
    val tier = spark.table(MediaPipeline.TierTable).select("media_id").as[Long].collect().toSet
    assert(tier == expected, s"$tier vs $expected")
  }

  test("capped cross buckets are REPORTED, never silent") {
    // a degenerate family: many assets sharing one phash — with
    // maxBucketSize 2 the combined (chunk, key) population exceeds the
    // cap and the skip must surface in the metric map
    val r1 = MediaPipeline.ingestBatch(spark,
      media(1L -> payload(1), 2L -> payload(2)), maxBucketSize = 2)
    assert(r1.ok)
    val r2 = MediaPipeline.ingestBatch(spark,
      media(10L -> reencode(1), 11L -> reencode(1), 12L -> reencode(1)),
      maxBucketSize = 2)
    assert(r2.ok)
    assert(r2.metrics("skipped_cross_buckets") > 0L, r2.metrics.toString)
    assert(r2.metrics("skipped_batch_buckets") > 0L, r2.metrics.toString)
  }

  private def caps(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("media_id", "caption", "score")

  test("caption treadmill: a later better caption replaces the stored winner; worse never displaces") {
    val r1 = MediaPipeline.ingestBatch(spark,
      media(1L -> payload(1), 2L -> payload(2)),
      captions = Some(caps((1L, "plain photo", 0.2), (2L, "the bench", 0.5))))
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("caption_components_touched") == 2L, r1.metrics.toString)
    // slice 2: a dropped re-encode of asset 1 carries a BETTER caption
    // (must replace), a dropped re-encode of 2 a WORSE one (must not),
    // and a fresh asset brings its own
    val r2 = MediaPipeline.ingestBatch(spark,
      media(10L -> reencode(1), 11L -> reencode(2), 12L -> payload(7)),
      captions = Some(caps((10L, "crisp studio shot", 0.9),
        (11L, "meh", 0.1), (12L, "a new thing", 0.7))))
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("bridged_components") == 0L, r2.metrics.toString)
    val got = spark.table(MediaPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got(1L) == (("crisp studio shot", 10L, 1L)), got.toString)
    assert(got(2L) == (("the bench", 2L, 1L)), got.toString)
    assert(got(12L) == (("a new thing", 12L, 0L)), got.toString)
    // convergence: the running artifact equals batch-global
    // captionKeepBest over every asset + caption ingested so far
    val allAssets = media(1L -> payload(1), 2L -> payload(2),
      10L -> reencode(1), 11L -> reencode(2), 12L -> payload(7))
    val allCaps = caps((1L, "plain photo", 0.2), (2L, "the bench", 0.5),
      (10L, "crisp studio shot", 0.9), (11L, "meh", 0.1), (12L, "a new thing", 0.7))
    val want = Multimodal.captionKeepBest(allAssets, allCaps)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kept_caption"), r.getAs[Long]("kept_from"),
          r.getAs[Long]("dropped_count")))).toMap
    assert(got == want, s"$got vs $want")
  }

  test("caption treadmill: a bridging asset is REPORTED; null scores lose; idempotent republish") {
    // flat grids make exact hamming control possible: base = all-50s
    // (hash 0); changing a row's LAST grid cell (column 8) flips
    // exactly one dHash bit. t2 flips 4 bits (rows 0-3) -> t1,t2 are
    // hamming 4 apart (both survive at maxHamming 3); b flips rows 0-1
    // only -> hamming 2 from BOTH: a bridge.
    def flat(flipRows: Int*): Array[Byte] = {
      val p = Array.fill[Byte](96)(50)
      flipRows.foreach(r => p(r * 9 + 8) = 70)
      p
    }
    val r1 = MediaPipeline.ingestBatch(spark,
      media(1L -> flat(), 2L -> flat(0, 1, 2, 3)),
      captions = Some(caps((1L, "t one", 0.5), (2L, "t two", 0.6))))
    assert(r1.ok && r1.metrics("batch_kept") == 2L, r1.metrics.toString)
    val r2 = MediaPipeline.ingestBatch(spark,
      media(10L -> flat(0, 1)),
      captions = Some(caps((10L, "bridge wording", 0.9))))
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("bridged_components") == 1L, r2.metrics.toString)
    assert(r2.metrics("batch_kept") == 0L, r2.metrics.toString)
    // attribution goes to the component minimum; the other stored row
    // stays (the documented bridge divergence — counted, never silent)
    val got = spark.table(MediaPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(got(1L) == "bridge wording" && got(2L) == "t two", got.toString)
    // a null score is the worst candidate, never a winner
    // all 8 rows flipped: hamming 4 from t2, 8 from t1 — a fresh asset
    val r3 = MediaPipeline.ingestBatch(spark,
      media(20L -> flat(0, 1, 2, 3, 4, 5, 6, 7)),
      captions = Some(spark.sql(
        "SELECT 20L AS media_id, 'null scored' AS caption, CAST(NULL AS DOUBLE) AS score")))
    assert(r3.ok)
    val r4 = MediaPipeline.ingestBatch(spark,
      media(21L -> { val p = flat(0, 1, 2, 3, 4, 5, 6, 7); p(80) = 99; p }),
      captions = Some(caps((21L, "scored", 0.01))))
    assert(r4.ok)
    val after = spark.table(MediaPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(after(20L) == "scored", after.toString)
    // retry idempotence: merging the same winner rows again is a no-op
    val before = spark.table(MediaPipeline.CaptionsTable).collect().toSet
    graft.plans.Catalog.mergeInto(spark, MediaPipeline.CaptionsTable,
      spark.table(MediaPipeline.BatchCaptionsTable), Seq("media_id"))
    assert(spark.table(MediaPipeline.CaptionsTable).collect().toSet == before)
  }

  test("caption treadmill: the quality floor drops garbage-only components; floored candidates still advance the watermark") {
    // asset 1's ONLY caption is garbage — keep-best alone would keep
    // it; with the floor the component gets NO caption. Asset 2 has
    // garbage + good — good wins as usual.
    val r1 = MediaPipeline.ingestBatch(spark,
      media(1L -> payload(1), 2L -> payload(2)),
      captions = Some(caps((1L, "asdf jkl", 0.1), (2L, "junk", 0.2),
        (2L, "a fine bench photo", 0.8))),
      captionMinScore = 0.5)
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("caption_floor_dropped") == 2L, r1.metrics.toString)
    val got = spark.table(MediaPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(got == Map(2L -> "a fine bench photo"), got.toString)
    // the floored candidates advanced the watermark: redelivering them
    // is a REPLAY skip, not a second floor decision — and a fresh
    // below-floor candidate for asset 2 never displaces the winner
    val r2 = MediaPipeline.ingestBatch(spark,
      media(3L -> payload(3)),
      captions = Some(caps((1L, "asdf jkl", 0.1), (3L, "a crisp new thing", 0.9))),
      captionMinScore = 0.5)
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("caption_replay_skipped") == 1L, r2.metrics.toString)
    assert(r2.metrics("caption_floor_dropped") == 0L, r2.metrics.toString)
    val after = spark.table(MediaPipeline.CaptionsTable)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("kept_caption")).toMap
    assert(after == Map(2L -> "a fine bench photo", 3L -> "a crisp new thing"),
      after.toString)
    // a NULL score cannot certify quality: it fails a finite floor
    val r3 = MediaPipeline.ingestBatch(spark,
      media(4L -> payload(4)),
      captions = Some(spark.sql(
        "SELECT 4L AS media_id, 'unscored' AS caption, CAST(NULL AS DOUBLE) AS score")),
      captionMinScore = 0.5)
    assert(r3.ok && r3.metrics("caption_floor_dropped") == 1L, r3.metrics.toString)
    assert(!spark.table(MediaPipeline.CaptionsTable)
      .collect().exists(_.getAs[Long]("media_id") == 4L))
  }

  test("caption treadmill: a REDELIVERED batch folds as a no-op (at-least-once replay safety)") {
    // foreachBatch is at-least-once: a crash after the caption merge
    // but before the checkpoint commit redelivers the whole batch.
    // Without the folded_max_id watermark the redelivered candidates
    // would fold a SECOND time against the already-merged winners and
    // dropped_count would inflate (prior_dropped already counts them).
    val r1 = MediaPipeline.ingestBatch(spark,
      media(1L -> payload(1), 2L -> payload(2)),
      captions = Some(caps((1L, "plain photo", 0.2), (2L, "the bench", 0.5))))
    assert(r1.ok, r1.stages.toString)
    val slice2 = media(10L -> reencode(1), 11L -> payload(7))
    val caps2 = caps((10L, "crisp studio shot", 0.9), (11L, "fresh thing", 0.7))
    val r2 = MediaPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("caption_replay_skipped") == 0L, r2.metrics.toString)
    val before = spark.table(MediaPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    // REDELIVERY: the exact same slice + captions again — assets dedup
    // against their own tier copies (content dedup), and the caption
    // fold must skip every candidate via the watermark
    val r3 = MediaPipeline.ingestBatch(spark, slice2, captions = Some(caps2))
    assert(r3.ok, r3.stages.toString)
    // the redelivered asset ids dedup at the APPEND (insertAppendOnce);
    // the caption fold must skip them BEFORE the merge via the watermark
    assert(r3.metrics("tier_media_after") == 3L, r3.metrics.toString)
    assert(r3.metrics("caption_replay_skipped") == 2L, r3.metrics.toString)
    assert(r3.metrics("caption_components_touched") == 0L, r3.metrics.toString)
    val after = spark.table(MediaPipeline.CaptionsTable).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("kept_caption"),
        r.getAs[Long]("kept_from"), r.getAs[Long]("dropped_count"))).toSet
    assert(after == before, s"$after vs $before")
  }
}
