package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.TextDedup

/** The VIDEO ingest treadmill — the FOURTH incremental modality,
  * completing the set next to docs, embeddings and still-media assets:
  * each new crawl slice of sampled FRAMES decodes exactly once into
  * per-video frame-hash sets ([[Multimodal.frameHashes]]), reconciles
  * against the STORED frame-hash index of the curated tier (tier
  * frames are NEVER re-decoded; the index carries each tier video's
  * distinct hash set, which is both the candidate bucketing structure
  * and the verification payload), and only the surviving videos plus
  * their index rows are appended.
  *
  * The stage scaffolding lives in [[Treadmill]]; this object is the
  * video CLOSURE over it: the decode pass ([[Multimodal.frameHashes]]
  * → [[Multimodal.videoIndex]], two pins), the reconcile operators
  * ([[Multimodal.videoReconcileComponents]] /
  * [[Multimodal.videoAgainstFromComponents]] — Jaccard for
  * re-muxes/re-encodes, max-directional containment for trims), the
  * skip metrics, and the video table/metric names. Ingest discipline:
  * batch video_ids must be fresh and monotone, and a video's frames
  * must all land WITHIN one slice (a video split across drains would
  * reconcile its first fragment as the tier copy — the per-video
  * analog of the docs treadmill's whole-document rule). Under it the
  * running tier equals batch-global [[Multimodal.videoDedup]] over all
  * slices so far, bridges are counted in `bridged_components`, and
  * redelivered caption batches fold as a no-op via the
  * `folded_max_id` watermark. */
object VideoPipeline {

  val TierTable = "video_tier"                 // (video_id, frame_hashes)
  val FrameIndexTable = "video_frame_index"    // (video_id, frame_hash)
  val CaptionsTable = "video_captions"
  val BatchSurvivorsTable = "video_batch_survivors"
  val BatchIndexTable = "video_batch_index"
  val BatchComponentsTable = "video_batch_components"
  val BatchCaptionsTable = "video_batch_captions"

  private[pipeline] def modality(jaccardThreshold: Double, containThreshold: Double,
                       grid: Multimodal.GridExtractor,
                       maxBucketSize: Int): Treadmill.Modality =
    new Treadmill.Modality {
      val idCol = "video_id"
      val tierTable = TierTable
      val indexTable = FrameIndexTable
      val captionsTable = CaptionsTable
      val batchSurvivorsTable = BatchSurvivorsTable
      val batchIndexTable = BatchIndexTable
      val batchComponentsTable = BatchComponentsTable
      val batchCaptionsTable = BatchCaptionsTable
      val probeMetric = "tier_videos"
      val afterMetric = "tier_videos_after"
      val initialMetric = "batch_frames"
      val dedupStageName = "incremental_video_dedup"
      def prepare(frames: DataFrame): Treadmill.BatchState = {
        // the ONE decode pass of the whole batch lifecycle; the index
        // derives from the hash-set pin, never a second decode
        val bVids = Multimodal.frameHashes(frames, grid).localCheckpoint(true)
        val bIdx = Multimodal.videoIndex(bVids).localCheckpoint(true)
        Treadmill.BatchState(bVids, bIdx, Seq(bIdx, bVids))
      }
      def reconcile(st: Treadmill.BatchState, tierIdx: DataFrame): DataFrame =
        Multimodal.videoReconcileComponents(st.entities, st.index, tierIdx,
          jaccardThreshold, containThreshold, maxBucketSize)
      def survivorsFromComponents(st: Treadmill.BatchState, comps: DataFrame,
                                  tierIdx: DataFrame): DataFrame =
        Multimodal.videoAgainstFromComponents(st.entities, comps, tierIdx)
      def skippedCross(st: Treadmill.BatchState, tierIdx: DataFrame): Long =
        Multimodal.skippedVideoBucketsAgainst(st.index, tierIdx, maxBucketSize).count()
      def skippedBatch(st: Treadmill.BatchState): Long =
        Multimodal.skippedVideoBucketsFromIndex(st.index, maxBucketSize).count()
      val landingSchema = Multimodal.VideoFrameSchema
      def splitCaptions(batch: DataFrame): (DataFrame, DataFrame) =
        // the video's caption rides its FIRST frame row (frame_no = 0)
        // — one landing stream feeds both artifacts
        (batch.drop("caption", "score"),
          batch.filter(col("frame_no") === 0)
            .select("video_id", "caption", "score"))
    }

  /** Ingest one slice of sampled frames: decode once, reconcile against
    * the stored frame-hash index, publish surviving videos + their
    * index rows. Returns the stage report with batch_frames/batch_in/
    * batch_kept/batch_dropped/skipped_cross_buckets/
    * skipped_batch_buckets/tier_videos_after metrics. With `captions`
    * (video_id, caption, score) the treadmill also maintains the
    * RUNNING keep-best caption artifact ([[CaptionsTable]]) via the
    * [[Treadmill]] fold on the video reconcile closure — exact vs
    * batch-global keep-best (bridges excepted, reported) and
    * replay-safe via the `folded_max_id` watermark. */
  def ingestBatch(spark: SparkSession, frames: DataFrame,
                  jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  captions: Option[DataFrame] = None,
                  captionMinScore: Double = Double.NegativeInfinity,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport =
    Treadmill.ingestBatch(spark, frames,
      modality(jaccardThreshold, containThreshold, grid, maxBucketSize),
      captions, notify, captionMinScore)

  /** The video treadmill as a STREAM over a parquet frame landing
    * ([[Multimodal.VideoFrameSchema]]) — [[Treadmill.streamIngest]]
    * with the video closure. With `captioned = true` the frame landing
    * rows carry two extra nullable columns (caption STRING, score
    * DOUBLE); the video's caption rides its FIRST frame row
    * (frame_no = 0). Frame files must respect the whole-video landing
    * discipline (see the object doc). */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                   captioned: Boolean = false,
                   captionMinScore: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    Treadmill.streamIngest(spark, landingDir, checkpointDir,
      modality(jaccardThreshold, containThreshold, grid, maxBucketSize),
      captioned, captionMinScore)

  /** Drop every treadmill table — a fresh-tier reset for self-contained
    * runs (the stream gate query and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Treadmill.resetTreadmill(spark,
      modality(0.9, 0.9, Multimodal.StubGrid, TextDedup.DefaultMaxBucketSize))
}
