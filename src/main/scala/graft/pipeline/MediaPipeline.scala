package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.operators.TextDedup

/** The MEDIA ingest treadmill — the third modality's production shape,
  * next to [[CurationPipeline.ingestBatch]] (docs) and
  * [[VectorPipeline.ingestBatch]] (embeddings): each new media crawl
  * slice reconciles against the STORED perceptual-hash index of the
  * curated tier (tier bytes are NEVER re-decoded; at 100 TB of media,
  * decode is the cost that must be paid exactly once per asset), and
  * only the surviving assets plus their 4-chunk phash index rows are
  * appended.
  *
  * The stage scaffolding — pin lifecycle, empty-tier bootstrap
  * (in-batch closure = [[Multimodal.phashDedup]] exactly), the
  * caption keep-best fold with its `folded_max_id` replay watermark,
  * the idempotent multi-table publish, the foreachBatch session-clone
  * discipline — lives in [[Treadmill]]; this object is the media
  * CLOSURE over it: the one decode pass ([[Multimodal.phashIndex]]),
  * the reconcile operators ([[Multimodal.phashReconcileComponents]] /
  * [[Multimodal.phashAgainstFromComponents]]), the skip metrics, and
  * the media table/metric names. Batch media_ids must be fresh and
  * monotone (the treadmill ingest discipline); under it the running
  * tier equals batch-global perceptual dedup over all slices so far
  * (phashAgainst's documented convergence contract), and bridges
  * (batch assets linking two previously-independent tier components)
  * are counted in `bridged_components`, never silent. */
object MediaPipeline {

  val TierTable = "media_tier"
  val PhashIndexTable = "media_phash_index"
  val CaptionsTable = "media_captions"
  val BatchSurvivorsTable = "media_batch_survivors"
  val BatchIndexTable = "media_batch_index"
  val BatchComponentsTable = "media_batch_components"
  val BatchCaptionsTable = "media_batch_captions"

  private[pipeline] def modality(maxHamming: Int, grid: Multimodal.GridExtractor,
                       maxBucketSize: Int): Treadmill.Modality =
    new Treadmill.Modality {
      val idCol = "media_id"
      val tierTable = TierTable
      val indexTable = PhashIndexTable
      val captionsTable = CaptionsTable
      val batchSurvivorsTable = BatchSurvivorsTable
      val batchIndexTable = BatchIndexTable
      val batchComponentsTable = BatchComponentsTable
      val batchCaptionsTable = BatchCaptionsTable
      val probeMetric = "tier_media"
      val afterMetric = "tier_media_after"
      val initialMetric = "batch_in"
      val dedupStageName = "incremental_phash_dedup"
      def prepare(batch: DataFrame): Treadmill.BatchState = {
        // the ONE decode pass of the whole batch lifecycle
        val bIdx = Multimodal.phashIndex(batch, grid).localCheckpoint(true)
        Treadmill.BatchState(batch, bIdx, Seq(bIdx))
      }
      def reconcile(st: Treadmill.BatchState, tierIdx: DataFrame): DataFrame =
        Multimodal.phashReconcileComponents(st.index, tierIdx,
          maxHamming, maxBucketSize)
      def survivorsFromComponents(st: Treadmill.BatchState, comps: DataFrame,
                                  tierIdx: DataFrame): DataFrame =
        Multimodal.phashAgainstFromComponents(st.entities, comps, tierIdx)
      def skippedCross(st: Treadmill.BatchState, tierIdx: DataFrame): Long =
        Multimodal.skippedPhashBucketsAgainst(st.index, tierIdx, maxBucketSize).count()
      def skippedBatch(st: Treadmill.BatchState): Long =
        Multimodal.skippedPhashBucketsFromIndex(st.index, maxBucketSize).count()
      val landingSchema = Multimodal.MediaSchema
      def splitCaptions(batch: DataFrame): (DataFrame, DataFrame) =
        (batch.drop("caption", "score"),
          batch.select("media_id", "caption", "score"))
    }

  /** Ingest one media slice: reconcile against the stored phash index,
    * publish survivors + their index rows. Returns the stage report
    * with batch_in/batch_kept/batch_dropped/skipped_cross_buckets/
    * skipped_batch_buckets/tier_media_after metrics. With `captions`
    * (media_id, caption, score) the treadmill also maintains the
    * RUNNING keep-best caption artifact ([[CaptionsTable]]) via the
    * [[Treadmill]] fold — exact vs batch-global
    * [[Multimodal.captionKeepBest]] (bridges excepted, reported), and
    * replay-safe under at-least-once redelivery via the
    * `folded_max_id` watermark (`caption_replay_skipped` metric). */
  def ingestBatch(spark: SparkSession, batch: DataFrame, maxHamming: Int = 3,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  captions: Option[DataFrame] = None,
                  captionMinScore: Double = Double.NegativeInfinity,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport =
    Treadmill.ingestBatch(spark, batch,
      modality(maxHamming, grid, maxBucketSize), captions, notify,
      captionMinScore)

  /** The media treadmill as a STREAM over a parquet landing (binary
    * payloads make parquet the natural landing format where docs and
    * vectors land as JSON) — [[Treadmill.streamIngest]] with the media
    * closure. With `captioned = true` the landing rows carry two extra
    * nullable columns (caption STRING, score DOUBLE): a crawl delivers
    * the asset and its caption together, so ONE landing stream feeds
    * both artifacts. */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   maxHamming: Int = 3,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                   captioned: Boolean = false,
                   captionMinScore: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    Treadmill.streamIngest(spark, landingDir, checkpointDir,
      modality(maxHamming, grid, maxBucketSize), captioned, captionMinScore)

  /** Drop every treadmill table — a fresh-tier reset for self-contained
    * runs (the stream gate query and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Treadmill.resetTreadmill(spark,
      modality(3, Multimodal.StubGrid, TextDedup.DefaultMaxBucketSize))
}
