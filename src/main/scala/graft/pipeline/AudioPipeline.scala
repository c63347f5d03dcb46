package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal
import graft.operators.TextDedup

/** The AUDIO ingest treadmill — the FIFTH incremental modality, and
  * the proof of the [[Treadmill]] skeleton's contract: this whole
  * pipeline is a [[Treadmill.Modality]] closure plus table names, not
  * a copy of the stage machinery. Each crawl slice of audio payloads
  * fingerprints EXACTLY ONCE into window-signature sets
  * ([[Multimodal.audioHashes]] — overlapping byte windows through the
  * perceptual grid, the chromaprint-shaped profile), reconciles
  * against the STORED window index (tier payloads are never
  * re-decoded), and only survivors plus their index rows append.
  * Re-encodes collapse on Jaccard, CLIPS (hop-aligned window subsets)
  * on max-directional containment — the video semantics via ONE
  * shared implementation ([[Multimodal]]'s audio↔video rename).
  *
  * With `captions` (audio_id, caption, score — TRANSCRIPTS, scored by
  * any quality battery) the treadmill maintains the running keep-best
  * transcript per perceptual component ([[CaptionsTable]]): the
  * audio⇄text pair curation a speech corpus needs — one clip
  * circulates as many re-encodes and clips, each with its own
  * transcription, and training wants exactly one (clip, best
  * transcript) pair per distinct recording. The fold inherits the
  * skeleton's exactness (associative min, additive dropped_count),
  * bridge reporting, and the `folded_max_id` replay watermark.
  *
  * Ingest discipline: batch audio_ids fresh and monotone; a payload
  * lands whole within one slice (the whole-document rule). Under it
  * the running tier equals batch-global [[Multimodal.audioDedup]]
  * over all slices so far. */
object AudioPipeline {

  val TierTable = "audio_tier"                  // (audio_id, window_hashes)
  val WindowIndexTable = "audio_window_index"   // (audio_id, window_hash)
  val CaptionsTable = "audio_transcripts"
  val BatchSurvivorsTable = "audio_batch_survivors"
  val BatchIndexTable = "audio_batch_index"
  val BatchComponentsTable = "audio_batch_components"
  val BatchCaptionsTable = "audio_batch_captions"

  private[pipeline] def modality(jaccardThreshold: Double, containThreshold: Double,
                       grid: Multimodal.GridExtractor, maxBucketSize: Int,
                       windowBytes: Int, hopBytes: Int): Treadmill.Modality =
    new Treadmill.Modality {
      val idCol = "audio_id"
      val tierTable = TierTable
      val indexTable = WindowIndexTable
      val captionsTable = CaptionsTable
      val batchSurvivorsTable = BatchSurvivorsTable
      val batchIndexTable = BatchIndexTable
      val batchComponentsTable = BatchComponentsTable
      val batchCaptionsTable = BatchCaptionsTable
      val probeMetric = "tier_audio"
      val afterMetric = "tier_audio_after"
      val initialMetric = "batch_in"
      val dedupStageName = "incremental_audio_dedup"
      def prepare(batch: DataFrame): Treadmill.BatchState = {
        // the ONE fingerprint pass of the whole batch lifecycle; the
        // index derives from the hash-set pin, never a second pass
        val aSets = Multimodal.audioHashes(batch, grid, windowBytes, hopBytes)
          .localCheckpoint(true)
        val aIdx = Multimodal.audioIndex(aSets).localCheckpoint(true)
        Treadmill.BatchState(aSets, aIdx, Seq(aIdx, aSets))
      }
      def reconcile(st: Treadmill.BatchState, tierIdx: DataFrame): DataFrame =
        Multimodal.audioReconcileComponents(st.entities, st.index, tierIdx,
          jaccardThreshold, containThreshold, maxBucketSize)
      def survivorsFromComponents(st: Treadmill.BatchState, comps: DataFrame,
                                  tierIdx: DataFrame): DataFrame =
        Multimodal.audioAgainstFromComponents(st.entities, comps, tierIdx)
      def skippedCross(st: Treadmill.BatchState, tierIdx: DataFrame): Long =
        Multimodal.skippedAudioBucketsAgainst(st.index, tierIdx, maxBucketSize).count()
      def skippedBatch(st: Treadmill.BatchState): Long =
        Multimodal.skippedAudioBucketsFromIndex(st.index, maxBucketSize).count()
      val landingSchema = Multimodal.AudioSchema
      def splitCaptions(batch: DataFrame): (DataFrame, DataFrame) =
        (batch.drop("caption", "score"),
          batch.select("audio_id", "caption", "score"))
    }

  /** Ingest one audio slice — [[Treadmill.ingestBatch]] with the audio
    * closure. Metrics: batch_in/batch_kept/batch_dropped/
    * bridged_components/skipped_cross_buckets/skipped_batch_buckets/
    * tier_audio_after (+ the caption fold's kept/replay metrics). */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
                  jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                  grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  windowBytes: Int = 96, hopBytes: Int = 48,
                  captions: Option[DataFrame] = None,
                  captionMinScore: Double = Double.NegativeInfinity,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport =
    Treadmill.ingestBatch(spark, batch,
      modality(jaccardThreshold, containThreshold, grid, maxBucketSize,
        windowBytes, hopBytes),
      captions, notify, captionMinScore)

  /** The audio treadmill as a STREAM over a parquet landing —
    * [[Treadmill.streamIngest]] with the audio closure. With
    * `captioned = true` the landing rows carry (caption, score): the
    * clip and its transcript land together, one stream feeds both
    * artifacts. */
  def streamIngest(spark: SparkSession, landingDir: String, checkpointDir: String,
                   jaccardThreshold: Double = 0.9, containThreshold: Double = 0.9,
                   grid: Multimodal.GridExtractor = Multimodal.StubGrid,
                   maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                   windowBytes: Int = 96, hopBytes: Int = 48,
                   captioned: Boolean = false,
                   captionMinScore: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    Treadmill.streamIngest(spark, landingDir, checkpointDir,
      modality(jaccardThreshold, containThreshold, grid, maxBucketSize,
        windowBytes, hopBytes),
      captioned, captionMinScore)

  /** Drop every treadmill table — a fresh-tier reset for self-contained
    * runs (the stream gate queries and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Treadmill.resetTreadmill(spark,
      modality(0.9, 0.9, Multimodal.StubGrid, TextDedup.DefaultMaxBucketSize,
        96, 48))
}
