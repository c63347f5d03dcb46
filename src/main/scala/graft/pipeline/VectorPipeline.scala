package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDedup}
import graft.plans.Catalog

/** Incremental VECTOR ingest — the embedding twin of
  * [[CurationPipeline.ingestBatch]], maintaining the three stored
  * artifacts an embedding corpus needs at 100 TB so that neither dedup
  * nor ANN reads ever re-process the accumulated tier:
  *
  *  - the vector TIER (`embeddings_tier`): the deduped float corpus;
  *  - its sign-LSH BAND INDEX (`embeddings_band_index`): what each new
  *    batch equi-joins for near-dup reconciliation — the tier is never
  *    re-hashed;
  *  - its PQ INDEX (`embeddings_pq_index`): the compressed ANN tier
  *    ([[Similarity.pqIndex]] rows) serving [[Similarity.topKIvfPqStored]]
  *    and [[Similarity.knnGraphPq]] — the tier is never re-encoded.
  *
  * Per-batch cost is O(batch + matched candidates), independent of tier
  * size; all three artifacts grow by append only.
  *
  * The PQ coarse quantizer and codebooks are FROZEN at bootstrap (an
  * index GENERATION): the first batch trains them and persists both as
  * k-sized catalog tables ([[PqCentsTable]], [[PqBooksTable]]), and
  * every later batch loads the same literals — append-encoded rows stay
  * comparable forever. Retraining means a new generation: drop the
  * tables and rebuild the PQ index from the tier (the quantizer is a
  * quality knob, never a correctness one — encode/score arithmetic is
  * exact for ANY codebook).
  *
  * Batch vec_ids must be fresh (monotone ingest discipline, the
  * [[CurationPipeline.ingestBatch]] contract): under it the running
  * tier equals what batch-global [[Similarity.dedupNearCosine]] over
  * all slices so far would keep.
  */
object VectorPipeline {

  val TierTable = "embeddings_tier"
  val BandIndexTable = "embeddings_band_index"
  val PqIndexTable = "embeddings_pq_index"
  val PqCentsTable = "embeddings_pq_cents"
  val PqBooksTable = "embeddings_pq_books"
  val BatchSurvivorsTable = "embeddings_batch_survivors"

  /** Load the frozen coarse centroids (k-sized driver collect — the
    * same class as training's own driver literal). Public because
    * serving reads need the SAME generation literals the index was
    * encoded with ([[Similarity.topKIvfPqStored]], [[Similarity.knnGraphPq]]). */
  def loadCents(spark: SparkSession): Array[Array[Float]] =
    spark.table(PqCentsTable).orderBy("cell").select("centroid").collect()
      .map(_.getSeq[Float](0).toArray)

  /** Load the frozen PQ codebooks (m·ksub·dsub ints). */
  def loadBooks(spark: SparkSession): Seq[Seq[Seq[Int]]] =
    spark.table(PqBooksTable).orderBy("j", "c").select("j", "c", "cent").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).toSeq.map(_.getSeq[Int](2).toList))

  private def saveCents(spark: SparkSession, cents: Array[Array[Float]]): Unit = {
    import spark.implicits._
    Catalog.overwriteTable(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid"), PqCentsTable)
  }

  private def saveBooks(spark: SparkSession, books: Seq[Seq[Seq[Int]]]): Unit = {
    import spark.implicits._
    Catalog.overwriteTable(
      books.zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (cent, c) => (j, c, cent) }
      }.toDF("j", "c", "cent"), PqBooksTable)
  }

  /** Reconcile one batch of new vectors against the stored tier and
    * append the survivors to all three artifacts. First call
    * bootstraps: batch-global dedup, quantizer training, table
    * creation. Returns the standard [[PipelineReport]] with kept/
    * dropped counts and the post-publish tier size in the metric map. */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
                  threshold: Double = 0.999,
                  bands: Int = 8, planesPerBand: Int = 12, seed: Long = 42L,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                  pqM: Int = 4, pqKsub: Int = 8, coarseK: Int = 16,
                  notify: PipelineReport => Unit = _ => ()): PipelineReport = {
    val stages = Seq(
      Stage("probe_tier") { _ =>
        Map("tier_vecs" -> (if (Catalog.tableExists(spark, TierTable))
          spark.table(TierTable).count() else 0L))
      },
      Stage("incremental_neardup") { m =>
        val survivors =
          if (m("tier_vecs") == 0L)
            Similarity.dedupNearCosine(batch, threshold,
              bands, planesPerBand, seed, maxBucketSize)
          else
            Similarity.nearDupAgainstCosine(spark.table(TierTable), batch, threshold,
              bands, planesPerBand, seed, maxBucketSize,
              tierIndex = Some(spark.table(BandIndexTable)))
        Catalog.overwriteTable(survivors, BatchSurvivorsTable)
        val kept = spark.table(BatchSurvivorsTable).count()
        Map("batch_kept" -> kept, "batch_dropped" -> (m("batch_in") - kept))
      },
      Stage("publish_batch") { m =>
        val survivors = spark.table(BatchSurvivorsTable)
        if (m("tier_vecs") == 0L) {
          // bootstrap: freeze the index generation on the first slice
          saveCents(spark, Similarity.trainCentroids(
            survivors.filter(col("embedding").isNotNull), coarseK, iters = 2, seed))
          saveBooks(spark, Similarity.trainPqBooks(
            survivors.filter(col("embedding").isNotNull), pqM, pqKsub, iters = 2, seed))
        }
        val cents = loadCents(spark)
        val books = loadBooks(spark)
        val keys = Similarity.vecBandIndex(survivors, bands, planesPerBand, seed)
        val pq = Similarity.pqIndex(survivors, cents, books)
        if (!Catalog.tableExists(spark, TierTable)) {
          Catalog.ensureTable(spark, TierTable, survivors.schema)
          Catalog.ensureTable(spark, BandIndexTable, keys.schema)
          Catalog.ensureTable(spark, PqIndexTable, pq.schema)
        }
        Catalog.insertAppend(spark, TierTable, survivors)
        Catalog.insertAppend(spark, BandIndexTable, keys)
        Catalog.insertAppend(spark, PqIndexTable, pq)
        Map("tier_vecs_after" -> spark.table(TierTable).count(),
          "pq_rows_after" -> spark.table(PqIndexTable).count())
      })
    new Runner(stages, RetryPolicy(retries = 1), notify)
      .run(Map("batch_in" -> batch.count()))
  }

  /** Drop every treadmill table — a fresh-generation reset for
    * self-contained runs (the gate query and specs). */
  def resetTreadmill(spark: SparkSession): Unit =
    Seq(TierTable, BandIndexTable, PqIndexTable, PqCentsTable, PqBooksTable,
      BatchSurvivorsTable)
      .foreach(Catalog.dropIfExists(spark, _))
}
