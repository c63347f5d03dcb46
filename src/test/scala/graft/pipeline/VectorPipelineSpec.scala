package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec
import graft.operators.Similarity

class VectorPipelineSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = VectorPipeline.resetTreadmill(spark)

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  test("two-slice ingest converges to batch-global dedup; all three artifacts stay consistent") {
    val slice1 = emb.filter($"vec_id" < 50)
    // slice 2: fresh ids + planted twins of slice-1 vectors
    val slice2 = emb.filter($"vec_id" >= 50)
      .unionByName(emb.filter($"vec_id" % 10 === 0 && $"vec_id" < 50)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val r1 = VectorPipeline.ingestBatch(spark, slice1, pqM = 4, pqKsub = 8)
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("tier_vecs") == 0L) // bootstrap
    val r2 = VectorPipeline.ingestBatch(spark, slice2, pqM = 4, pqKsub = 8)
    assert(r2.ok, r2.stages.toString)
    assert(r2.metrics("batch_dropped") >= 5L, // the planted twins must reconcile
      r2.metrics.toString)

    // tier equals batch-global dedup over slice1 ∪ slice2
    val expected = Similarity.dedupNearCosine(slice1.unionByName(slice2), 0.999)
      .select("vec_id").as[Long].collect().toSet
    val tier = spark.table(VectorPipeline.TierTable)
      .select("vec_id").as[Long].collect().toSet
    assert(tier == expected,
      s"diverge: ${(tier -- expected).take(3)} vs ${(expected -- tier).take(3)}")

    // artifacts cover the tier exactly: one band row per (vec, band),
    // one PQ row per vec — nothing re-hashed, nothing re-encoded
    assert(spark.table(VectorPipeline.pqIndexTable(spark)).count() == tier.size.toLong)
    assert(spark.table(VectorPipeline.BandIndexTable).count() == tier.size.toLong * 8)
  }

  test("publish is idempotent: re-appending the same batch is a no-op per table") {
    val slice1 = emb.filter($"vec_id" < 50)
    VectorPipeline.ingestBatch(spark, slice1, pqM = 4, pqKsub = 8)
    val tierN = spark.table(VectorPipeline.TierTable).count()
    val bandN = spark.table(VectorPipeline.BandIndexTable).count()
    // simulate the retry-after-partial-failure path: the batch's rows
    // are already in every table, so each appendOnce must skip
    val survivors = spark.table(VectorPipeline.BatchSurvivorsTable)
    val appended = graft.plans.Catalog.insertAppendOnce(
      spark, VectorPipeline.TierTable, survivors, "vec_id")
    assert(appended == 0L, "already-published batch must not re-append")
    assert(spark.table(VectorPipeline.TierTable).count() == tierN)
    assert(spark.table(VectorPipeline.BandIndexTable).count() == bandN)
  }

  test("banding parameters are frozen at bootstrap: a mismatched batch fails loudly") {
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" < 50), pqM = 4, pqKsub = 8)
    val e = intercept[PipelineFailedException] {
      VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" >= 50), bands = 4, pqM = 4, pqKsub = 8)
    }
    assert(e.getCause.getMessage.contains("parameter mismatch"), e.getCause.getMessage)
    // same params: accepted
    val ok = VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" >= 50), pqM = 4, pqKsub = 8)
    assert(ok.ok)
  }

  test("regenerate: atomic rollover, serve-continuity for twin probes, drift baseline resets") {
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" < 60), pqM = 4, pqKsub = 8)
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" >= 60), pqM = 4, pqKsub = 8)
    assert(VectorPipeline.currentGeneration(spark) == 1L)

    // twin probes: identical to tier vectors, so the true neighbor is
    // proposed under ANY quantizer generation and the refined answer
    // must be identical before and after the rollover
    val probes = emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    def serve() = VectorPipeline.queryTopK(spark, probes, k = 1, nprobe = 2, refine = Some(8))
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val before = serve()
    assert(before.forall { case (p, n) => n == p - 500000 },
      s"twin rank-1 must be the twin: ${before.take(3)}")

    val r = VectorPipeline.regenerate(spark, coarseK = 8, pqM = 4, pqKsub = 8,
      sampleFraction = 0.8)
    assert(r.ok, r.stages.toString)
    assert(VectorPipeline.currentGeneration(spark) == 2L)
    assert(r.metrics("tier_encoded") == spark.table(VectorPipeline.TierTable).count(),
      "the new generation must cover the tier row-for-row")
    // training read a strict hash-sample, encode covered everything
    assert(r.metrics("train_sample") < r.metrics("tier_encoded"))

    assert(serve() == before, "rollover must not change twin answers")

    // previous generation retained through the flip for in-flight readers
    assert(spark.catalog.tableExists("embeddings_pq_index_g1"))
    assert(spark.catalog.tableExists("embeddings_pq_index_g2"))

    // drift baseline resets at rollover: freshly after, current == baseline
    val drift = VectorPipeline.generationDrift(spark)
    assert(drift.filter($"share_drift" > 1e-12).count() == 0L, "fresh generation must show zero drift")

    // default retention is TWO predecessors: a third generation still
    // retains g1 (a reader may lag up to two rollovers)...
    val r3 = VectorPipeline.regenerate(spark, coarseK = 8, pqM = 4, pqKsub = 8)
    assert(r3.ok)
    assert(VectorPipeline.currentGeneration(spark) == 3L)
    assert(spark.catalog.tableExists("embeddings_pq_index_g1"))
    assert(serve() == before, "second rollover must not change twin answers either")
    // ...and a fourth finally ages g1 out while g2/g3 survive
    val r4 = VectorPipeline.regenerate(spark, coarseK = 8, pqM = 4, pqKsub = 8)
    assert(r4.ok)
    assert(VectorPipeline.currentGeneration(spark) == 4L)
    assert(!spark.catalog.tableExists("embeddings_pq_index_g1"))
    assert(spark.catalog.tableExists("embeddings_pq_index_g2"))
    assert(spark.catalog.tableExists("embeddings_pq_index_g3"))
    // tighter retention on demand: keepGenerations = 1 prunes g2 at g5
    val r5 = VectorPipeline.regenerate(spark, coarseK = 8, pqM = 4, pqKsub = 8,
      keepGenerations = 1)
    assert(r5.ok)
    assert(!spark.catalog.tableExists("embeddings_pq_index_g3"))
    assert(spark.catalog.tableExists("embeddings_pq_index_g4"))
  }

  test("regenerate repairs an ingest that interleaves between encode and the pointer flip") {
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" < 60), pqM = 4, pqKsub = 8)
    val interleaved = emb.filter($"vec_id" >= 60 && $"vec_id" < 90)
    // inject a full ingestBatch between encode_tier's snapshot and the
    // flip: its PQ rows land in generation 1's index only, so without
    // the delta pass generation 2 would silently miss those vectors
    val r = VectorPipeline.regenerate(spark, coarseK = 8, pqM = 4, pqKsub = 8,
      afterEncode = () => {
        val ri = VectorPipeline.ingestBatch(spark, interleaved, pqM = 4, pqKsub = 8)
        assert(ri.ok, ri.stages.toString)
      })
    assert(r.ok, r.stages.toString)
    assert(VectorPipeline.currentGeneration(spark) == 2L)
    assert(r.metrics("late_encoded") > 0L, "the interleaved batch must be delta-encoded")
    // the published generation covers the tier row-for-row, including
    // every vector the interleaved batch appended
    val tierIds = spark.table(VectorPipeline.TierTable)
      .select("vec_id").as[Long].collect().toSet
    val idxIds = spark.table(VectorPipeline.pqIndexTable(spark))
      .select("vec_id").as[Long].collect().toSet
    assert(idxIds == tierIds,
      s"generation 2 misses ${(tierIds -- idxIds).take(5)} / extra ${(idxIds -- tierIds).take(5)}")
    // and an interleaved vector is servable under the new generation:
    // its twin probe must come back rank-1
    val probe = emb.filter($"vec_id" === 70)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    val top = VectorPipeline.queryTopK(spark, probe, k = 1, nprobe = 2, refine = Some(8)).head()
    assert(top.getAs[Long]("neighbor_id") == 70L, top.toString)
  }

  test("streamIngestAndMaintain: drain then drift-triggered rollover, serve stays twin-correct") {
    val land = java.nio.file.Files.createTempDirectory("graft_vec_maint_land").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_vec_maint_cp").toString
    // slice 1 bootstraps generation 1 (production-resolution defaults)
    emb.filter($"vec_id" < 50).coalesce(1).write.mode("append").json(land)
    val none = VectorPipeline.streamIngestAndMaintain(spark, land, cp,
      maxShareDrift = 0.99, maxOverCapShare = 0.99)
    assert(none.isEmpty, "fresh bootstrap must not trigger a rollover")
    assert(VectorPipeline.currentGeneration(spark) == 1L)
    // slice 2 shifts the distribution (post-baseline growth); a tight
    // drift threshold makes the post-drain check fire deterministically
    emb.filter($"vec_id" >= 50).coalesce(1).write.mode("append").json(land)
    val rolled = VectorPipeline.streamIngestAndMaintain(spark, land, cp,
      maxShareDrift = 1e-6, maxOverCapShare = 0.99)
    assert(rolled.exists(_.ok), rolled.toString)
    assert(VectorPipeline.currentGeneration(spark) == 2L)
    // the new generation covers the whole tier and serves twins rank-1
    val tier = spark.table(VectorPipeline.TierTable)
    assert(spark.table(VectorPipeline.pqIndexTable(spark)).count() == tier.count())
    val probes = emb.filter($"vec_id" % 20 === 0)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    val served = VectorPipeline.queryTopK(spark, probes, k = 1, nprobe = 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
    assert(served.nonEmpty && served.forall { case (p, n) => n == p - 500000 },
      s"twin rank-1 must be the twin: ${served.take(3).toSeq}")
  }

  test("maybeRegenerate: healthy generation holds; crossed thresholds roll it") {
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" < 50), pqM = 4, pqKsub = 8)
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" >= 50), pqM = 4, pqKsub = 8)
    // loose thresholds: post-bootstrap growth alone must NOT trigger
    assert(VectorPipeline.maybeRegenerate(spark,
      maxShareDrift = 0.99, maxOverCapShare = 0.99).isEmpty)
    assert(VectorPipeline.currentGeneration(spark) == 1L)
    // tight over-cap threshold: with cap 1 nearly every row sits in an
    // over-cap cell -> rollover fires and the pointer advances
    val r = VectorPipeline.maybeRegenerate(spark,
      maxShareDrift = 0.99, maxOverCapShare = 0.01, maxCellSize = 1, coarseK = 24)
    assert(r.exists(_.ok), r.toString)
    assert(VectorPipeline.currentGeneration(spark) == 2L)
  }

  test("generationDrift flags growth the bootstrap never saw") {
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" < 50), pqM = 4, pqKsub = 8)
    // post-bootstrap growth: more vectors land AFTER the baseline snapshot
    VectorPipeline.ingestBatch(spark, emb.filter($"vec_id" >= 50), pqM = 4, pqKsub = 8)
    val drift = VectorPipeline.generationDrift(spark, maxCellSize = 3)
    val rows = drift.collect()
    assert(rows.map(_.getAs[Long]("current_n")).sum ==
      spark.table(VectorPipeline.TierTable).count())
    assert(rows.exists(_.getAs[Double]("share_drift") > 0), "growth must register as drift")
    assert(rows.exists(_.getAs[Boolean]("over_cap")), "cells past the cap must be flagged")
  }

  test("index generation freezes at bootstrap; stored ANN read finds the twin") {
    val slice1 = emb.filter($"vec_id" < 80)
    VectorPipeline.ingestBatch(spark, slice1, pqM = 4, pqKsub = 8)
    val centsAfter1 = VectorPipeline.loadCents(spark).map(_.toSeq).toSeq
    val booksAfter1 = VectorPipeline.loadBooks(spark)
    val slice2 = emb.filter($"vec_id" >= 80)
    VectorPipeline.ingestBatch(spark, slice2, pqM = 4, pqKsub = 8)
    // the second batch must NOT retrain: appended rows stay comparable
    assert(VectorPipeline.loadCents(spark).map(_.toSeq).toSeq == centsAfter1)
    assert(VectorPipeline.loadBooks(spark) == booksAfter1)

    // serve an ANN read straight off the treadmill's PQ index with the
    // frozen generation: a probe identical to a tier vector must come
    // back rank-1 sim-max (identical cell + identical codes)
    val probe = emb.filter($"vec_id" === 3)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    val top1 = Similarity.topKIvfPqStored(
        spark.table(VectorPipeline.pqIndexTable(spark)), probe, 1,
        VectorPipeline.loadCents(spark), VectorPipeline.loadBooks(spark), nprobe = 1)
      .head()
    assert(top1.getAs[Long]("probe_id") == 500003L)
    assert(math.abs(top1.getAs[Double]("sim") - 1.0) < 1e-9,
      s"twin read must score sim 1: $top1")
  }
}
