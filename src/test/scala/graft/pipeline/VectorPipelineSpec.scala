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
    val r1 = VectorPipeline.ingestBatch(spark, slice1)
    assert(r1.ok, r1.stages.toString)
    assert(r1.metrics("tier_vecs") == 0L) // bootstrap
    val r2 = VectorPipeline.ingestBatch(spark, slice2)
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
    assert(spark.table(VectorPipeline.PqIndexTable).count() == tier.size.toLong)
    assert(spark.table(VectorPipeline.BandIndexTable).count() == tier.size.toLong * 8)
  }

  test("index generation freezes at bootstrap; stored ANN read finds the twin") {
    val slice1 = emb.filter($"vec_id" < 80)
    VectorPipeline.ingestBatch(spark, slice1)
    val centsAfter1 = VectorPipeline.loadCents(spark).map(_.toSeq).toSeq
    val booksAfter1 = VectorPipeline.loadBooks(spark)
    val slice2 = emb.filter($"vec_id" >= 80)
    VectorPipeline.ingestBatch(spark, slice2)
    // the second batch must NOT retrain: appended rows stay comparable
    assert(VectorPipeline.loadCents(spark).map(_.toSeq).toSeq == centsAfter1)
    assert(VectorPipeline.loadBooks(spark) == booksAfter1)

    // serve an ANN read straight off the treadmill's PQ index with the
    // frozen generation: a probe identical to a tier vector must come
    // back rank-1 sim-max (identical cell + identical codes)
    val probe = emb.filter($"vec_id" === 3)
      .select(($"vec_id" + 500000).as("vec_id"), $"embedding")
    val top1 = Similarity.topKIvfPqStored(
        spark.table(VectorPipeline.PqIndexTable), probe, 1,
        VectorPipeline.loadCents(spark), VectorPipeline.loadBooks(spark), nprobe = 1)
      .head()
    assert(top1.getAs[Long]("probe_id") == 500003L)
    assert(math.abs(top1.getAs[Double]("sim") - 1.0) < 1e-9,
      s"twin read must score sim 1: $top1")
  }
}
