package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withFeatures adds deterministic stub features per row; null bytes -> null") {
    val media = Multimodal.syntheticMedia(spark, 50)
      .withColumn("bytes", when($"media_id" === 7L, lit(null).cast("binary")).otherwise($"bytes"))
    val out = Multimodal.withFeatures(media)
    assert(out.schema("features").dataType.simpleString == "array<float>")

    val rows = out.select("media_id", "bytes", "features").collect()
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      if (bytes == null) assert(feats == null)
      else {
        val expected = Multimodal.StubDecoder.decode("", "", bytes)
        assert(feats.toArray.sameElements(expected))
        assert(feats.length == Multimodal.FeatureDim)
      }
    }
  }

  test("decode runs per partition without shuffling the media") {
    val plan = Multimodal.withFeatures(Multimodal.syntheticMedia(spark, 10))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("sampleFrames tolerates zero-duration clips") {
    val media = Multimodal.syntheticMedia(spark, 50)
      .withColumn("duration_ms", when($"kind" === "video", lit(0L)).otherwise($"duration_ms"))
    assert(Multimodal.sampleFrames(media).count() == 0L) // no crash, no frames
  }

  test("sampleFrames explodes one row per sampled timestamp") {
    val media = Multimodal.syntheticMedia(spark, 200)
    val videos = media.filter($"kind" === "video" && $"duration_ms".isNotNull)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val perVideo = frames.groupBy("media_id").count()
    val joined = videos.select($"media_id", $"duration_ms")
      .join(perVideo, "media_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val expected = (r.getAs[Long]("duration_ms") + 999) / 1000
      assert(r.getAs[Long]("count") == expected,
        s"media ${r.getAs[Long]("media_id")}: ${r.getAs[Long]("count")} frames, expected $expected")
    }
  }

  test("metadata queries prune the binary column at the parquet scan") {
    val dir = Files.createTempDirectory("graft_media").toString
    Multimodal.syntheticMedia(spark, 100).write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select("media_id", "kind", "width")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("bytes"),
      s"binary column not pruned:\n$scan")
  }
}
