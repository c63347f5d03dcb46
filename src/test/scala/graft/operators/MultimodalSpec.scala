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

  test("ImageIoDecoder decodes a real PNG through withFeatures") {
    // two real images, authored via the same javax.imageio the decoder
    // reads with: 4x2 pure red PNG and a 3x3 half-gray JPEG
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", "png", png(4, 2, 0xFF0000)),   // pure red
      (2L, "image", "png", png(3, 3, 0x808080)),   // mid gray
      (3L, "image", "png", Array[Byte](1, 2, 3)),  // corrupt -> null
      (4L, "audio", "wav", Array[Byte](9, 9))      // non-image -> stub fallback
    ).toDF("media_id", "kind", "format", "bytes")
      .withColumn("width", lit(null).cast("int"))
      .withColumn("height", lit(null).cast("int"))
      .withColumn("duration_ms", lit(null).cast("long"))
      .select("media_id", "kind", "format", "width", "height", "duration_ms", "bytes")
    val out = Multimodal.withFeatures(media, new Multimodal.ImageIoDecoder())
      .select("media_id", "features").collect()
      .map(r => r.getAs[Long]("media_id") ->
        Option(r.getAs[scala.collection.Seq[Float]]("features")).map(_.toArray)).toMap

    val red = out(1L).get
    assert(red(0) == 4f && red(1) == 2f)            // dims
    assert(red(3) == 1f && red(4) == 0f && red(5) == 0f) // mean R,G,B
    assert(red(7) == 2f)                             // aspect
    assert(math.abs(red(8 + (85 >> 5)) - 1f) < 1e-6) // all pixels in lum-85 bin

    val gray = out(2L).get
    assert(gray(0) == 3f && gray(1) == 3f)
    assert(math.abs(gray(3) - 128f / 255f) < 1e-6 && gray(3) == gray(4) && gray(4) == gray(5))
    assert(math.abs(gray(8 + (128 >> 5)) - 1f) < 1e-6)

    assert(out(3L).isEmpty)                          // corrupt image -> null
    assert(out(4L).get.sameElements(                 // audio -> stub fallback
      Multimodal.StubDecoder.decode("audio", "wav", Array[Byte](9, 9))))
  }

  test("resizeMedia: real PNG downscale fits the box; stub decimates opaque bytes") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", "png", png(8, 4, 0xFF0000)),  // downscale 2x -> 4x2
      (2L, "image", "png", png(2, 2, 0x00FF00)),  // already fits -> passthrough
      (3L, "blob", "raw", (0 until 32).map(_.toByte).toArray) // stub decimation
    ).toDF("media_id", "kind", "format", "bytes")
      .withColumn("width", lit(null).cast("int"))
      .withColumn("height", lit(null).cast("int"))
      .withColumn("duration_ms", lit(null).cast("long"))
      .select("media_id", "kind", "format", "width", "height", "duration_ms", "bytes")
    val out = Multimodal.resizeMedia(media, maxW = 4, maxH = 2, Multimodal.realResizer)
      .select("media_id", "resized_bytes", "out_width", "out_height").collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Array[Byte]]("resized_bytes"), r.getAs[Int]("out_width"),
          r.getAs[Int]("out_height")))).toMap

    val (b1, w1, h1) = out(1L)
    assert(w1 == 4 && h1 == 2)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b1))
    assert(back.getWidth == 4 && back.getHeight == 2)
    assert((back.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000) // still red after bilinear
    val (b2, w2, h2) = out(2L)
    assert(w2 == 2 && h2 == 2 && b2.sameElements(media.collect()(1).getAs[Array[Byte]]("bytes")))
    // stub: 32 bytes at cap 8 -> stride 4 -> bytes 0,4,...,28
    val (b3, w3, h3) = out(3L)
    assert(w3 == 8 && h3 == 1)
    assert(b3.toSeq == (0 until 32 by 4).map(_.toByte).toSeq)
  }

  test("WavDecoder decodes a real PCM WAV through withFeatures") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // 0.25 s of a 440 Hz sine at half amplitude, 16-bit mono 8 kHz
    def wav(hz: Double, amp: Double, rate: Float = 8000f, frames: Int = 2000): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val v = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "audio", "wav", wav(440.0, 0.5)),
      (2L, "audio", "wav", "not a wav".getBytes),   // corrupt -> null features
      (3L, "audio", "mp3", Array[Byte](1, 2, 3))    // codec absent -> stub fallback
    ).toDF("media_id", "kind", "format", "bytes")
    val out = Multimodal.withFeatures(media, new Multimodal.WavDecoder())
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap

    val f = out(1L).get
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 2000f, f.take(4).toString)
    assert(math.abs(f(3) - 0.25f) < 1e-3, s"duration ${f(3)}")
    // sine RMS = amp/sqrt(2), zero-crossing rate = 2*hz/rate
    assert(math.abs(f(4) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(4)}")
    assert(math.abs(f(5) - 0.5) < 0.01, s"peak ${f(5)}")
    assert(math.abs(f(6) - 2 * 440.0 / 8000) < 0.01, s"zcr ${f(6)}")
    assert(math.abs(f.slice(8, 16).sum - 1.0) < 1e-3, "histogram must sum to 1")
    assert(out(2L).isEmpty, "corrupt wav must yield null features")
    assert(out(3L).get.sameElements(
      Multimodal.StubDecoder.decode("audio", "mp3", Array[Byte](1, 2, 3))))
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
