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

  // ------------------------------------------------------------------
  // Perceptual-hash dedup
  // ------------------------------------------------------------------

  private def mediaRow(id: Long, bytes: Array[Byte], kind: String = "image") =
    (id, kind, "raw", bytes)

  private def mediaDf(rows: Seq[(Long, String, String, Array[Byte])]) =
    rows.toDF("media_id", "kind", "format", "bytes")
      .withColumn("width", lit(null).cast("int"))
      .withColumn("height", lit(null).cast("int"))
      .withColumn("duration_ms", lit(null).cast("long"))
      .select("media_id", "kind", "format", "width", "height", "duration_ms", "bytes")

  test("dHash64 packs left<right comparisons; StubGrid wraps short payloads") {
    // ramp grid: every left < right -> all 64 bits set
    assert(Multimodal.dHash64(Array.tabulate(72)(identity)) == -1L)
    // flat grid: no strict inequality -> 0
    assert(Multimodal.dHash64(Array.fill(72)(7)) == 0L)
    // StubGrid on a 2-byte payload alternates, wrapping mod len
    val g = Multimodal.StubGrid.grid("image", "raw", Array[Byte](1, 2), 8, 9)
    assert(g.length == 72 && g(0) == 1 && g(1) == 2 && g(2) == 1 && g(71) == 2)
    assert(Multimodal.StubGrid.grid("image", "raw", Array.emptyByteArray, 8, 9) == null)
  }

  test("phash: re-encoded duplicates (same grid bytes, fresh tail) collide at hamming 0") {
    val rnd = new scala.util.Random(7)
    def payload() = Array.fill[Byte](96)((33 + rnd.nextInt(90)).toByte)
    val originals = (0L until 40L).map(i => mediaRow(i, payload()))
    // plant: ids 0..9 re-encoded — identical first 72 bytes (the grid),
    // different tail (a re-encode changes octets, not gradients)
    val reencodes = (0L until 10L).map { i =>
      val p = originals(i.toInt)._4.clone()
      (72 until 96).foreach(k => p(k) = (p(k) ^ 0x55).toByte)
      mediaRow(i + 1000L, p)
    }
    // plant: ids 20,21 corrupted — ONE grid cell changed => <= 2 bits
    val corrupted = Seq(20L, 21L).map { i =>
      val p = originals(i.toInt)._4.clone()
      p(40) = (p(40) ^ 0x7F).toByte
      mediaRow(i + 2000L, p)
    }
    val media = mediaDf(originals ++ reencodes ++ corrupted)
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // every re-encode pairs with its original at hamming exactly 0
    (0L until 10L).foreach { i =>
      assert(pairs.get((i, i + 1000L)).contains(0), s"re-encode of $i: ${pairs.get((i, i + 1000L))}")
    }
    // corrupted twins within <= 2 bits (cell 40 feeds two comparisons)
    Seq(20L, 21L).foreach { i =>
      val h = pairs.get((i, i + 2000L))
      assert(h.exists(_ <= 2), s"corrupt twin of $i: $h")
    }
    // exact clusters: each planted re-encode joins its original's cluster
    val clusters = Multimodal.phashClusters(media)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    (0L until 10L).foreach { i =>
      assert(clusters.get(i).contains((i, 2L)), s"cluster of $i: ${clusters.get(i)}")
      assert(clusters.get(i + 1000L).contains((i, 2L)))
    }
    assert(!clusters.contains(25L), "an unplanted original must not cluster")
  }

  test("phash hamming verify is exact: a far pair sharing one chunk is rejected") {
    // two payloads identical in grid cells 0..17 (chunks share bits) but
    // scrambled after: they may share a 16-bit chunk bucket, yet the
    // XOR popcount filter must reject them; a third exact copy passes
    val a = Array.tabulate[Byte](96)(k => (k % 97).toByte)
    val b = a.clone(); (18 until 72 by 2).foreach(k => b(k) = (b(k) ^ 0x3F).toByte)
    val media = mediaDf(Seq(mediaRow(1L, a), mediaRow(2L, b), mediaRow(3L, a.clone())))
    val got = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 3L, 0)), s"got $got")
  }

  test("ImageIoGrid: brightness shift and re-encode keep the dHash; different image diverges") {
    def img(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) { val v = f(x, y) & 0xFF; im.setRGB(x, y, (v << 16) | (v << 8) | v) }
      im
    }
    def png(im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val grid = new Multimodal.ImageIoGrid()
    def hash(bytes: Array[Byte]): Long =
      Multimodal.dHash64(grid.grid("image", "png", bytes, 8, 9))
    // a diagonal luminance gradient, its +30-brightness twin (monotone,
    // clamp-free: max 252 — every left<right comparison is preserved),
    // and a 2× upscale (block averaging sees the same gradients)
    val base = img(36, 32)((x, y) => 20 + x * 4 + y * 2)
    val bright = img(36, 32)((x, y) => 50 + x * 4 + y * 2)
    val big = img(72, 64)((x, y) => 20 + (x / 2) * 4 + (y / 2) * 2)
    val other = img(36, 32)((x, y) => 20 + (35 - x) * 4 + y * 2) // reversed gradient
    val h0 = hash(png(base))
    assert(hash(png(bright)) == h0, "brightness shift must preserve dHash")
    val hBig = hash(png(big))
    assert(java.lang.Long.bitCount(h0 ^ hBig) <= 3,
      s"2x upscale drifted ${java.lang.Long.bitCount(h0 ^ hBig)} bits")
    val hOther = hash(png(other))
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 16,
      s"reversed gradient too close: ${java.lang.Long.bitCount(h0 ^ hOther)} bits")
    // end-to-end through the frame: the upscaled re-render pairs with
    // the original through banding + verify
    val media = mediaDf(Seq(
      (10L, "image", "png", png(base)), (11L, "image", "png", png(big)),
      (12L, "image", "png", png(other)), (13L, "image", "png", Array[Byte](1, 2)))) // corrupt -> null hash
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3,
        grid = new Multimodal.ImageIoGrid())
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((10L, 11L)), pairs.mkString(","))
  }

  test("WavGrid: volume change keeps the audio dHash; a different envelope diverges") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // amplitude-MODULATED 440 Hz sine (a flat tone has a flat energy
    // envelope — nothing for a gradient hash to see)
    def wav(amp: Double, envelope: Int => Double, frames: Int = 4000,
            rate: Float = 8000f): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val v = (amp * envelope(i) * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val grid = new Multimodal.WavGrid()
    def hash(b: Array[Byte]): Long =
      Multimodal.dHash64(grid.grid("audio", "wav", b, 8, 9))
    val ramp = wav(0.9, i => i / 4000.0)             // rising energy
    val quiet = wav(0.45, i => i / 4000.0)           // same shape, half volume
    val decay = wav(0.9, i => 1.0 - i / 4000.0)      // reversed envelope
    val h0 = hash(ramp)
    assert(hash(quiet) == h0,
      "peak normalization must make the audio hash volume-invariant")
    assert(java.lang.Long.bitCount(h0 ^ hash(decay)) > 16,
      s"reversed envelope too close: ${java.lang.Long.bitCount(h0 ^ hash(decay))} bits")
    assert(grid.grid("audio", "wav", "not a wav".getBytes, 8, 9) == null)
    // end-to-end: the realGrid chain routes audio rows to WavGrid and
    // image rows to ImageIoGrid inside one phash pass
    val media = mediaDf(Seq(
      (30L, "audio", "wav", ramp), (31L, "audio", "wav", quiet),
      (32L, "audio", "wav", decay)))
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3,
        grid = Multimodal.realGrid)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((30L, 31L)), pairs.mkString(","))
  }

  test("videoDedup: re-muxes match on jaccard, trims on containment, distinct videos survive") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // frame payloads: distinct ASCII strings per (family, frame)
    def fb(fam: Int, k: Int): Array[Byte] =
      Array.tabulate(40)(i => (33 + (fam * 53 + k * 17 + i * 7) % 90).toByte)
    val rows = Seq(
      // video 1: family A frames 0..7; video 2: re-mux (same frames)
      (1L, 0 until 8, 0), (2L, 0 until 8, 0),
      // video 3: trim of family A — frames 2..7 only (jaccard 0.75)
      (3L, 0 until 6, 2),
      // video 9: family B — disjoint
      (9L, 0 until 8, 100)).flatMap { case (vid, ks, off) =>
      ks.map(k => Row(vid, k, "image", "raw", fb(if (off >= 100) 2 else 1, k + (off % 100))))
    }
    val schema = StructType(Seq(
      StructField("video_id", LongType), StructField("frame_no", IntegerType),
      StructField("kind", StringType), StructField("format", StringType),
      StructField("bytes", BinaryType)))
    val frames = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val vids = Multimodal.frameHashes(frames)
    val pairs = Multimodal.videoNearDupPairs(vids)
      .as[(Long, Long, Double, Double)].collect()
      .map(p => (p._1, p._2) -> (p._3, p._4)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    assert(pairs((1L, 2L))._1 == 1.0)              // re-mux: jaccard 1
    assert(pairs((1L, 3L))._1 == 0.75 && pairs((1L, 3L))._2 == 1.0) // trim: containment 1
    // jaccard alone (containment off) must MISS the trim
    val jOnly = Multimodal.videoNearDupPairs(vids, containThreshold = 1.01)
      .as[(Long, Long, Double, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(jOnly == Set((1L, 2L)), jOnly.toString)
    val kept = Multimodal.videoDedup(vids)
      .select("video_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L), kept.toString)
  }

  test("captionKeepBest: one caption per perceptual component, best score wins, singletons pass") {
    // assets 1/2/3 are one hamming-0 family (same grid bytes, fresh
    // tails), asset 9 is a singleton; captions score 2.0/3.0/NULL/1.0 —
    // the component keeps asset 2's caption (best score), reports 2
    // dropped, and is labeled by the canonical (min) asset id
    val a = Array.tabulate[Byte](96)(i => (40 + i % 60).toByte)
    def tail(seed: Int): Array[Byte] = {
      val p = a.clone(); (72 until 96).foreach(i => p(i) = (33 + (seed * 7 + i) % 90).toByte); p
    }
    val b = Array.tabulate[Byte](96)(i => (40 + (i * 13) % 60).toByte)
    val media = mediaDf(Seq(
      (1L, "image", "raw", tail(1)), (2L, "image", "raw", tail(2)),
      (3L, "image", "raw", tail(3)), (9L, "image", "raw", b)))
    val captions = Seq(
      (1L, "ok caption", Some(2.0)),
      (2L, "best caption", Some(3.0)),
      (3L, "scoreless caption", None),
      (9L, "lone caption", Some(1.0))).toDF("media_id", "caption", "score")
    val out = Multimodal.captionKeepBest(media, captions)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set((1L, "best caption", 2L, 2L), (9L, "lone caption", 9L, 0L)), out.toString)
    // tie on score -> smaller media_id's caption
    val tied = Seq(
      (1L, "from one", Some(2.0)), (2L, "from two", Some(2.0)),
      (3L, "worse", Some(1.0))).toDF("media_id", "caption", "score")
    val out2 = Multimodal.captionKeepBest(media, tied)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out2 == Set((1L, "from one", 1L, 2L)), out2.toString)
  }

  test("WavGrid honors byte order and 16-bit signedness (pcmSample contract)") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // the same amplitude-modulated sine rendered little-endian (WAVE)
    // and big-endian (AIFF) must produce the SAME energy-envelope grid
    // — decoding a BE stream as LE yields garbage amplitudes and a
    // silently wrong hash (the round-11 ADVICE finding)
    def pcmBytes(frames: Int, bigEndian: Boolean): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val v = (0.9 * (i.toDouble / frames) * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toInt
        if (bigEndian) { pcm(2 * i) = ((v >> 8) & 0xFF).toByte; pcm(2 * i + 1) = (v & 0xFF).toByte }
        else { pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte }
      }
      pcm
    }
    def container(bigEndian: Boolean, tpe: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBytes(4000, bigEndian)), fmt, 4000L)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val grid = new Multimodal.WavGrid()
    val le = grid.grid("audio", "wav", container(bigEndian = false,
      javax.sound.sampled.AudioFileFormat.Type.WAVE), 8, 9)
    val be = grid.grid("audio", "wav", container(bigEndian = true,
      javax.sound.sampled.AudioFileFormat.Type.AIFF), 8, 9)
    assert(le != null && be != null)
    assert(le.toSeq == be.toSeq,
      s"big-endian stream must decode to the same envelope grid: ${le.toSeq} vs ${be.toSeq}")
    // 16-bit unsigned is offset-coded, not two's complement: 0x0000 is
    // the NEGATIVE rail (-1.0), not silence
    assert(Multimodal.pcmSample(Array[Byte](0, 0), 0, 16, signed = false, bigEndian = false) == -1.0)
    assert(Multimodal.pcmSample(Array[Byte](0x00, 0x80.toByte), 0, 16, signed = false, bigEndian = false) == 0.0)
    assert(Multimodal.pcmSample(Array[Byte](0x00, 0x80.toByte), 0, 16, signed = true, bigEndian = false) == -1.0)
    assert(Multimodal.pcmSample(Array[Byte](0x80.toByte, 0x00), 0, 16, signed = true, bigEndian = true) == -1.0)
  }

  test("phashDedup: hamming components close transitively, each keeps its smallest id") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill[Byte](96)((33 + rnd.nextInt(90)).toByte)
    val b = a.clone(); b(20) = (b(20) ^ 0x7F).toByte // <= 2 bits from a
    val c = b.clone(); c(50) = (c(50) ^ 0x7F).toByte // <= 2 bits from b
    val lone = Array.fill[Byte](96)((33 + rnd.nextInt(90)).toByte)
    val media = mediaDf(Seq(
      mediaRow(5L, a), mediaRow(6L, b), mediaRow(7L, c), mediaRow(8L, lone)))
    // a~b and b~c qualify; whether a~c does depends on bit overlap —
    // the component must close over the chain either way
    val comps = graft.operators.Components.connectedComponents(
        Multimodal.phashNearDupPairs(media, maxHamming = 3).select("a_id", "b_id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(comps.get(5L).contains(5L) && comps.get(6L).contains(5L) &&
      comps.get(7L).contains(5L), s"chain must close into one component: $comps")
    assert(!comps.contains(8L))
    val kept = Multimodal.phashDedup(media, maxHamming = 3)
      .select("media_id").as[Long].collect().toSet
    assert(kept == Set(5L, 8L), s"keep the component minimum and the loner: $kept")
  }

  test("phashAgainst converges to batch-global phashDedup (tier ids precede batch ids)") {
    val rnd = new scala.util.Random(23)
    def payload() = Array.fill[Byte](96)((33 + rnd.nextInt(90)).toByte)
    val tierRows = (0L until 30L).map(i => mediaRow(i, payload()))
    // batch: fresh assets + re-encodes of TIER assets (cross dups) +
    // a batch-internal dup pair + a corrupted re-encode of a tier asset
    val fresh = (100L until 120L).map(i => mediaRow(i, payload()))
    val crossDups = Seq(3L, 7L).map { i =>
      val p = tierRows(i.toInt)._4.clone()
      (72 until 96).foreach(k => p(k) = (p(k) ^ 0x55).toByte)
      mediaRow(i + 1000L, p)
    }
    val corrupt = { val p = tierRows(9)._4.clone(); p(40) = (p(40) ^ 0x7F).toByte
      Seq(mediaRow(1009L + 1000L, p)) }
    val internalDup = Seq(mediaRow(3100L, fresh(5)._4.clone()))
    val tier = mediaDf(tierRows)
    val batch = mediaDf(fresh ++ crossDups ++ corrupt ++ internalDup)
    val kept = Multimodal.phashAgainst(batch, Multimodal.phashIndex(tier))
      .select("media_id").as[Long].collect().toSet
    // the contract: batch-global dedup over tier ∪ batch, batch rows
    val want = Multimodal.phashDedup(tier.unionByName(batch))
      .select("media_id").as[Long].collect().toSet
      .filter(_ >= 100L)
    assert(kept == want, s"diverges: ${kept -- want} vs ${want -- kept}")
    // cross dups and the corrupted twin reconcile against the index;
    // the internal dup loses to its smaller batch twin
    assert(Set(1003L, 1007L, 2009L, 3100L).intersect(kept).isEmpty, kept.toString)
    assert(kept.contains(105L))
  }

  test("a fully-undecodable video keeps an EMPTY hash set and survives as a singleton") {
    // the media discipline ("a corrupt byte must not delete an asset")
    // on the video profile: before round 14, frameHashes silently
    // dropped a video whose every frame failed to decode
    val frames = Seq(
        (1L, 0, Array.tabulate[Byte](40)(i => (40 + i).toByte)),
        (1L, 1, Array.tabulate[Byte](40)(i => (50 + i).toByte)),
        (2L, 0, Array.empty[Byte]),
        (2L, 1, null.asInstanceOf[Array[Byte]]))
      .toDF("video_id", "frame_no", "bytes")
      .select($"video_id", $"frame_no", lit("image").as("kind"),
        lit("raw").as("format"), $"bytes")
    val vids = Multimodal.frameHashes(frames)
    val byId = vids.collect().map(r => r.getAs[Long]("video_id") ->
      Option(r.getSeq[Long](1)).getOrElse(Seq.empty).size).toMap
    assert(byId == Map(1L -> 2, 2L -> 0), byId.toString)
    // no index rows, no pairs, still in the dedup output
    assert(Multimodal.videoIndex(vids).filter($"video_id" === 2L).count() == 0L)
    val kept = Multimodal.videoDedup(vids).select("video_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), kept.toString)
  }

  test("audioWindows/audioHashes: hop-aligned windows; a clip's set is a subset; null passes through") {
    def pay(seed: Int, halves: Int) =
      Array.tabulate[Byte](48 * halves)(i => (33 + (seed * 31 + i * 7) % 90).toByte)
    val clips = Seq(
        (1L, pay(1, 6)),                    // 5 windows
        (2L, pay(1, 6).drop(96)),           // hop-aligned clip: 3 windows, all in 1's set
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("audio_id", "bytes")
      .select($"audio_id", lit("audio").as("kind"), lit("raw").as("format"), $"bytes")
    // window accounting: (len - 96)/48 + 1
    val wins = Multimodal.audioWindows(clips)
      .groupBy("audio_id").count().collect()
      .map(r => r.getAs[Long]("audio_id") -> r.getAs[Long]("count")).toMap
    assert(wins == Map(1L -> 5L, 2L -> 3L, 3L -> 1L), wins.toString)
    val sets = Multimodal.audioHashes(clips).collect()
      .map(r => r.getAs[Long]("audio_id") ->
        Option(r.getSeq[Long](1)).getOrElse(Seq.empty).toSet).toMap
    assert(sets(2L).subsetOf(sets(1L)) && sets(2L).size == 3, sets.toString)
    assert(sets(3L).isEmpty, "null payload keeps an empty set (pass-through)")
    // the clip collapses on containment; the corrupt clip survives
    val kept = Multimodal.audioDedup(Multimodal.audioHashes(clips))
      .select("audio_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toString)
  }

  test("PcmWindowGrid through audioHashes: volume-shifted PCM re-encode matches; clip windows subset (sample-true path)") {
    // 16-bit little-endian mono PCM: a deterministic "melody" of
    // per-sample amplitudes; the half-volume rendition scales every
    // sample by 0.5 exactly (no rounding drift for even amplitudes),
    // so each window's peak-normalized envelope — hence each window
    // hash — is IDENTICAL
    def pcm(scale: Int, nSamples: Int): Array[Byte] = {
      val out = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = ((i * 37 + (i % 13) * 101) % 256 - 128) * 2 * scale
        out(2 * i) = (v & 0xFF).toByte
        out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      out
    }
    val grid = new Multimodal.PcmWindowGrid(bits = 16, signed = true,
      bigEndian = false, channels = 1)
    // 96-byte windows = 48 samples per window; 288 bytes = 5 windows
    val clips = Seq(
        (1L, pcm(2, 144)), (2L, pcm(1, 144)),   // volume-shifted twin
        (3L, pcm(2, 144).drop(96)))             // hop-aligned clip
      .toDF("audio_id", "bytes")
      .select($"audio_id", lit("audio").as("kind"), lit("pcm").as("format"), $"bytes")
    val sets = Multimodal.audioHashes(clips, grid).collect()
      .map(r => r.getAs[Long]("audio_id") -> r.getSeq[Long](1).toSet).toMap
    assert(sets(1L) == sets(2L), "a pure volume change must not move any window hash")
    assert(sets(3L).subsetOf(sets(1L)), s"clip windows must subset: $sets")
    val kept = Multimodal.audioDedup(Multimodal.audioHashes(clips, grid))
      .select("audio_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"re-encode (jaccard) and clip (containment) both collapse: $kept")
  }

  test("phash bucket cap: a degenerate hash family is skipped and REPORTED, never exploded") {
    val same = Array.tabulate[Byte](96)(k => (k * 3 % 91).toByte)
    val media = mediaDf((0L until 30L).map(i => mediaRow(i, same.clone())))
    val pairs = Multimodal.phashNearDupPairs(media, maxBucketSize = 10)
    assert(pairs.count() == 0L, "capped buckets must emit no pairs")
    val skipped = Multimodal.skippedPhashBuckets(media, maxBucketSize = 10).collect()
    assert(skipped.length == 4 && skipped.forall(_.getAs[Long]("member_count") == 30L),
      s"skips must be reported per chunk: ${skipped.toSeq}")
  }
}
