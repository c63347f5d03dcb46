package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the heavy corpus operators: the sf0.1 corpus
  * replicated 10× with shifted ids (the "duplicated crawl" shape —
  * 50k docs) and the embedding corpus 4× (8k vectors at sf0.1), through the
  * end-to-end dedup/curation paths. Prints ONE JSON line of
  * {op: {sec, rows}}. Not part of the driver contract — run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleSmoke"
  *
  * The interesting assertions are structural and checked here, not
  * just timed: every exact-duplication family collapses to one
  * survivor, and packing's global offset equals the token sum.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Replication multipliers (SPARK_GRAFT_SCALE_MULT docs,
    // SPARK_GRAFT_SCALE_VMULT vectors): default 10×/4× = the 50k-doc
    // tier; mult=100 gives the 500k-doc tier for measuring one more
    // decade of scaling. SPARK_GRAFT_SCALE_OPS comma-filters ops.
    val mult = sys.env.get("SPARK_GRAFT_SCALE_MULT").map(_.toInt).getOrElse(10)
    val vmult = sys.env.get("SPARK_GRAFT_SCALE_VMULT").map(_.toInt).getOrElse(4)
    val only = sys.env.get("SPARK_GRAFT_SCALE_OPS").map(_.split(",").toSet)
    val docs0 = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val docs = (0 until mult).map(i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint(true)
    val emb0 = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val emb = (0 until vmult).map(i =>
      emb0.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nDocs = docs.count()
    val nVecs = emb.count()

    var results = Vector.empty[(String, Double, Long)]
    // State hygiene (round-10): ops localCheckpoint intermediates, and
    // in ONE shared JVM those blocks accumulate — the round-9 500k
    // containment run OOM'd an 8g heap only because three PRIOR ops'
    // checkpoint state was still resident. After each op, every RDD it
    // persisted (the set difference against the pre-op snapshot) is
    // released blocking + the DF cache cleared, so each op starts from
    // the same storage state and the full op list shares a JVM.
    // `retain = true` marks ops that EXPORT checkpointed state to later
    // ops (the stored-index build feeding the query-only op).
    def timed(name: String, retain: Boolean = false)(body: => Long): Unit =
      if (only.forall(_.contains(name))) {
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val t0 = System.nanoTime()
        val rows = body
        val sec = (System.nanoTime() - t0) / 1e9
        // stream each row as it lands — a failed LATER op must not
        // lose the measurements already taken
        System.err.println(f"[scale] $name%s ${sec}%.3f s, $rows%d rows")
        results :+= ((name, sec, rows))
        if (!retain) {
          spark.sparkContext.getPersistentRDDs
            .filter { case (id, _) => !before(id) }
            .values.foreach(_.unpersist(blocking = true))
          spark.sharedState.cacheManager.clearCache()
          // broadcast blocks (join builds, literal tables) are reaped
          // by the ContextCleaner only AFTER a driver GC collects
          // their references — without a nudge they accumulate across
          // 40 ops and the peak-heap op (containment_summary's 26 M
          // pair aggregate) tips over; one explicit GC per op keeps
          // the shared-JVM baseline flat
          System.gc()
          val rt = Runtime.getRuntime
          System.err.println(f"[scale] $name%s post-release heap " +
            f"${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%d MiB")
        }
      }

    timed("dedup_near_minhash_50k") {
      // MEDIAN-OF-3 row (r11 finding: this row moved 97.5→147.5 s
      // across rounds with zero code changes in its path — the same-JVM
      // reps below pin whether that spread is ambient or real; per-rep
      // times print so PLANS.md can record the measured spread, and the
      // row's wall time is the MEDIAN rep, the Bench fixtureHeavy
      // discipline carried to the decade table). The timed() wrapper
      // still reports total wall; the [scale-ab] line is the signal.
      var n = 0L
      val reps = (1 to 3).map { _ =>
        val pre = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val t = System.nanoTime()
        n = operators.TextDedup.dedupNearMinhash(docs, jaccardThreshold = 0.5).count()
        val sec = (System.nanoTime() - t) / 1e9
        // release the rep's checkpoint pins so every rep starts from
        // the same storage state (timed() only releases at op end)
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !pre(id) }
          .values.foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        sec
      }
      require(n <= nDocs / mult, s"${mult}x duplication families must collapse: kept $n of $nDocs")
      val sorted = reps.sorted
      System.err.println(f"[scale-ab] dedup_near_minhash reps " +
        f"${reps.map(r => f"$r%.1f").mkString("/")} s; median ${sorted(1)}%.1f s; " +
        f"spread ${(sorted(2) - sorted(0)) / sorted(1) * 100}%.0f%% of median")
      n
    }
    timed("dedup_blocks_50k") {
      val out = operators.TextDedup.dedupBlocks(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      // 10x clone families: at most one doc per family keeps any block
      val keepers = out.filter(col("kept_blocks") > 0).count()
      require(keepers <= nDocs / mult, s"clone blocks must collapse: $keepers keepers of $nDocs")
      n
    }
    timed("strip_boilerplate_50k") {
      val out = operators.TextDedup.stripCommonSegments(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      // 10x clones: every aligned segment has df >= 10, so EVERYTHING
      // is boilerplate and every doc must reassemble empty.
      val survivors = out.filter(col("kept_segments") > 0).count()
      require(survivors == 0, s"$survivors docs kept segments in an all-clone corpus")
      n
    }
    timed("decontaminate_50k") {
      val bench = docs0.filter(col("doc_id") % 50 === 0)
        .select(substring(col("text"), 1, 200).as("text"))
      operators.Curation.decontaminate(docs, bench).count()
    }
    timed("decontaminate_bloom_50k") {
      val bench = docs0.filter(col("doc_id") % 50 === 0)
        .select(substring(col("text"), 1, 200).as("text"))
      val nBloom = operators.Curation.decontaminateBloom(docs, bench).count()
      val nExact = operators.Curation.decontaminate(docs, bench).count()
      require(nBloom == nExact, s"bloom path kept $nBloom, exact kept $nExact")
      nBloom
    }
    timed("classifier_score_50k") {
      val model = operators.Curation.hashedModel(spark, 4096)
      val out = operators.Curation.classifierScore(docs, model, 4096).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one score per doc: $n of $nDocs")
      // clone families share text → identical scores within the family
      val bad = out.withColumn("fam", col("doc_id") % 1000000L)
        .groupBy("fam").agg(countDistinct(col("score")).as("d"))
        .filter(col("d") > 1).count()
      require(bad == 0, s"$bad clone families with diverging scores")
      n
    }
    timed("quantize_int8_8k") {
      val q = operators.Similarity.quantizeInt8(emb).localCheckpoint(true)
      val n = q.count()
      require(n == nVecs, s"one code row per vector: $n of $nVecs")
      val bad = q.filter(exists(col("codes"), c => c < 0 || c > 255)).count()
      require(bad == 0, s"$bad vectors with out-of-range codes")
      n
    }
    timed("pack_sequences_50k") {
      val packed = operators.Curation.packSequences(docs).localCheckpoint(true)
      val agg = packed.agg(sum("token_count").as("toks"),
        max(col("start_offset") + col("token_count")).as("end")).head()
      require(agg.getLong(0) == agg.getLong(1), "global prefix sum must be gap-free")
      packed.count()
    }
    timed("tfidf_top_terms_50k") {
      operators.Curation.tfidfTopTerms(docs).count()
    }
    timed("quality_filter_50k") {
      operators.Curation.qualityFilter(docs).filter(col("keep")).count()
    }
    timed("dedup_near_cosine_20k") {
      val kept = operators.Similarity.dedupNearCosine(emb, 0.999)
      val n = kept.count()
      require(n <= nVecs / vmult, s"${vmult}x identical vectors must collapse: kept $n of $nVecs")
      n
    }
    timed("shuffle_epoch_50k") {
      val out = operators.Curation.globalShuffle(docs, seed = 7L).localCheckpoint(true)
      val agg = out.agg(count(lit(1)).as("n"), max("position").as("mx"),
        countDistinct(col("position")).as("d")).head()
      require(agg.getLong(0) == nDocs && agg.getLong(1) == nDocs - 1 &&
        agg.getLong(2) == nDocs,
        s"positions must be a permutation of 0..${nDocs - 1}: $agg")
      agg.getLong(0)
    }
    timed("chunk_overlap_50k") {
      val chunks = operators.Curation.chunkByChars(docs, chunkLen = 200, overlap = 50)
        .localCheckpoint(true)
      // overlap accounting: per doc, sum(chunk_len) − (chunks−1)·50 must
      // equal the doc's length (chunks tile the doc with exact overlap)
      val bad = chunks.groupBy("doc_id")
        .agg(sum("chunk_len").as("s"), count(lit(1)).as("c"))
        .join(docs.select(col("doc_id"), length(col("text")).as("len")), Seq("doc_id"))
        .filter(col("s") - (col("c") - 1) * 50 =!= col("len"))
        .count()
      require(bad == 0, s"$bad docs fail the chunk-coverage identity")
      chunks.count()
    }
    timed("knn_graph_20k") {
      // 4x clone corpus: every vector's rank-1 neighbor MUST be one of
      // its own clones (cosine exactly 1), and every vector must appear
      // as a source (its clones guarantee bucket-mates in every band)
      val g = operators.Similarity.knnGraph(emb, k = 1, bands = 4, planesPerBand = 8)
        .localCheckpoint(true)
      val n = g.count()
      require(n == nVecs, s"every vector needs a rank-1 row: $n of $nVecs")
      val bad = g.filter(col("src_id") % 1000000L =!= col("neighbor_id") % 1000000L ||
        col("sim") < 0.999999).count()
      require(bad == 0, s"$bad vectors whose rank-1 is not an identical clone")
      n
    }
    timed("media_ingest_50k") {
      // the MEDIA treadmill at corpus scale: one 96-byte payload per
      // doc (md5-hex triple — clone replicas share text, hence payload,
      // hence phash: mult-member exact-dup families), replica halves
      // split into two slices so every family STRADDLES the slice
      // boundary and must reconcile against the STORED index. The tier
      // must equal batch-global phashDedup over everything — the
      // convergence contract, asserted exactly.
      import graft.pipeline.MediaPipeline
      MediaPipeline.resetTreadmill(spark)
      val payload = concat(md5(col("text")),
        md5(concat(col("text"), lit(":1"))), md5(concat(col("text"), lit(":2"))))
      val media = docs.filter(col("text").isNotNull).select(
          col("doc_id").as("media_id"), lit("image").as("kind"), lit("raw").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"), payload.cast("binary").as("bytes"))
        .localCheckpoint(true)
      val cut = (mult / 2).max(1) * 1000000L
      val r1 = MediaPipeline.ingestBatch(spark, media.filter(col("media_id") < cut))
      require(r1.ok, r1.stages.toString)
      val r2 = MediaPipeline.ingestBatch(spark, media.filter(col("media_id") >= cut))
      require(r2.ok, r2.stages.toString)
      require(r1.metrics("skipped_cross_buckets") == 0L &&
        r2.metrics("skipped_cross_buckets") == 0L,
        s"no bucket may skip on a sane corpus: ${r2.metrics}")
      val tier = spark.table(MediaPipeline.TierTable).count()
      val expected = operators.Multimodal.phashDedup(media).count()
      require(tier == expected,
        s"treadmill must converge to batch-global phashDedup: $tier vs $expected")
      require(spark.table(MediaPipeline.PhashIndexTable).count() == 4 * tier,
        "stored index must cover the tier 4 rows per asset")
      MediaPipeline.resetTreadmill(spark)
      tier
    }
    timed("caption_ingest_50k") {
      // the CAPTION treadmill at corpus scale: the media_ingest fixture
      // (mult-member exact-dup families straddling the slice cut) with
      // one deterministic-scored caption per asset. The running
      // keep-best artifact must equal batch-global captionKeepBest over
      // ALL assets + captions — the incremental fold's convergence
      // contract, asserted row-for-row — and no family may bridge.
      import graft.pipeline.MediaPipeline
      MediaPipeline.resetTreadmill(spark)
      val payload = concat(md5(col("text")),
        md5(concat(col("text"), lit(":1"))), md5(concat(col("text"), lit(":2"))))
      val media = docs.filter(col("text").isNotNull).select(
          col("doc_id").as("media_id"), lit("image").as("kind"), lit("raw").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"), payload.cast("binary").as("bytes"))
        .localCheckpoint(true)
      val capsAll = media.select(col("media_id"),
        concat(lit("caption "), col("media_id")).as("caption"),
        (col("media_id") % 997).cast("double").as("score"))
      val cut = (mult / 2).max(1) * 1000000L
      val r1 = MediaPipeline.ingestBatch(spark, media.filter(col("media_id") < cut),
        captions = Some(capsAll.filter(col("media_id") < cut)))
      require(r1.ok, r1.stages.toString)
      val r2 = MediaPipeline.ingestBatch(spark, media.filter(col("media_id") >= cut),
        captions = Some(capsAll.filter(col("media_id") >= cut)))
      require(r2.ok, r2.stages.toString)
      require(r1.metrics("bridged_components") == 0L &&
        r2.metrics("bridged_components") == 0L,
        s"clone families must not bridge: ${r2.metrics}")
      val got = spark.table(MediaPipeline.CaptionsTable)
        .select("media_id", "kept_caption", "kept_from", "dropped_count")
      val want = operators.Multimodal.captionKeepBest(media, capsAll)
        .select("media_id", "kept_caption", "kept_from", "dropped_count")
      require(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "running caption artifact must equal batch-global captionKeepBest")
      val n = got.count()
      MediaPipeline.resetTreadmill(spark)
      n
    }
    timed("caption_keep_best_50k") {
      // cross-modal keep-best at corpus scale: clone families (every
      // replica shares its base doc's payload, hence phash) collapse to
      // ONE caption each, chosen by the classifier score over per-clone
      // caption variants. Exact structural assertion: the output ids
      // equal phashDedup's survivors (both are the component minima)
      // and the dropped counts sum to the caption total minus one per
      // component.
      val payload = concat(md5(col("text")),
        md5(concat(col("text"), lit(":1"))), md5(concat(col("text"), lit(":2"))))
      val media = docs.filter(col("text").isNotNull).select(
          col("doc_id").as("media_id"), lit("image").as("kind"), lit("raw").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"), payload.cast("binary").as("bytes"))
        .localCheckpoint(true)
      val caps = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          concat(col("text"), lit(" v"), pmod(col("doc_id"), lit(7)).cast("string")).as("caption"))
      val scored = operators.Curation.classifierScore(
          caps.withColumnRenamed("media_id", "doc_id"),
          operators.Curation.hashedModel(spark, 4096), dim = 4096, textCol = "caption")
        .select(col("doc_id").as("media_id"), col("score"))
      val out = operators.Multimodal.captionKeepBest(media, caps.join(scored, Seq("media_id")))
        .localCheckpoint(true)
      val n = out.count()
      val keepIds = operators.Multimodal.phashDedup(media)
        .select("media_id").localCheckpoint(true)
      require(n == keepIds.count(), s"one caption per component: $n vs ${keepIds.count()}")
      require(out.join(keepIds, Seq("media_id"), "left_anti").count() == 0,
        "output ids must be exactly the component minima")
      val dropped = out.agg(sum("dropped_count")).head().getLong(0)
      require(n + dropped == caps.count(), s"drop accounting: $n kept + $dropped != ${caps.count()}")
      // cap-never-silent MEASURED at scale: per (chunk, key) bucket of
      // size n the banding admits C(n,2) candidate pairs or the skip
      // reporter owns them — ok(cap) + skipped(cap) must equal the raw
      // bucket pair count, at the default cap AND at a cap the clone
      // families (mult members) actually overflow
      val idx = operators.Multimodal.phashIndex(media).localCheckpoint(true)
      val cnts = idx.groupBy("chunk", "key").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).localCheckpoint(true)
      def pairSum(df: org.apache.spark.sql.DataFrame): Long = df
        .agg(coalesce(sum(((col("n") * (col("n") - 1)) / 2).cast("long")), lit(0L)))
        .head().getLong(0)
      val raw = pairSum(cnts)
      val tinyCap = (mult / 2).max(2)
      for (cap <- Seq(operators.TextDedup.DefaultMaxBucketSize, tinyCap)) {
        val ok = pairSum(cnts.filter(col("n") <= cap))
        val skipped = pairSum(operators.Multimodal
          .skippedPhashBucketsFromIndex(idx, cap)
          .select(col("member_count").as("n")))
        require(ok + skipped == raw,
          s"skip accounting must reconcile at cap $cap: $ok + $skipped != $raw")
        if (cap == tinyCap) require(skipped > 0L,
          s"cap $cap must actually skip the mult-sized clone families")
      }
      n
    }
    timed("video_dedup_50k") {
      // video dedup at corpus scale: one 8-frame video per doc, clone
      // families share every frame payload. With 8-frame sets, BOTH
      // thresholds (jaccard/containment >= 0.9) require identical sets
      // (k/8 >= 0.9 -> k = 8), so survivors must equal the distinct
      // frame-set classes EXACTLY — individual frame-hash collisions
      // cannot create a qualifying pair.
      val frames = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("video_id"),
          explode(sequence(lit(0), lit(7))).as("frame_no"), col("text"))
        .select(col("video_id"), col("frame_no"), lit("image").as("kind"),
          lit("raw").as("format"),
          md5(concat(col("text"), lit(":f"), col("frame_no").cast("string")))
            .cast("binary").as("bytes"))
      val vids = operators.Multimodal.frameHashes(frames).localCheckpoint(true)
      val kept = operators.Multimodal.videoDedup(vids).count()
      val classes = vids.select("frame_hashes").distinct().count()
      require(kept == classes, s"survivors must equal distinct frame-set classes: $kept vs $classes")
      // the same skip reconciliation one level up: frame-hash buckets
      // of size n admit C(n,2) candidates or the reporter owns them
      val vIdx = operators.Multimodal.videoIndex(vids).localCheckpoint(true)
      val vcnts = vIdx.groupBy("frame_hash").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).localCheckpoint(true)
      def vPairSum(df: org.apache.spark.sql.DataFrame): Long = df
        .agg(coalesce(sum(((col("n") * (col("n") - 1)) / 2).cast("long")), lit(0L)))
        .head().getLong(0)
      val vRaw = vPairSum(vcnts)
      val vTiny = (mult / 2).max(2)
      for (cap <- Seq(operators.TextDedup.DefaultMaxBucketSize, vTiny)) {
        val ok = vPairSum(vcnts.filter(col("n") <= cap))
        val skipped = vPairSum(operators.Multimodal
          .skippedVideoBucketsFromIndex(vIdx, cap)
          .select(col("member_count").as("n")))
        require(ok + skipped == vRaw,
          s"video skip accounting must reconcile at cap $cap: $ok + $skipped != $vRaw")
        if (cap == vTiny) require(skipped > 0L,
          s"cap $cap must actually skip the mult-sized clone families")
      }
      kept
    }
    timed("video_ingest_50k") {
      // the VIDEO treadmill at corpus scale: one 8-frame video per doc,
      // clone families share every frame payload, replica halves split
      // at the same cut as media_ingest_50k so every family STRADDLES
      // the slice boundary and must reconcile against the STORED
      // frame-hash index. Tier must equal batch-global videoDedup over
      // everything (videoAgainst's convergence contract), exactly.
      import graft.pipeline.VideoPipeline
      VideoPipeline.resetTreadmill(spark)
      val frames = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("video_id"),
          explode(sequence(lit(0), lit(7))).as("frame_no"), col("text"))
        .select(col("video_id"), col("frame_no"), lit("image").as("kind"),
          lit("raw").as("format"),
          md5(concat(col("text"), lit(":f"), col("frame_no").cast("string")))
            .cast("binary").as("bytes"))
        .localCheckpoint(true)
      val cut = (mult / 2).max(1) * 1000000L
      val r1 = VideoPipeline.ingestBatch(spark, frames.filter(col("video_id") < cut))
      require(r1.ok, r1.stages.toString)
      val r2 = VideoPipeline.ingestBatch(spark, frames.filter(col("video_id") >= cut))
      require(r2.ok, r2.stages.toString)
      require(r1.metrics("skipped_cross_buckets") == 0L &&
        r2.metrics("skipped_cross_buckets") == 0L,
        s"no bucket may skip on a sane corpus: ${r2.metrics}")
      val tier = spark.table(VideoPipeline.TierTable).count()
      val expected = operators.Multimodal.videoDedup(
        operators.Multimodal.frameHashes(frames)).count()
      require(tier == expected,
        s"treadmill must converge to batch-global videoDedup: $tier vs $expected")
      VideoPipeline.resetTreadmill(spark)
      tier
    }
    timed("video_caption_ingest_50k") {
      // the VIDEO-CAPTION treadmill at corpus scale: the video_ingest
      // fixture (clone families = re-muxes straddling the slice cut)
      // plus a planted TRIM per base doc (frames 2..7, landing in
      // slice 2 with the family's best-scored caption) — the running
      // keep-best artifact must equal batch-global keep-best over ALL
      // videos + captions row-for-row, every trim's caption must win
      // its family, no family may bridge, and the cross-bucket skip
      // reporter must actually fire at a cap the clone families
      // overflow.
      import graft.pipeline.VideoPipeline
      VideoPipeline.resetTreadmill(spark)
      def mkFrames(ids: org.apache.spark.sql.DataFrame, from: Int, n: Int) = ids
        .select(col("video_id"), col("text"),
          explode(sequence(lit(from), lit(from + n - 1))).as("fno"))
        .select(col("video_id"), (col("fno") - from).as("frame_no"),
          lit("image").as("kind"), lit("raw").as("format"),
          md5(concat(col("text"), lit(":f"), col("fno").cast("string")))
            .cast("binary").as("bytes"))
      val base = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("video_id"), col("text"))
      val trimBase = 500000000L
      val trims = base.filter(col("video_id") < 1000000L)
        .select((col("video_id") + trimBase).as("video_id"), col("text"))
      val frames = mkFrames(base, 0, 8).unionByName(mkFrames(trims, 2, 6))
        .localCheckpoint(true)
      val capsAll = base.select(col("video_id")).unionByName(trims.select(col("video_id")))
        .select(col("video_id"), concat(lit("cap "), col("video_id")).as("caption"),
          when(col("video_id") >= trimBase, lit(2000.0))
            .otherwise(pmod(col("video_id"), lit(997)).cast("double")).as("score"))
        .localCheckpoint(true)
      val cut = (mult / 2).max(1) * 1000000L
      val r1 = VideoPipeline.ingestBatch(spark, frames.filter(col("video_id") < cut),
        captions = Some(capsAll.filter(col("video_id") < cut)))
      require(r1.ok, r1.stages.toString)
      val r2 = VideoPipeline.ingestBatch(spark, frames.filter(col("video_id") >= cut),
        captions = Some(capsAll.filter(col("video_id") >= cut)))
      require(r2.ok, r2.stages.toString)
      require(r1.metrics("bridged_components") == 0L &&
        r2.metrics("bridged_components") == 0L,
        s"clone families must not bridge: ${r2.metrics}")
      require(r1.metrics("skipped_cross_buckets") == 0L &&
        r2.metrics("skipped_cross_buckets") == 0L,
        s"no bucket may skip at the default cap: ${r2.metrics}")
      // batch-global equality row-for-row: the incremental fold against
      // an empty store IS batch-global keep-best (the proven
      // equivalence), over ONE closure of all videos
      val allVids = operators.Multimodal.frameHashes(frames).localCheckpoint(true)
      val comps = operators.Components.connectedComponents(
        operators.Multimodal.videoNearDupPairs(allVids).select("a_id", "b_id"))
      val emptyStored = spark.range(0).select(col("id").as("media_id"),
        lit(null).cast("string").as("kept_caption"), col("id").as("kept_from"),
        lit(null).cast("double").as("kept_score"), col("id").as("dropped_count"))
      val want = operators.Multimodal.captionKeepBestAgainst(comps, emptyStored,
          capsAll.withColumnRenamed("video_id", "media_id"))
        .select(col("media_id").as("video_id"), col("kept_caption"),
          col("kept_from"), col("dropped_count"))
      val got = spark.table(VideoPipeline.CaptionsTable)
        .select("video_id", "kept_caption", "kept_from", "dropped_count")
      require(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "running video-caption artifact must equal batch-global keep-best")
      // every trim family keeps a trim's caption (score 2000 beats
      // every re-mux's < 997); families count by TEXT CLASS — base
      // docs sharing a text share every frame payload and merge
      val trimWins = got.filter(col("kept_from") >= trimBase).count()
      val trimClasses = trims.select("text").distinct().count()
      require(trimWins == trimClasses,
        s"every planted trim caption must win its family: $trimWins vs $trimClasses")
      // the cross-bucket skip reporter fires at tier scale when the cap
      // is below the clone-family size (cap-never-silent, measured)
      val tinyCap = (mult / 2).max(2)
      val skips = operators.Multimodal.skippedVideoBucketsAgainst(
        operators.Multimodal.videoIndex(
          allVids.join(frames.select(col("video_id")).distinct()
            .filter(col("video_id") >= cut), Seq("video_id"), "left_semi")),
        spark.table(VideoPipeline.FrameIndexTable), tinyCap).count()
      require(skips > 0L, s"cap $tinyCap must skip the mult-sized clone families")
      val n = got.count()
      VideoPipeline.resetTreadmill(spark)
      n
    }
    timed("audio_caption_ingest_50k") {
      // the AUDIO treadmill at corpus scale — the fifth modality's
      // decade row, and the Treadmill skeleton's scale proof: clone
      // families (re-encodes sharing every window) straddle the slice
      // cut, a hop-aligned CLIP per base doc lands in slice 2 with the
      // family's best-scored transcript. Asserted: the running
      // keep-best artifact equals batch-global keep-best row-for-row,
      // every clip's transcript wins its family (per TEXT class), no
      // bridges, and the skip reporter fires at a cap the clone
      // families overflow.
      import graft.pipeline.AudioPipeline
      AudioPipeline.resetTreadmill(spark)
      val payload = concat((0 until 8).map(j =>
        md5(concat(col("text"), lit(":sa" + j)))): _*)
      val base = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("audio_id"), col("text"), payload.as("p"))
      val clipBase = 500000000L
      val clips = base.filter(col("audio_id") < 1000000L)
        .select((col("audio_id") + clipBase).as("audio_id"), col("text"),
          substring(col("p"), 97, 160).as("p"))
      def toAudio(df: org.apache.spark.sql.DataFrame) =
        df.select(col("audio_id"), lit("audio").as("kind"),
          lit("raw").as("format"), col("p").cast("binary").as("bytes"))
      val all = toAudio(base.select("audio_id", "p")
        .unionByName(clips.select("audio_id", "p"))).localCheckpoint(true)
      val capsAll = base.select(col("audio_id")).unionByName(clips.select(col("audio_id")))
        .select(col("audio_id"), concat(lit("transcript "), col("audio_id")).as("caption"),
          when(col("audio_id") >= clipBase, lit(2000.0))
            .otherwise(pmod(col("audio_id"), lit(997)).cast("double")).as("score"))
        .localCheckpoint(true)
      val cut = (mult / 2).max(1) * 1000000L
      val r1 = AudioPipeline.ingestBatch(spark, all.filter(col("audio_id") < cut),
        captions = Some(capsAll.filter(col("audio_id") < cut)))
      require(r1.ok, r1.stages.toString)
      val r2 = AudioPipeline.ingestBatch(spark, all.filter(col("audio_id") >= cut),
        captions = Some(capsAll.filter(col("audio_id") >= cut)))
      require(r2.ok, r2.stages.toString)
      require(r1.metrics("bridged_components") == 0L &&
        r2.metrics("bridged_components") == 0L,
        s"clone families must not bridge: ${r2.metrics}")
      require(r1.metrics("skipped_cross_buckets") == 0L &&
        r2.metrics("skipped_cross_buckets") == 0L,
        s"no bucket may skip at the default cap: ${r2.metrics}")
      // batch-global equality row-for-row over ONE closure of all clips
      val allSets = operators.Multimodal.audioHashes(all).localCheckpoint(true)
      val comps = operators.Components.connectedComponents(
        operators.Multimodal.audioNearDupPairs(allSets).select("a_id", "b_id"))
      val emptyStored = spark.range(0).select(col("id").as("media_id"),
        lit(null).cast("string").as("kept_caption"), col("id").as("kept_from"),
        lit(null).cast("double").as("kept_score"), col("id").as("dropped_count"))
      val want = operators.Multimodal.captionKeepBestAgainst(comps, emptyStored,
          capsAll.withColumnRenamed("audio_id", "media_id"))
        .select(col("media_id").as("audio_id"), col("kept_caption"),
          col("kept_from"), col("dropped_count"))
      val got = spark.table(AudioPipeline.CaptionsTable)
        .select("audio_id", "kept_caption", "kept_from", "dropped_count")
      require(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "running transcript artifact must equal batch-global keep-best")
      val clipWins = got.filter(col("kept_from") >= clipBase).count()
      val clipClasses = clips.select("text").distinct().count()
      require(clipWins == clipClasses,
        s"every planted clip transcript must win its family: $clipWins vs $clipClasses")
      // the cross-bucket skip reporter fires below the clone-family size
      val tinyCap = (mult / 2).max(2)
      val skips = operators.Multimodal.skippedAudioBucketsAgainst(
        operators.Multimodal.audioIndex(
          allSets.join(all.select(col("audio_id")).distinct()
            .filter(col("audio_id") >= cut), Seq("audio_id"), "left_semi")),
        spark.table(AudioPipeline.WindowIndexTable), tinyCap).count()
      require(skips > 0L, s"cap $tinyCap must skip the mult-sized clone families")
      val n = got.count()
      AudioPipeline.resetTreadmill(spark)
      n
    }
    timed("stream_ingest_50k") {
      // the STREAMING treadmill at corpus scale: clone replicas split
      // into two landed slices, two checkpointed drains (the second a
      // restart) — cross-slice clone families must reconcile so the
      // tier collapses to ~one survivor per family
      graft.pipeline.CurationPipeline.resetTreadmill(spark)
      val land = java.nio.file.Files.createTempDirectory("scale_si_land").toString
      val cp = java.nio.file.Files.createTempDirectory("scale_si_cp").toString
      val half = (mult / 2).toLong * 1000000L
      docs.filter(col("doc_id") < half).coalesce(4).write.mode("append").json(land)
      require(graft.pipeline.CurationPipeline.streamIngest(spark, land, cp)
        .awaitTermination(600000), "slice 1 drain timed out")
      docs.filter(col("doc_id") >= half).coalesce(4).write.mode("append").json(land)
      require(graft.pipeline.CurationPipeline.streamIngest(spark, land, cp)
        .awaitTermination(600000), "slice 2 drain timed out")
      val tier = spark.table(graft.pipeline.CurationPipeline.TierTable).count()
      require(tier <= nDocs / mult,
        s"cross-slice clone families must collapse: tier $tier of $nDocs")
      tier
    }
    timed("tokenize_ingest_50k") {
      // the TOKENIZING + PACKING treadmill at corpus scale: tokenizer
      // frozen up front, two ingestBatch slices tokenize against it
      // and continue the packed stream through the carry cursor. The
      // structural assertions are the incremental==global equalities:
      // the id table equals the batch-global tokenize of the clean
      // tier (token totals + UNK-free), every published sequence is
      // full, and published+carry conserves the id stream exactly.
      val cp = graft.pipeline.CurationPipeline
      cp.resetTreadmill(spark)
      cp.publishTokenizer(spark, docs, numMerges = 32)
      val half = (mult / 2).toLong * 1000000L
      val r1 = cp.ingestBatch(spark, docs.filter(col("doc_id") < half),
        tokenize = true, packSeqLen = 2048)
      require(r1.ok, r1.stages.toString)
      val r2 = cp.ingestBatch(spark, docs.filter(col("doc_id") >= half),
        tokenize = true, packSeqLen = 2048)
      require(r2.ok, r2.stages.toString)
      val merges = spark.table(cp.BpeMergesTable).orderBy("rank").collect()
        .map(r => operators.Bpe.Merge(r.getAs[Int]("rank"),
          r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
          r.getAs[Long]("pair_count"))).toSeq
      val idTotals = spark.table(cp.TokenIdsTable).agg(
        count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(size(filter(col("token_ids"),
          i => i === lit(operators.Bpe.UnkId)))), lit(0)).cast("long")).head()
      require(idTotals.getLong(2) == 0L, "tier tokenization must be UNK-free")
      val wantIds = operators.Bpe.encodedTokenCounts(
          spark.table(cp.CleanTierTable), merges)
        .agg(coalesce(sum(col("bpe_tokens")), lit(0L))).head().getLong(0)
      require(idTotals.getLong(1) == wantIds,
        s"incremental ids ${idTotals.getLong(1)} must equal batch-global $wantIds")
      val pub = spark.table(cp.IdSequencesTable).agg(
        count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(min(size(col("token_ids"))), lit(2048)).cast("long")).head()
      require(pub.getLong(2) == 2048L || pub.getLong(0) == 0L,
        "every published sequence must be exactly full")
      val st = spark.table(cp.PackStateTable).head()
      val carry = Option(st.getSeq[Long](1)).map(_.size.toLong).getOrElse(0L)
      require(st.getLong(0) == pub.getLong(0), "cursor must equal published count")
      require(pub.getLong(1) + carry == idTotals.getLong(1),
        "published + carry must conserve the id stream")
      System.err.println(s"[scale] tokenize_ingest ${idTotals.getLong(0)} docs, " +
        s"${idTotals.getLong(1)} ids, ${pub.getLong(0)} sequences, carry $carry")
      idTotals.getLong(0)
    }
    timed("tokenizer_retrain_50k") {
      // the DRIFT-TRIGGERED tokenizer rollover at corpus scale: train
      // on slice 1, ingest both slices — slice 2's %7 docs arrive
      // vowel-translated to Greek (the realistic drift: a new-language
      // crawl slice lands, textually novel so it SURVIVES dedup, its
      // seeds unseen so every one UNKs) — then ONE maintain decision
      // retrains on the clean tier, re-tokenizes it, re-packs the
      // sequence stream, and flips the generation pointer. The timed
      // cost is the full rollover: |vocab|-bounded training + one tier
      // tokenize through the kernel + one pack pass — the
      // regenerate-shaped one-full-tier-pass class.
      val cp = graft.pipeline.CurationPipeline
      cp.resetTreadmill(spark)
      val half = (mult / 2).toLong * 1000000L
      val slice1 = docs.filter(col("doc_id") < half)
      val slice2 = docs.filter(col("doc_id") >= half)
        .select(col("doc_id"), when(col("doc_id") % 7 === 0,
          translate(col("text"), "aeiou", "αεϊοϋ")).otherwise(col("text")).as("text"))
      cp.publishTokenizer(spark, slice1, numMerges = 32)
      val r1 = cp.ingestBatch(spark, slice1, tokenize = true, packSeqLen = 2048)
      require(r1.ok && r1.metrics("batch_unk_ids") == 0L, r1.metrics.toString)
      val r2 = cp.ingestBatch(spark, slice2, tokenize = true, packSeqLen = 2048)
      require(r2.ok && r2.metrics("batch_unk_ids") > 0L,
        s"slice 2 must carry the planted UNK seeds: ${r2.metrics}")
      val roll = cp.maybeRetrainTokenizer(spark, maxUnkShare = 1e-9,
        packSeqLen = 2048)
      require(roll.nonEmpty && roll.get.ok, s"drift must roll: $roll")
      require(cp.currentTokenizerGeneration(spark) == 1L)
      // generation-1 ids cover the tier doc-for-doc and are UNK-free
      // (trained on exactly the tier the retokenize read)
      // ids + sequences together: ONE pointer read (the multi-artifact
      // read contract)
      val tt = cp.tokenizerTables(spark)
      val idsT = tt.tokenIds
      val cov = spark.table(cp.TierTable).select("doc_id")
        .join(spark.table(idsT).select("doc_id"), Seq("doc_id"), "left_anti").count()
      require(cov == 0L, s"gen-1 ids must cover the tier ($cov missing)")
      require(roll.get.metrics("tier_unk_ids") == 0L, roll.get.metrics.toString)
      // the re-packed stream conserves the gen-1 id total
      val ids = spark.table(idsT).agg(
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long")).head().getLong(0)
      val pub = spark.table(tt.idSequences).agg(
        count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long")).head()
      val st = spark.table(cp.PackStateTable + "_g1").head()
      val carry = Option(st.getSeq[Long](1)).map(_.size.toLong).getOrElse(0L)
      require(st.getLong(0) == pub.getLong(0), "cursor must equal published count")
      require(pub.getLong(1) + carry == ids,
        s"repacked + carry (${pub.getLong(1)} + $carry) must conserve the gen-1 stream ($ids)")
      System.err.println(s"[scale] tokenizer_retrain gen 1: " +
        s"${roll.get.metrics("tier_tokenized_docs")} docs retokenized, " +
        s"${roll.get.metrics("bpe_merges")} merges, ${pub.getLong(0)} sequences")
      roll.get.metrics("tier_tokenized_docs")
    }
    timed("caption_drift_rollover_50k") {
      // CAPTION-CHANNEL PARITY at corpus scale (round 15): the docs
      // drain healthy, winners (one per %3 doc) arrive with
      // Greek-translated drift on the %7 winners and a planted eval
      // passage on the %11 winners, and ONE pack + ONE maintain
      // decision must (a) EXCLUDE the contaminated winners via the
      // persisted-benchmark battery, (b) feed the clean winners' UNKs
      // into the drift ledger, (c) roll the generation off the caption
      // signal alone, and (d) regenerate the interleaved stream
      // UNK-free — the retrain corpus unions the winners, so the roll
      // actually closes the drift that fired it.
      val cp = graft.pipeline.CurationPipeline
      cp.resetTreadmill(spark)
      cp.publishTokenizer(spark, docs, numMerges = 32)
      val r1 = cp.ingestBatch(spark, docs, tokenize = true)
      require(r1.ok && r1.metrics("batch_unk_ids") == 0L, r1.metrics.toString)
      require(cp.maybeRetrainTokenizer(spark, maxUnkShare = 1e-9).isEmpty,
        "healthy docs must not roll")
      val passage = "the held out benchmark answer keys must never leak into training"
      cp.publishBenchmark(spark, spark.range(1).select(lit(passage).as("text")))
      val winners = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 7 === 0,
            translate(col("text"), "aeiou", "αεϊοϋ"))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" " + passage)))
          .otherwise(col("text")).as("kept_caption"))
      graft.plans.Catalog.overwriteTable(winners, cp.MediaCaptionsTable)
      val (nSeq, _, unks, cont) = cp.packCaptionSequences(spark, seqLen = 2048)
      require(cont > 0L, "the planted eval captions must be excluded and counted")
      require(unks > 0L, "the planted caption drift must UNK at generation 0")
      val roll = cp.maybeRetrainTokenizer(spark, maxUnkShare = 1e-9)
      require(roll.nonEmpty && roll.get.ok, s"caption-only drift must roll: $roll")
      require(roll.get.metrics("media_caption_unk_ids") == 0L,
        s"regenerated captions must be UNK-free: ${roll.get.metrics}")
      require(roll.get.metrics("media_caption_contaminated") > 0L,
        s"the repack must keep excluding the eval plants: ${roll.get.metrics}")
      require(cp.currentTokenizerGeneration(spark) == 1L)
      System.err.println(s"[scale] caption_drift_rollover: $nSeq gen-0 sequences, " +
        s"$cont contaminated excluded, $unks drift UNKs, " +
        s"${roll.get.metrics("media_sequences")} gen-1 sequences")
      nSeq
    }
    timed("pack_interleaved_50k") {
      // interleaved multimodal packing at corpus scale: every doc plays
      // a captioned asset. Structural assertions: the sentinel count in
      // the shipped stream equals the block count, refs reconcile
      // one-per-block, every ref position holds the sentinel, and the
      // stream conserves ids + sentinels exactly.
      val merges = operators.Bpe.trainBatched(docs, numMerges = 16)
      val vocab = operators.Bpe.vocabTable(docs, merges)
      val caps = docs.select(col("doc_id").as("media_id"), col("text"))
      val ids = operators.Bpe.tokenizeIds(caps, merges, vocab, idCol = "media_id")
        .localCheckpoint(true)
      val idAgg = ids.agg(count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long")).head()
      val seqs = operators.Bpe.packInterleaved(ids, seqLen = 2048,
        idCol = "media_id").localCheckpoint(true)
      val agg = seqs.agg(
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(size(filter(col("token_ids"),
          i => i === lit(operators.Bpe.MediaId)))), lit(0)).cast("long"),
        coalesce(sum(size(col("refs"))), lit(0)).cast("long")).head()
      require(agg.getLong(1) == idAgg.getLong(0) && agg.getLong(2) == idAgg.getLong(0),
        s"sentinels ${agg.getLong(1)} and refs ${agg.getLong(2)} must equal blocks ${idAgg.getLong(0)}")
      require(agg.getLong(0) == idAgg.getLong(1) + idAgg.getLong(0),
        "the stream must conserve ids plus one sentinel per block")
      val misaligned = seqs.select(col("token_ids"), explode(col("refs")).as("r"))
        .filter(element_at(col("token_ids"), col("r.pos") + 1) =!=
          lit(operators.Bpe.MediaId)).count()
      require(misaligned == 0L, s"$misaligned refs point at non-sentinel positions")
      val n = seqs.count()
      System.err.println(s"[scale] pack_interleaved ${idAgg.getLong(0)} blocks, " +
        s"${agg.getLong(0)} ids in $n sequences")
      n
    }
    timed("ivfpq_refine_8k") {
      // the production ANN read path end-to-end: train coarse cells +
      // PQ books, propose in the compressed domain, re-rank exact.
      // Clone corpus invariant: every probe's refined rank-1 must be
      // an identical clone (cosine exactly 1).
      val cents = operators.Similarity.trainCentroids(emb, k = 16, iters = 2)
      val books = operators.Similarity.trainPqBooks(emb, m = 4, ksub = 8, iters = 2)
      val probes = emb.filter(col("vec_id") % 200 === 0)
      val out = operators.Similarity.topKIvfPqRefine(emb, probes, 3, cents, books,
        nprobe = 2, refine = 32).localCheckpoint(true)
      val n = out.count()
      val bad = out.filter(col("rank") === 1 &&
        (col("probe_id") % 1000000L =!= col("neighbor_id") % 1000000L ||
          col("sim") < 0.999999)).count()
      require(bad == 0, s"$bad probes whose refined rank-1 is not an identical clone")
      n
    }
    // the stored-tier split of the same path: index build (train +
    // encode, paid once per tier generation) vs query-only wall
    // (reads codes + scalars — at 100 TB this is the only per-query
    // cost, so it must be a small fraction of the build)
    var storedIdx: org.apache.spark.sql.DataFrame = null
    var storedCents: Array[Array[Float]] = null
    var storedBooks: Seq[Seq[Seq[Int]]] = null
    timed("ivfpq_index_build_8k", retain = true) {
      storedCents = operators.Similarity.trainCentroids(emb, k = 16, iters = 2)
      storedBooks = operators.Similarity.trainPqBooks(emb, m = 4, ksub = 8, iters = 2)
      storedIdx = operators.Similarity.pqIndex(emb, storedCents, storedBooks)
        .localCheckpoint(true)
      val n = storedIdx.count()
      require(n == nVecs, s"one index row per vector: $n of $nVecs")
      n
    }
    timed("ivfpq_stored_query_8k") {
      val probes = emb.filter(col("vec_id") % 200 === 0)
      val out = operators.Similarity.topKIvfPqStoredRefine(storedIdx, emb, probes, 3,
        storedCents, storedBooks, nprobe = 2, refine = 32).localCheckpoint(true)
      val n = out.count()
      val bad = out.filter(col("rank") === 1 &&
        (col("probe_id") % 1000000L =!= col("neighbor_id") % 1000000L ||
          col("sim") < 0.999999)).count()
      require(bad == 0, s"$bad probes whose stored-tier rank-1 is not an identical clone")
      n
    }
    timed("knn_graph_pq_8k") {
      // the stored-tier answer to knn_graph's hot-LSH-bucket cost:
      // cells from a WIDE coarse quantizer (~sqrt-sized populations),
      // same-cell pairs scored in the compressed domain — no floats in
      // the plan. Clone invariant: every anchor's rank-1 sim is exactly
      // 1 (its clones share cell, codes, and scalars).
      val cents = operators.Similarity.trainCentroids(emb, k = 256, iters = 1)
      val idx = operators.Similarity.pqIndex(emb, cents, storedBooks)
        .localCheckpoint(true)
      val g = operators.Similarity.knnGraphPq(idx, storedBooks, k = 1,
        maxCellSize = 8192).localCheckpoint(true)
      val n = g.count()
      require(n == nVecs, s"every vector needs a rank-1 row: $n of $nVecs")
      val bad = g.filter(col("sim") < 0.999999).count()
      require(bad == 0, s"$bad anchors whose rank-1 is not sim-1")
      n
    }
    timed("knn_graph_pq_recall") {
      // TRUE rank-1 recall vs exact all-pairs ground truth, natural
      // corpus (the sf base set — small enough to brute-force). Two
      // measurements, because they answer different questions:
      //  - CANDIDATE recall (uncapped refine): is the true NN proposed
      //    at all? Here the probed set is a strict superset of the
      //    same-cell set, so nprobe=2 can only gain — asserted.
      //  - FIXED-BUDGET recall (refine = 8): what a bounded re-rank
      //    actually returns. Probing at a fixed budget can LOSE hits —
      //    the gate-friendly 12-bit PQ code (m=4, ksub=8) ranks so
      //    coarsely that cross-cell candidates crowd true neighbors
      //    out of the top-8 — so this pair is MEASURED and reported,
      //    not asserted: the 100 TB lesson is that the refine budget
      //    must scale with nprobe (or PQ resolution with the corpus).
      val base = emb0.localCheckpoint(true)
      val nBase = base.count()
      val cents = operators.Similarity.trainCentroids(base, k = 64, iters = 2)
      val books = operators.Similarity.trainPqBooks(base, m = 4, ksub = 8, iters = 2)
      val idx = operators.Similarity.pqIndex(base, cents, books).localCheckpoint(true)
      val exact1 = operators.Similarity.topKExact(base, base, 1)
        .select(col("probe_id").as("src_id"), col("neighbor_id").as("true_id"))
        .localCheckpoint(true)
      def recall(g: org.apache.spark.sql.DataFrame): Long =
        operators.Similarity.graphRefineExact(g, base, 1)
          .join(exact1, Seq("src_id"))
          .filter(col("neighbor_id") === col("true_id")).count()
      val all = Int.MaxValue // uncapped: candidate recall
      val scCand = recall(
        operators.Similarity.knnGraphPq(idx, books, k = all, maxCellSize = 8192))
      val prCand = recall(
        operators.Similarity.knnGraphPqProbed(idx, cents, books, k = all, nprobe = 2,
          maxCellSize = 8192))
      require(prCand >= scCand,
        s"probed candidates are a superset — candidate recall cannot drop: $prCand < $scCand")
      val sc8 = recall(
        operators.Similarity.knnGraphPq(idx, books, k = 8, maxCellSize = 8192))
      val pr8 = recall(
        operators.Similarity.knnGraphPqProbed(idx, cents, books, k = 8, nprobe = 2,
          maxCellSize = 8192))
      System.err.println(
        s"[scale] knn_graph_pq_recall rank-1 of $nBase: candidate same-cell $scCand, " +
          s"nprobe=2 $prCand; refine-8 same-cell $sc8, nprobe=2 $pr8")
      prCand
    }
    timed("knn_graph_pq_recall_hires") {
      // Does PRODUCTION-resolution PQ close the fixed-budget gap the
      // 12-bit measurement exposed (probing at refine-8 LOSING hits
      // because coarse sims let cross-cell candidates crowd out true
      // neighbors)? Same coarse cells both ways, so the candidate sets
      // are IDENTICAL — asserted below: candidates depend only on the
      // cell assignment (and nprobe), never on the codebooks — and the
      // only thing that changes between 12-bit (m=4, ksub=8, the
      // oracle-replayable gate setting) and 128-bit (m=16, ksub=256,
      // what a real corpus would run) is the compressed-domain RANKING
      // that decides which candidates survive the refine cut.
      val base = emb0.localCheckpoint(true)
      val nBase = base.count()
      val cents = operators.Similarity.trainCentroids(base, k = 64, iters = 2)
      val books12 = operators.Similarity.trainPqBooks(base, m = 4, ksub = 8, iters = 2)
      val books128 = operators.Similarity.trainPqBooks(base, m = 16, ksub = 256, iters = 2)
      val idx12 = operators.Similarity.pqIndex(base, cents, books12).localCheckpoint(true)
      val idx128 = operators.Similarity.pqIndex(base, cents, books128).localCheckpoint(true)
      val exact1 = operators.Similarity.topKExact(base, base, 1)
        .select(col("probe_id").as("src_id"), col("neighbor_id").as("true_id"))
        .localCheckpoint(true)
      def recall(g: org.apache.spark.sql.DataFrame): Long =
        operators.Similarity.graphRefineExact(g, base, 1)
          .join(exact1, Seq("src_id"))
          .filter(col("neighbor_id") === col("true_id")).count()
      val all = Int.MaxValue
      // SAME-CELL candidate sets are books-independent (cells alone
      // decide membership) — asserted. PROBED candidate sets are NOT:
      // the probe ranking reads the PQ reconstruction, so finer codes
      // pick better cells too — measured separately below, so the
      // candidate-set gain and the ranking gain are distinguishable.
      val cand12 = recall(
        operators.Similarity.knnGraphPq(idx12, books12, k = all, maxCellSize = 8192))
      val cand128 = recall(
        operators.Similarity.knnGraphPq(idx128, books128, k = all, maxCellSize = 8192))
      require(cand12 == cand128,
        s"same-cell candidate recall is a function of the cells alone: $cand12 vs $cand128")
      val rows = Seq(("12-bit", idx12, books12), ("128-bit", idx128, books128)).map {
        case (label, idx, books) =>
          val prCand = recall(
            operators.Similarity.knnGraphPqProbed(idx, cents, books, k = all, nprobe = 2,
              maxCellSize = 8192))
          val sc8 = recall(
            operators.Similarity.knnGraphPq(idx, books, k = 8, maxCellSize = 8192))
          val pr8 = recall(
            operators.Similarity.knnGraphPqProbed(idx, cents, books, k = 8, nprobe = 2,
              maxCellSize = 8192))
          System.err.println(
            s"[scale] knn_graph_pq_recall_hires $label rank-1 of $nBase: " +
              s"candidates same-cell $cand12, nprobe=2 $prCand; " +
              s"refine-8 same-cell $sc8, nprobe=2 $pr8")
          (prCand, sc8, pr8)
      }
      // the measured answer: production-resolution refine-8 probed
      // recall — bounded by its own probed candidate recall
      require(rows.last._3 <= rows.last._1,
        "refined hits cannot exceed the candidate ceiling")
      rows.last._3
    }
    timed("vector_ingest_8k") {
      // the VECTOR treadmill at corpus scale: clone replicas split into
      // two slices — slice 2's clones of slice-1 vectors must reconcile
      // against the STORED band index, and the tier (plus its PQ index)
      // collapses to one survivor per clone family
      graft.pipeline.VectorPipeline.resetTreadmill(spark)
      val half = (vmult / 2).toLong * 1000000L
      val r1 = graft.pipeline.VectorPipeline.ingestBatch(spark,
        emb.filter(col("vec_id") < half))
      require(r1.ok, r1.stages.toString)
      val r2 = graft.pipeline.VectorPipeline.ingestBatch(spark,
        emb.filter(col("vec_id") >= half))
      require(r2.ok, r2.stages.toString)
      val tier = spark.table(graft.pipeline.VectorPipeline.TierTable).count()
      require(tier <= nVecs / vmult,
        s"cross-slice clone families must collapse: tier $tier of $nVecs")
      require(spark.table(graft.pipeline.VectorPipeline.pqIndexTable(spark)).count() == tier,
        "PQ index must cover the tier")
      tier
    }
    timed("pq_regenerate_8k") {
      // generation rollover at tier scale (depends on vector_ingest_8k
      // having built the treadmill tier): retrain on a 50% hash-sample,
      // re-encode the whole tier, flip the pointer — then a clone probe
      // must still return its sim-1 twin from the NEW generation via
      // the generation-consistent serve read
      val r = graft.pipeline.VectorPipeline.regenerate(spark, coarseK = 32,
        sampleFraction = 0.5)
      require(r.ok, r.stages.toString)
      require(graft.pipeline.VectorPipeline.currentGeneration(spark) == 2L)
      val probes = emb0.filter(col("vec_id") % 500 === 0)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      val out = graft.pipeline.VectorPipeline.queryTopK(spark, probes, k = 1,
        nprobe = 2, refine = Some(16)).localCheckpoint(true)
      val bad = out.filter(col("sim") < 0.999999).count()
      require(bad == 0, s"$bad probes without a sim-1 twin after rollover")
      r.metrics("tier_encoded")
    }
    timed("vector_maintain_8k", retain = true) {
      // the UNATTENDED deployment shape at corpus scale: two landed
      // slices drained through streamIngestAndMaintain at the
      // production-resolution PQ defaults. Slice 2 lands the odd half
      // of every clone family — post-baseline growth the birth
      // histogram never saw — so the tight drift threshold makes the
      // post-drain check fire and the rollover runs WITHOUT an
      // operator scheduling it. Retained: serve_recall_defaults reads
      // the maintained generation.
      graft.pipeline.VectorPipeline.resetTreadmill(spark)
      val land = java.nio.file.Files.createTempDirectory("scale_vm_land").toString
      val cp = java.nio.file.Files.createTempDirectory("scale_vm_cp").toString
      // the clone id offset (1M) is even, so id parity partitions the
      // DISTINCT vectors, not the replicas: slice 2 genuinely grows
      // the post-dedup tier instead of reconciling away
      emb.filter(col("vec_id") % 2 === 0).coalesce(4).write.mode("append").json(land)
      val r0 = graft.pipeline.VectorPipeline.streamIngestAndMaintain(spark, land, cp,
        maxShareDrift = 0.99, maxOverCapShare = 0.99)
      require(r0.isEmpty, "bootstrap drain must not trigger a rollover")
      require(graft.pipeline.VectorPipeline.currentGeneration(spark) == 1L)
      emb.filter(col("vec_id") % 2 =!= 0).coalesce(4).write.mode("append").json(land)
      val r1 = graft.pipeline.VectorPipeline.streamIngestAndMaintain(spark, land, cp,
        maxShareDrift = 1e-6, maxOverCapShare = 0.99, sampleFraction = 0.5)
      require(r1.exists(_.ok), s"drift must trigger the rollover: $r1")
      require(graft.pipeline.VectorPipeline.currentGeneration(spark) == 2L)
      val tier = spark.table(graft.pipeline.VectorPipeline.TierTable).count()
      require(tier <= nVecs / vmult,
        s"cross-slice clone families must collapse: tier $tier of $nVecs")
      require(spark.table(graft.pipeline.VectorPipeline.pqIndexTable(spark)).count() == tier,
        "the maintained generation must cover the tier")
      // clone-twin probes still serve rank-1 sim-1 under generation 2
      val probes = emb0.filter(col("vec_id") % 500 === 0)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      val bad = graft.pipeline.VectorPipeline.queryTopK(spark, probes, k = 1, nprobe = 2)
        .filter(col("sim") < 0.999999).count()
      require(bad == 0, s"$bad probes without a sim-1 twin after the maintained rollover")
      tier
    }
    timed("serve_recall_defaults_8k") {
      // the serve-path recall contract at PRODUCTION defaults: the
      // derived refine budget (nprobe·k·RefineScale) must hold true-NN
      // recall within 10% of the candidate ceiling (uncapped refine) —
      // the measured closure of the 12-bit crowd-out lesson. Reads the
      // generation vector_maintain_8k left behind.
      val tier = spark.table(graft.pipeline.VectorPipeline.TierTable)
        .localCheckpoint(true)
      val nTier = tier.count()
      val exact1 = operators.Similarity.topKExact(tier, tier, 1)
        .select(col("probe_id"), col("neighbor_id").as("true_id"))
        .localCheckpoint(true)
      val probes = tier.select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      def hits(refine: Option[Int]): Long =
        graft.pipeline.VectorPipeline.queryTopK(spark, probes, k = 2, nprobe = 2,
            refine = refine)
          .withColumn("probe_id", col("probe_id") - 900000000L)
          .filter(col("neighbor_id") =!= col("probe_id")) // rank-1 is the twin
          .groupBy("probe_id").agg(min_by(col("neighbor_id"), col("rank")).as("nn"))
          .join(exact1, Seq("probe_id"))
          .filter(col("nn") === col("true_id")).count()
      val derived = hits(None) // the derived max(floor, nprobe·k·RefineScale) budget
      val ceiling = hits(Some(Int.MaxValue))
      System.err.println(s"[scale] serve_recall_defaults rank-1 of $nTier: " +
        s"derived-budget $derived, candidate ceiling $ceiling")
      require(derived * 10L >= ceiling * 9L,
        s"derived refine budget loses >10% vs the candidate ceiling: $derived of $ceiling")
      derived
    }
    timed("epoch_materialize_50k") {
      // the plan→epoch→pack chain at corpus scale: ONE corpus scan
      // builds the keyed profile (the pinned budgetKeyed frame — the
      // single-scan rework), the fill meets every per-source target,
      // the shuffled stream is a dense permutation, and the packed
      // offsets' global prefix equals the emitted token sum.
      val docsSrc = (0 until mult).map(i =>
        Tables.load(spark, sfDir, "documents")
          .select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            col("text"), col("source")))
        .reduce(_ unionByName _).localCheckpoint(true)
      val corpusToks = docsSrc
        .agg(sum(operators.TextStats.tokenCount(col("text")).cast("long"))).head().getLong(0)
      val budget = corpusToks * 3 / 2 // 1.5 epochs: integer pass + fractional fill
      val epoch = operators.Curation.epochMaterialize(docsSrc, budget)
        .localCheckpoint(true)
      val n = epoch.count()
      require(epoch.agg(max("position")).head().getLong(0) == n - 1,
        "epoch positions must be a dense permutation")
      // fill-until-budget never undershoots: emitted >= target per source
      val plan = operators.Curation.epochPlan(docsSrc, budget)
        .select(col("source"), col("target_tokens"))
      val short = epoch.groupBy("source").agg(sum("token_count").as("toks"))
        .join(plan, Seq("source"))
        .filter(col("toks") < col("target_tokens")).count()
      require(short == 0, s"$short sources under their token target")
      val packed = operators.Curation.packEpoch(epoch).localCheckpoint(true)
      val agg = packed
        .agg(max(col("start_offset") + col("token_count")).as("end"),
          sum(col("token_count")).as("toks")).head()
      require(agg.getLong(0) == agg.getLong(1),
        s"global prefix must equal the token sum: ${agg.getLong(0)} vs ${agg.getLong(1)}")
      n
    }
    timed("epoch_budget_mixed_50k") {
      // the BUDGET-WEIGHTED four-stream manifest at tier scale
      // (round-16 Next #6): 500k text sequences + three caption-stream
      // tiers through trainOrderBudgeted — the fill's two-level bucket
      // cut and the bucketed-rank shuffle are the structures that must
      // hold at 10x, not the pack machinery (its own rows above). Per
      // stream: emitted tokens land in [B, B + maxTc) (the fill meets
      // the target and overshoots by less than one boundary sequence),
      // text copies are exactly the 2-or-3 of 2.5 passes, and the
      // manifest is a dense global permutation.
      val ids = (0 until mult).map(i =>
        Tables.load(spark, sfDir, "documents")
          .select((col("doc_id") + lit(i * 1000000L)).as("seq_no")))
        .reduce(_ unionByName _)
      def stream(m: Int, base: Long) = ids.filter(col("seq_no") % 4 === m)
        .select(col("seq_no"), (lit(base) + col("seq_no") % 7).as("n_tokens"))
      val text = ids.select(col("seq_no"), lit(64L).as("n_tokens"))
      val streams = Seq("text" -> text, "multimodal" -> stream(0, 60L),
        "video" -> stream(1, 60L), "audio" -> stream(2, 60L))
      val sums = streams.map { case (m, df) =>
        m -> df.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0) }.toMap
      val budgets = Map("text" -> (2L * sums("text") + sums("text") / 2L),
        "multimodal" -> (sums("multimodal") / 3L),
        "video" -> (sums("video") / 2L), "audio" -> (sums("audio") / 4L))
      val out = operators.Curation.trainOrderBudgeted(streams, budgets)
        .localCheckpoint(true)
      val agg = out.agg(count(lit(1)), max("position")).head()
      require(agg.getLong(0) == agg.getLong(1) + 1,
        s"manifest must be a dense permutation: ${agg.getLong(0)} rows, " +
          s"max=${agg.getLong(1)}")
      // |streams|-bounded collect: per-stream emitted tokens
      val toks = out.groupBy("modality")
        .agg(coalesce(sum("n_tokens"), lit(0L)).as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      budgets.foreach { case (m, b) =>
        require(toks(m) >= b && toks(m) < b + 67L,
          s"$m emitted ${toks(m)} for budget $b — must meet the target " +
            "within one boundary sequence") }
      // 2.5 passes of text → every sequence exactly 2 or 3 copies
      val spread = out.filter(col("modality") === "text")
        .groupBy("seq_no").agg(count(lit(1)).as("c"))
        .agg(min("c"), max("c")).head()
      require(spread.getLong(0) == 2L && spread.getLong(1) == 3L,
        s"text copies must be the 2-or-3 of 2.5 passes: $spread")
      agg.getLong(0)
    }
    timed("curation_full_50k") {
      // the FLAGSHIP end-to-end at corpus scale: quality gate →
      // decontaminate → minhash near-dup (clone families must
      // collapse) → boilerplate/span strips → split → mix plan →
      // epoch materialization → packing → train order, all through
      // the staged catalog tables and the retrying Runner.
      val docsSrc = (0 until mult).map(i =>
        Tables.load(spark, sfDir, "documents")
          .select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            col("text"), col("source")))
        .reduce(_ unionByName _).localCheckpoint(true)
      val bench = docs0.filter(col("doc_id") % 50 === 0)
        .select(substring(col("text"), 1, 200).as("text"))
      val report = graft.pipeline.CurationPipeline.runFull(spark, docsSrc, bench,
        mixBudgetTokens = 2000000L, materializeEpoch = true)
      require(report.ok, report.stages.toString)
      val kept = report.metrics("docs_kept")
      require(kept <= nDocs / mult,
        s"${mult}x clone families must collapse through the pipeline: kept $kept")
      // the epoch stage met every per-source target (fill-until-budget)
      val shortSources = report.metrics.collect {
        case (k, target) if k.startsWith("mix_target_tokens_") =>
          (k.stripPrefix("mix_target_tokens_"), target)
      }.count { case (src, target) =>
        report.metrics.getOrElse(s"epoch_tokens_$src", 0L) < target
      }
      require(shortSources == 0, s"$shortSources sources under their mix target")
      kept
    }
    timed("bpe_train_50k") {
      // tokenizer training at corpus scale: the ONE corpus-sized job
      // is the word count; each of the 16 merge rounds runs on the
      // |vocab|-bounded table. Clone invariance is the structural
      // assertion: replicating every doc mult x scales every pair
      // count by exactly mult, so the merge SEQUENCE must equal the
      // base corpus's and the counts must divide by mult exactly.
      val merges = operators.Bpe.train(docs, numMerges = 16)
      val base = operators.Bpe.train(docs0, numMerges = 16)
      require(merges.map(m => (m.rank, m.leftSym, m.rightSym)) ==
        base.map(m => (m.rank, m.leftSym, m.rightSym)),
        s"merge sequence must be clone-invariant:\n$merges\n$base")
      require(merges.zip(base).forall { case (m, b) => m.pairCount == b.pairCount * mult },
        "pair counts must scale by the clone multiplier")
      merges.length.toLong
    }
    timed("bpe_train_batched_50k") {
      // the production training shape (one pair-count job learns up to
      // batchSize merges). The natural synthetic corpus has only ~30
      // distinct trainable words (~89 possible merges), so vocabulary
      // DEPTH is planted: one md5-derived 8-char word per doc (digits
      // translated to letters — a 16-letter alphabet with a long
      // sparse merge tail, exactly where one-merge-per-round dies).
      // 512 merges batched; the sequential loop is measured on the
      // first 64 only (full-depth sequential is the ~1000-job
      // pathology batching exists to remove) with equality asserted on
      // that shared prefix; counts non-increasing anchors the rest
      // (every pair a merge CREATES is count-bounded by an old pair
      // adjacent to it — the domination argument the batch bound
      // rests on).
      val deep = docs.select(col("doc_id"),
        concat_ws(" ", col("text"),
          translate(substring(md5(col("doc_id").cast("string")), 1, 8),
            "0123456789", "ghijklmnop")).as("text"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val batched = operators.Bpe.trainBatched(deep, numMerges = 512, batchSize = 64)
      val tBat = (System.nanoTime() - t0) / 1e9
      require(batched.size == 512, s"expected 512 merges, got ${batched.size}")
      require(batched.sliding(2).forall {
        case scala.collection.Seq(a, b) => a.pairCount >= b.pairCount
        case _ => true
      }, "selected pair counts must be non-increasing")
      val t1 = System.nanoTime()
      val seq64 = operators.Bpe.train(deep, numMerges = 64)
      val tSeq = (System.nanoTime() - t1) / 1e9
      require(batched.take(64) == seq64,
        s"batched prefix must equal the sequential loop:\n${batched.take(64)}\n$seq64")
      System.err.println(f"[scale] bpe_train_batched 512 merges in $tBat%.1f s; " +
        f"sequential 64 merges $tSeq%.1f s (${tSeq / 64}%.2f s/merge -> " +
        f"~${tSeq / 64 * 512}%.0f s at depth 512)")
      batched.size.toLong
    }
    timed("bpe_segment_4k") {
      // the APPLY side at PRODUCTION VOCABULARY DEPTH: segmenting the
      // corpus's distinct trainable words against a ≥4k-merge list.
      // Depth is planted structurally (training 4k merges is the
      // batched row's business): each planted md5 word contributes its
      // left-prefix merge chain — a well-formed rank-ordered list. The
      // retained chain rendition is one StringReplace node PER MERGE
      // (the pq_assign plan-size pathology: MiB task binaries, codegen
      // bail, analyzer superlinear in depth), so it is timed only at
      // shallow prefixes of the same list and extrapolated; the kernel
      // carries the whole list as ONE flat array literal. Correctness
      // at depth is anchored by an INDEPENDENT driver-side greedy
      // reference over a deterministic word sample (the chain itself
      // is the property-gated semantic ground at shallow depth).
      val deep = docs.select(col("doc_id"),
        concat_ws(" ", col("text"),
          translate(substring(md5(col("doc_id").cast("string")), 1, 8),
            "0123456789", "ghijklmnop")).as("text"))
      val wordsDf = operators.Bpe.wordCounts(deep).select("word")
        .localCheckpoint(true) // |vocab|-bounded: planted 8-char words + ~30 natural
      val planted = wordsDf.filter(length(col("word")) === 8)
        .orderBy("word").limit(600).collect().map(_.getString(0))
      val mergeList = planted.flatMap { w =>
        (1 until w.length).map(i => (w.substring(0, i), w.substring(i, i + 1)))
      }.zipWithIndex.map { case ((l, r), k) => operators.Bpe.Merge(k + 1, l, r, 0L) }.toSeq
      require(mergeList.size >= 4000, s"planted vocabulary too shallow: ${mergeList.size}")
      val t0 = System.nanoTime()
      val segged = wordsDf.select(col("word"),
          size(operators.Bpe.segment(col("word"), mergeList)).as("n_syms"))
        .localCheckpoint(true)
      val totalSyms = segged.agg(sum("n_syms")).head().getLong(0)
      val tKernel = (System.nanoTime() - t0) / 1e9
      // independent greedy reference on a deterministic sample
      val sample = segged.filter(pmod(xxhash64(col("word")), lit(37)) === 0)
        .collect().map(r => r.getString(0) -> r.getInt(1))
      require(sample.nonEmpty)
      val ranked = mergeList.map(m => (m.leftSym, m.rightSym))
      def refSegLen(w: String): Int = {
        var syms = w.map(_.toString).toVector
        for ((l, r) <- ranked) {
          if (syms.contains(l) && syms.contains(r)) {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.result()
          }
        }
        syms.length
      }
      sample.foreach { case (w, n) =>
        val e = refSegLen(w)
        require(n == e, s"kernel segmented '$w' to $n symbols, reference says $e")
      }
      // the chain's wall at shallow prefixes of the SAME list. The
      // pathology is harder than "slow": past a few hundred merges the
      // nested tree overflows a stack — the driver's during Column
      // conversion at analysis (~512 nodes, 8 MB stack), or an
      // EXECUTOR's during whole-stage codegen of StringReplace
      // (~256 nodes, 1 MB task stack; this one killed the first 500k
      // decade run) — the chain cannot even be PLANNED/CODEGEN'D at
      // production depth. Probes stay at the gate-proven 64/128; the
      // deep attempt is made once and its failure mode is REPORTED,
      // whole failure chain caught (a task-side StackOverflowError
      // surfaces on the driver wrapped in SparkException layers).
      def chainTime(depth: Int): Double = {
        val t = System.nanoTime()
        wordsDf.select(size(operators.Bpe.segmentChain(col("word"), mergeList.take(depth))).as("n"))
          .agg(sum("n")).head().getLong(0)
        (System.nanoTime() - t) / 1e9
      }
      def rootOf(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootOf(t.getCause)
      def chainProbe(depth: Int): String =
        try f"${chainTime(depth)}%.1f s" catch {
          case t: Throwable => rootOf(t).getClass.getSimpleName
        }
      // The DEEP probe is opt-in (standalone runs only): past ~512
      // nodes the chain StackOverflows — on the driver during Column
      // conversion (recoverable), or on an EXECUTOR during whole-stage
      // codegen, where a StackOverflowError is FATAL to Spark's
      // uncaught-exception handler and kills the whole SparkContext a
      // moment later (measured: decade runs 2 and 3 lost the context
      // right after the 512 probe and died on the NEXT op's action).
      // That is the definitive form of the pathology — a production
      // vocabulary doesn't make the chain slow, it makes the chain
      // take down the JVM — but it cannot run inside the shared-JVM
      // decade, so it reports only under SPARK_GRAFT_CHAIN_WALL=1.
      val wall =
        if (sys.env.contains("SPARK_GRAFT_CHAIN_WALL"))
          s"; chain at 512: ${chainProbe(512)} (context is lost after this)"
        else ""
      val nWords = wordsDf.count()
      System.err.println(f"[scale] bpe_segment kernel ${mergeList.size} merges over " +
        f"$nWords%d distinct words: $tKernel%.1f s; chain at 64/128 " +
        f"merges: ${chainProbe(64)}/${chainProbe(128)}$wall")
      totalSyms
    }
    timed("tokenize_ids_50k") {
      // the SHIPPABLE artifact at corpus scale: train a modest vocab
      // (depth is the batched row's business), materialize REAL
      // per-doc id sequences for the full tier, pack at seqLen=2048.
      // Structural assertions: the ids path and the counts path agree
      // token-for-token (sum(len(ids)) == encodedTokenCounts total),
      // the train corpus is UNK-free against its own vocab, packing
      // conserves the stream, and every non-final sequence is full.
      val merges = operators.Bpe.trainBatched(docs, numMerges = 64)
      val vocab = operators.Bpe.vocabTable(docs, merges)
      val tokenized = operators.Bpe.tokenizeIds(docs, merges, vocab)
        .localCheckpoint(true)
      val stats = tokenized.agg(
        count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(size(filter(col("token_ids"),
          i => i === lit(operators.Bpe.UnkId)))), lit(0)).cast("long")).head()
      val totalIds = stats.getLong(1)
      require(stats.getLong(2) == 0L, "train-corpus tokenization must be UNK-free")
      val wantIds = operators.Bpe.encodedTokenCounts(docs, merges)
        .agg(coalesce(sum(col("bpe_tokens")), lit(0L))).head().getLong(0)
      require(totalIds == wantIds,
        s"ids total $totalIds must equal the counts-path total $wantIds")
      val packStats = operators.Bpe.packIdSequences(tokenized, seqLen = 2048)
        .agg(count(lit(1)).cast("long"),
          coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
          coalesce(sum(when(size(col("token_ids")) === 2048, 1L)
            .otherwise(0L)), lit(0L)).cast("long")).head()
      require(packStats.getLong(1) == totalIds,
        s"packed ids ${packStats.getLong(1)} must conserve the stream $totalIds")
      require(packStats.getLong(2) >= packStats.getLong(0) - 1,
        "every sequence but the last must carry exactly seqLen ids")
      System.err.println(s"[scale] tokenize_ids ${stats.getLong(0)} docs, " +
        s"$totalIds ids, ${packStats.getLong(0)} packed sequences")
      stats.getLong(0)
    }
    timed("epoch_pack_ids_50k") {
      // the TRAINING BATCHES at corpus scale: shuffled, upsampled
      // epoch stream → real id sequences. Structural assertions:
      // every epoch copy ships exactly its plan-counted ids
      // (join-conservation: packed total == Σ token_count over the
      // epoch), every non-final sequence is full, and the copy fan-out
      // never re-tokenizes (tokenized is computed once and joined).
      val merges = operators.Bpe.trainBatched(docs, numMerges = 32)
      val vocab = operators.Bpe.vocabTable(docs, merges)
      val tokenized = operators.Bpe.tokenizeIds(docs, merges, vocab)
        .localCheckpoint(true)
      val epoch = operators.Curation.epochMaterialize(
          docs.withColumn("source", (col("doc_id") % 4).cast("string")),
          budgetTokens = 50000000L, seed = 42L, merges = merges)
        .localCheckpoint(true)
      val wantIds = epoch.join(tokenized, Seq("doc_id"))
        .agg(coalesce(sum(col("token_count")), lit(0L))).head().getLong(0)
      val packed = operators.Bpe.packEpochIds(epoch, tokenized, seqLen = 2048)
      val st = packed.agg(count(lit(1)).cast("long"),
        coalesce(sum(size(col("token_ids"))), lit(0)).cast("long"),
        coalesce(sum(when(size(col("token_ids")) === 2048, 1L)
          .otherwise(0L)), lit(0L)).cast("long")).head()
      require(st.getLong(1) == wantIds,
        s"packed ids ${st.getLong(1)} must equal the epoch's planned total $wantIds")
      require(st.getLong(2) >= st.getLong(0) - 1,
        "every sequence but the last must carry exactly seqLen ids")
      System.err.println(s"[scale] epoch_pack_ids ${st.getLong(1)} ids in " +
        s"${st.getLong(0)} sequences")
      st.getLong(0)
    }
    timed("bigram_topk_50k") {
      val n = operators.Curation.ngramTopK(docs, n = 2, topK = 50).count()
      require(n == 50, s"top-k must cap at 50: $n")
      n
    }
    timed("lm_score_50k") {
      val scored = operators.Curation.lmScore(docs).localCheckpoint(true)
      val n = scored.count()
      require(n == nDocs, s"one score per doc: $n of $nDocs")
      // every corpus frequency is >= 1, so no mean can dip below 1
      require(scored.filter(col("mean_cf") < 1.0).count() == 0, "mean_cf < 1 is impossible")
      n
    }
    timed("levenshtein_pairs_50k") {
      // clone corpus: the prefix blocks are full of distance-0 pairs —
      // UNLESS the family size exceeds the block cap (it does at
      // mult=100), in which case the skip metric must report the
      // silenced blocks instead of the run reading "0 pairs" as clean
      val n = operators.TextDedup.nearDupPairsLevenshtein(docs).count()
      val skipped = operators.TextDedup.skippedBlocksLevenshtein(docs).count()
      require(n > 0 || skipped > 0,
        s"clone corpus must produce edit-distance pairs or reported skips: $n pairs, $skipped skips")
      n
    }
    timed("scd2_history_100k_events") {
      val ev = Tables.load(spark, sfDir, "events")
      val h = operators.Scd2.history(ev, "user_id", Seq("event_type"), "ts", "event_id")
        .localCheckpoint(true)
      // exactly one open version per key
      val opens = h.filter(col("is_current")).groupBy("user_id").count()
        .filter(col("count") =!= 1).count()
      require(opens == 0, s"$opens keys have != 1 current version")
      h.count()
    }

    timed("gopher_rules_50k") {
      val out = operators.TextStats.gopherRules(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      n
    }
    timed("gopher_repetition_50k") {
      val out = operators.TextStats.gopherRepetition(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      // repetition is strictly within-document, so clone families must
      // score identically metric for metric
      val bad = out.withColumn("fam", col("doc_id") % 1000000L)
        .groupBy("fam").agg(
          countDistinct(col("dup_5gram_char_frac")).as("d5"),
          countDistinct(col("top_2gram_char_frac")).as("t2"))
        .filter(col("d5") > 1 || col("t2") > 1).count()
      require(bad == 0, s"$bad clone families with diverging repetition metrics")
      n
    }
    timed("strip_repeated_lines_50k") {
      val out = operators.TextDedup.stripRepeatedLines(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      val bad = out.withColumn("fam", col("doc_id") % 1000000L)
        .groupBy("fam").agg(countDistinct(col("clean_hash")).as("d"))
        .filter(col("d") > 1).count()
      require(bad == 0, s"$bad clone families with diverging cleaned text")
      n
    }
    timed("containment_pairs_50k") {
      // 10x clone families: every doc fully contains its 9 clones, so
      // each doc appears in at least 9 ordered pairs — unless the
      // shared shingles got capped, which the metric must then report
      val pairs = operators.TextDedup.containmentPairs(docs, threshold = 0.99)
      val skipped = operators.TextDedup.skippedPostingsContainment(docs)
      val (nPairs, nSkipped) = (pairs.count(), skipped.count())
      require(nPairs >= nDocs * (mult - 1) || nSkipped > 0,
        s"clone containment must surface: $nPairs pairs, $nSkipped capped postings")
      nPairs
    }
    timed("containment_summary_50k") {
      // the DOC-BOUND rendition: same verified pair stream, collapsed
      // to one row per contained doc before anything materializes —
      // at this smoke the pair set is ~mult² per family; the summary
      // must stay <= nDocs rows
      val out = operators.TextDedup.containmentSummary(docs, threshold = 0.99)
        .localCheckpoint(true)
      val n = out.count()
      require(n <= nDocs, s"summary must be doc-bound: $n rows for $nDocs docs")
      val skipped = operators.TextDedup.skippedPostingsContainment(docs).count()
      require(n > 0 || skipped > 0,
        s"clone containment must surface in the summary or the skip metric")
      n
    }
    timed("containment_pruning_50k") {
      // the size prefilter's MEASURED cut (never assumed): raw
      // prefix-join fan-out vs rows surviving |B| >= ceil(t·|A|) — the
      // necessary condition removes long->short-direction candidates
      // before the distinct, the array-fetch joins, and the
      // O(|A|+|B|) verify kernel
      val stats = operators.TextDedup.containmentPruningStats(docs, threshold = 0.99)
        .head()
      val (raw, pruned, kept) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      require(raw == pruned + kept, s"stats must reconcile: $raw != $pruned + $kept")
      System.err.println(f"[scale] containment_pruning raw $raw%d, pruned $pruned%d " +
        f"(${100.0 * pruned / math.max(raw, 1)}%.1f%%), kept $kept%d")
      pruned
    }
    timed("phash_dedup_50k") {
      // the perceptual tier at corpus scale: one 96-byte payload per
      // doc (md5-derived, the gate fixture shape) plus a planted
      // re-encode per 10th doc (same 72 grid bytes, fresh tail —
      // hamming 0). phashDedup must drop every planted re-encode and
      // nothing else: original payloads are md5-random, so natural
      // hamming <= 3 collisions are ~2⁻⁴⁵ per pair — none at this n.
      val payload = concat(md5(col("text")),
        md5(concat(col("text"), lit(":1"))), md5(concat(col("text"), lit(":2"))))
      val base = docs.select(col("doc_id").as("media_id"), payload.as("payload"))
      val reenc = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000000L).as("media_id"),
          concat(substring(payload, 1, 72),
            substring(md5(concat(col("text"), lit(":3"))), 1, 24)).as("payload"))
      val media = base.unionByName(reenc)
        .select(col("media_id"), lit("image").as("kind"), lit("raw").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"),
          col("payload").cast("binary").as("bytes"))
      val nMedia = media.count()
      val kept = operators.Multimodal.phashDedup(media).localCheckpoint(true)
      val n = kept.count()
      // every re-encode pairs with an ORIGINAL that has a smaller id,
      // so survivors = the originals... minus originals that are
      // themselves clones (mult x doc replication -> identical text ->
      // identical payload -> one survivor per text family)
      val distinctHashes = operators.Multimodal
        .phashClusters(media).select("cluster_id").distinct().count()
      require(n < nDocs, s"planted re-encodes and clone families must collapse: $n of $nMedia")
      require(kept.filter(col("media_id") >= 100000000L).count() == 0,
        "every planted re-encode must drop (its original has the smaller id)")
      System.err.println(s"[scale] phash_dedup $nMedia media -> $n kept " +
        s"($distinctHashes exact-dup cluster ids)")
      n
    }
    timed("semdedup_8k") {
      val out = operators.Similarity.semDedup(emb, tau = 0.999).localCheckpoint(true)
      val n = out.count()
      require(n == nVecs, s"one row per vec: $n of $nVecs")
      // 4x identical clones share the cluster bitwise; only the lowest
      // id of each clone family can survive
      val kept = out.filter(col("kept")).count()
      require(kept <= nVecs / vmult, s"clone families must collapse: kept $kept of $nVecs")
      n
    }
    // docs long enough to emit any 20-token window (short docs can
    // neither carry nor strip spans — they bound both span invariants)
    val eligible = docs.filter(
      size(split(trim(col("text")), "\\s+")) >= 20).count()
    timed("duplicate_spans_50k") {
      // every clone after the first IS one full-document duplicate
      // span: exactly 9 of each 10-clone family (of eligible length)
      // must carry a span; base-corpus internal repeats can only add
      val spans = operators.TextDedup.duplicateSpans(docs).localCheckpoint(true)
      val n = spans.count()
      val docsWithSpans = spans.select("doc_id").distinct().count()
      require(docsWithSpans >= eligible * (mult - 1) / mult,
        s"all but one of each eligible clone family must carry a span: $docsWithSpans, eligible $eligible")
      n
    }
    timed("winnowed_spans_50k") {
      // identical clones share every fingerprint, so detection is
      // guaranteed at winnowed density too — same 9-of-10 invariant
      // at ~2/(w+1) of the grid volume (production xxhash family)
      val spans = operators.TextDedup.winnowedSpans(docs).localCheckpoint(true)
      val n = spans.count()
      val docsWithSpans = spans.select("doc_id").distinct().count()
      require(docsWithSpans >= eligible * (mult - 1) / mult,
        s"all but one of each eligible clone family must carry a winnowed span: $docsWithSpans, eligible $eligible")
      n
    }
    timed("strip_spans_50k") {
      val out = operators.TextDedup.stripDuplicateSpans(docs).localCheckpoint(true)
      val n = out.count()
      require(n == nDocs, s"one row per doc: $n of $nDocs")
      // a later clone's whole text is one span, so it strips to empty;
      // survivors are first occurrences + short docs
      val nonEmpty = out.filter(length(col("clean_text")) > 0).count()
      require(nonEmpty <= nDocs - eligible * (mult - 1) / mult,
        s"later clones must strip empty: $nonEmpty non-empty, eligible $eligible")
      n
    }

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = results.map { case (k, s, r) => s""""$k":{"sec":${fmt(s)},"rows":$r}""" }
      .mkString(s"""{"docs":$nDocs,"vecs":$nVecs,""", ",", "}")
    println(json)
    spark.stop()
  }
}
