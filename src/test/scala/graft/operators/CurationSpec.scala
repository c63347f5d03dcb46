package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsSf001 =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")

  test("decontaminate drops exactly the docs sharing an 8-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated words with no overlap at all here now")
    ).toDF("doc_id", "text")
    // benchmark contains doc 1's first 8 tokens and nothing of 2/3
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text")
    val kept = Curation.decontaminate(corpus, bench, n = 8).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
    val hits = Curation.contaminatedIds(corpus, bench, n = 8).as[Long].collect()
    assert(hits.toSeq == Seq(1L))
  }

  test("decontaminate is a no-op for a disjoint benchmark") {
    val corpus = docsSf001
    val bench = Seq("words that do not appear in the synthetic corpus vocabulary").toDF("text")
    assert(Curation.decontaminate(corpus, bench).count() == corpus.count())
  }

  test("decontaminateBloom matches exact decontaminate, even at a degenerate FPR") {
    val corpus = docsSf001
    val bench = corpus.filter($"doc_id" % 50 === 0)
      .select(substring($"text", 1, 200).as("text"))
    val exact = Curation.decontaminate(corpus, bench, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloom = Curation.decontaminateBloom(corpus, bench, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloom == exact, "bloom prefilter + exact verify must equal the exact path")
    // 64-bit sketch for thousands of grams → nearly every gram is a
    // suspect; the verify pass must still reduce to the exact result
    val noisy = Curation.decontaminateBloom(corpus, bench, n = 8, numBits = 64L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(noisy == exact, "false positives must not survive the verify pass")
    // plan: pass 1 is a scan-local filter on the sketch literal — the
    // benchmark joins only against the suspect slice
    val plan = Curation.decontaminateBloom(corpus, bench, n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"sketch prefilter missing:\n$plan")
  }

  test("sampleByHash is deterministic, rate-proportional, and stable under corpus growth") {
    val d = docsSf001
    val s1 = Curation.sampleByHash(d, 0.2).select("doc_id").as[Long].collect().toSet
    val s2 = Curation.sampleByHash(d, 0.2).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "hash sample must be reproducible")
    val n = d.count().toDouble
    assert(math.abs(s1.size / n - 0.2) < 0.15, s"rate off: ${s1.size / n}")
    // growth stability: sampling a superset never flips a doc's decision
    val grown = d.unionByName(d.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val s3 = Curation.sampleByHash(grown, 0.2).select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("splitAssign: total, growth-stable, weight-proportional, sampleByHash-aligned") {
    val d = docsSf001
    val out = Curation.splitAssign(d, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out.size == d.count(), "every doc gets exactly one split")
    val frac = out.values.groupBy(identity).view.mapValues(_.size.toDouble / out.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, s"train fraction off: $frac")
    // growth stability: adding docs never moves an existing assignment
    val grown = d.unionByName(d.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val out2 = Curation.splitAssign(grown, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out.forall { case (id, s) => out2(id) == s })
    // the first range IS sampleByHash(0.8): shared threshold arithmetic
    val sampled = Curation.sampleByHash(d, 0.8).select("doc_id").as[Long].collect().toSet
    assert(out.filter(_._2 == "train").keySet == sampled)
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Curation.splitAssign(d, Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("sampleStratified keeps exactly ceil(rate * stratum size) per stratum") {
    val d = (0 until 100).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Curation.sampleStratified(d, "lang", 0.25)
    val sizes = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 34 en (ceil 8.5 = 9), 66 de (ceil 16.5 = 17)
    assert(sizes == Map("en" -> 9L, "de" -> 17L), sizes.toString)
    // determinism
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Curation.sampleStratified(d, "lang", 0.25).select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("sampleStratified (bucketed) matches the naive per-stratum rank, incl. NULL strata") {
    import org.apache.spark.sql.expressions.Window
    val d = (0 until 400).map { i =>
      val lang = i % 7 match {
        case 0 => null; case 1 | 2 => "en"; case 3 | 4 | 5 => "de"; case _ => "fr"
      }
      (i.toLong, lang)
    }.toDF("doc_id", "lang")
    for (rate <- Seq(0.1, 0.33, 1.0)) {
      val naiveW = Window.partitionBy($"lang").orderBy(Curation.hashU32($"doc_id"), $"doc_id")
      val naive = d.withColumn("__rn", row_number().over(naiveW))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy($"lang")))
        .filter($"__rn" <= ceil($"__n" * rate))
        .select("doc_id").as[Long].collect().toSet
      val bucketed = Curation.sampleStratified(d, "lang", rate)
        .select("doc_id").as[Long].collect().toSet
      assert(bucketed == naive, s"rate $rate: ${bucketed.size} vs ${naive.size}")
    }
  }

  test("NULL text counts as zero tokens everywhere (no size(null) = -1 leakage)") {
    val d = Seq((0L, "four tokens right here"), (1L, null: String), (2L, ""))
      .toDF("doc_id", "text")
    val packed = Curation.packSequences(d, seqLen = 10, chunkDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("token_count"), r.getAs[Long]("start_offset")))
    assert(packed.toSeq == Seq((4L, 0L), (0L, 4L), (0L, 4L)), packed.mkString(","))
    val qf = Curation.qualityFilter(d).orderBy("doc_id").collect()
      .map(r => Option(r.getAs[String]("drop_reason")))
    assert(qf.forall(_.contains("too_short")), qf.mkString(","))
    val mix = Curation.sourceMix(d.withColumn("source", lit("s"))).head()
    assert(mix.getAs[Long]("token_sum") == 4L)
  }

  test("redactPii: phone-shaped text inside an email is one email redaction, zero phone") {
    val d = Seq((1L, "mail 555-1234@example.com now")).toDF("doc_id", "text")
    val r = Curation.redactPii(d).head()
    assert(r.getAs[String]("redacted") == "mail <EMAIL> now")
    assert(r.getAs[Int]("email_count") == 1)
    assert(r.getAs[Int]("phone_count") == 0)
  }

  test("kmvDistinct estimates within ~3 standard errors and is exact under k") {
    // 2000 distinct values, k=64: relative SE ~ 1/sqrt(k-2) ~ 12.7%
    val many = spark.range(2000).select(concat(lit("v"), $"id").as("v"))
    val est = Curation.kmvDistinct(many, col("v"), k = 64).head()
    val e = est.getAs[Double]("kmv_estimate")
    assert(math.abs(e - 2000.0) / 2000.0 < 0.4, s"KMV estimate $e too far from 2000")
    assert(est.getAs[Long]("exact_distinct") == 2000L)
    // fewer distincts than k: the estimate IS the exact count
    val few = spark.range(10).select(concat(lit("v"), $"id").as("v"))
    assert(Curation.kmvDistinct(few, col("v"), k = 64).head()
      .getAs[Double]("kmv_estimate") == 10.0)
  }

  test("redactPii replaces emails and phones, counts them, and leaves clean text alone") {
    val d = Seq(
      (1L, "write to alice.smith+spam@mail.example.org today"),
      (2L, "call 555-0199 or 555-0200 now"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Int]("email_count"), r.getAs[Int]("phone_count"))))
      .toMap
    assert(out(1L) == (("write to <EMAIL> today", 1, 0)))
    assert(out(2L) == (("call <PHONE> or <PHONE> now", 0, 2)))
    assert(out(3L) == (("no pii here at all", 0, 0)))
  }

  test("classifierScore: exact milli-weight logits, NULL for empty docs, broadcast model") {
    val model = Curation.hashedModel(spark, 64)
    val d = Seq(
      (1L, "alpha beta alpha"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "  Alpha  ")                       // normalization: one token
    ).toDF("doc_id", "text")
    val out = Curation.classifierScore(d, model, dim = 64).orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // replay the arithmetic: w(tok) = hashU32(md5(tok)) % 2001 - 1000
    def u32(s: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md5.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    def w(tok: String): Long = u32((u32(tok) % 64).toString) % 2001 - 1000
    val expSum1 = 2 * w("alpha") + w("beta")
    assert(byId(1L).getAs[Long]("w_sum_milli") == expSum1)
    assert(byId(1L).getAs[Double]("score") == expSum1.toDouble / 3000.0)
    assert(byId(2L).getAs[Long]("n_tokens") == 0L && byId(2L).isNullAt(3)
      && !byId(2L).getAs[Boolean]("keep"))
    assert(byId(3L).getAs[Long]("n_tokens") == 0L && byId(3L).isNullAt(3))
    assert(byId(4L).getAs[Long]("w_sum_milli") == w("alpha"))
    // order-free: integer sums make the score partitioning-invariant
    val big = docsSf001
    val a = Curation.classifierScore(big, Curation.hashedModel(spark, 4096), 4096)
    val b = Curation.classifierScore(big.repartition(7), Curation.hashedModel(spark, 4096), 4096)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model must broadcast:\n$plan")
  }

  test("qualityFilter reports the first failing rule in contract order") {
    val d = Seq(
      (1L, "too short"),                                     // < 25 tokens
      (2L, ("the and of to in is " * 10).trim),              // enough tokens, stopword-rich: keep
      (3L, Seq.fill(30)("xqzw").mkString(" "))               // 30 tokens, zero stopwords
    ).toDF("doc_id", "text")
    val out = Curation.qualityFilter(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), Option(r.getAs[String]("drop_reason"))))).toMap
    assert(out(1L) == ((false, Some("too_short"))))
    assert(out(2L) == ((true, None)))
    assert(out(3L) == ((false, Some("low_stopword"))))
  }

  test("repetitionStats flags repeated tokens/grams and the dominant token") {
    val d = Seq(
      (1L, "spam spam spam spam"),                    // all one token
      (2L, "every word here is fully distinct")       // no repetition
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("token_repetition"), r.getAs[Double]("gram_repetition"),
          r.getAs[Double]("top_token_fraction")))).toMap
    assert(out(1L) == ((0.75, 0.5, 1.0)), out(1L).toString)  // 4 toks 1 distinct; 2 grams 1 distinct
    assert(out(2L) == ((0.0, 0.0, round2(1.0 / 6))), out(2L).toString)
  }
  private def round2(v: Double): Double = math.rint(v * 1e6) / 1e6

  test("sourceMix weights sum to ~1 and are token-proportional") {
    val d = Seq(
      (1L, "a", "one two three four"),   // 4 tokens
      (2L, "a", "five six"),             // 2
      (3L, "b", "seven eight")           // 2
    ).toDF("doc_id", "source", "text")
    val out = Curation.sourceMix(d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("doc_count"), r.getAs[Long]("token_sum"), r.getAs[Double]("weight")))).toMap
    assert(out("a") == ((2L, 6L, 0.75)))
    assert(out("b") == ((1L, 2L, 0.25)))
  }

  test("splitAssignByFamily: near-dup families never straddle splits") {
    import graft.operators.TextDedup
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base),                 // family {1, 3}: rep = 1 -> train
      (3L, base + " tiny tail"),  // per-id split would be 'test' (the leak)
      (5L, "completely different words nothing shared at all here now")
    ).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val pairs = TextDedup.nearDupPairsMinhash(d, numHashes = 32, bands = 16,
      jaccardThreshold = 0.5)
    val out = Curation.splitAssignByFamily(d, pairs, splits).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("family_rep"), r.getAs[String]("split")))).toMap
    assert(out(1L) == ((1L, "train")))
    assert(out(3L) == ((1L, "train"))) // follows its family, not its own hash
    assert(out(5L) == ((5L, "val")))   // singleton keeps the per-id assignment
    // the per-id split WOULD have leaked doc 3's family into test
    val plain = Curation.splitAssign(d, splits).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(plain(3L) == "test" && plain(1L) == "train")
  }

  test("temperatureWeights flattens the head: alpha<1 upsamples the tail, alpha=1 is the share") {
    val d = Seq(
      (1L, "big", (1 to 81).map(i => s"t$i").mkString(" ")), // 81 tokens
      (2L, "small", "just nine tokens here p q r s t")       // 9? -> 8... use 9
    ).toDF("doc_id", "source", "text")
    // shares 81/90 = 0.9 and 9/90 = 0.1; alpha=0.5: q = .9487/.3162
    val w = Curation.temperatureWeights(
      d.withColumn("text", when(col("source") === "small",
        lit((1 to 9).map(i => s"s$i").mkString(" "))).otherwise(col("text"))))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val wb = w("big"); val ws = w("small")
    assert(wb.getAs[Double]("share") == 0.9 && ws.getAs[Double]("share") == 0.1)
    // weights renormalized: sqrt(.9)/(sqrt(.9)+sqrt(.1)) ~= 0.75
    assert(math.abs(wb.getAs[Double]("weight") - 0.75) < 0.001)
    assert(math.abs(wb.getAs[Double]("weight") + ws.getAs[Double]("weight") - 1.0) < 1e-9)
    // tail upsampled, head downsampled
    assert(ws.getAs[Double]("oversample") > 1.0 && wb.getAs[Double]("oversample") < 1.0)
    // alpha = 1 degenerates to the raw share
    val id = Curation.temperatureWeights(d, alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("share"), r.getAs[Double]("weight"))).toMap
    id.values.foreach { case (s, wgt) => assert(math.abs(s - wgt) < 1e-6) }
  }

  test("sampleByQuality: rate tracks the score, decision is deterministic and monotone") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val model = Curation.hashedModel(spark, 4096)
    val out = Curation.sampleByQuality(docs, model, 4096).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("keep_rate"), r.getAs[Boolean]("sampled")))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (rate, sampled) =>
      assert(rate >= 0.0 && rate <= 1.0)
      if (rate == 0.0) assert(!sampled)   // zero rate can never sample
      if (rate == 1.0) assert(sampled)    // certain rate always samples
    }
    // the realized fraction tracks the mean rate (law of large numbers
    // over the uniform id hash; 500 docs -> generous tolerance)
    val meanRate = out.values.map(_._1).sum / out.size
    val frac = out.values.count(_._2).toDouble / out.size
    assert(math.abs(frac - meanRate) < 0.15, s"frac=$frac meanRate=$meanRate")
    // determinism across partitioning
    val again = Curation.sampleByQuality(docs.repartition(7), model, 4096).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("sampled")).toMap
    out.foreach { case (id, (_, s)) => assert(again(id) == s) }
  }

  test("epochPlan: targets honor the budget; repeat factors up/down-sample correctly") {
    val d = Seq(
      (1L, "big", (1 to 81).map(i => s"t$i").mkString(" ")),
      (2L, "small", (1 to 9).map(i => s"s$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val plan = Curation.epochPlan(d, budgetTokens = 1000L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val big = plan("big"); val small = plan("small")
    // floor(weight * budget) sums to <= budget, within one floor per source
    val total = big.getAs[Long]("target_tokens") + small.getAs[Long]("target_tokens")
    assert(total <= 1000L && total >= 1000L - 2)
    // temperature flattening: the tail source cycles RELATIVELY more
    // often than the head (27.8x vs 9.3x at this budget)
    assert(small.getAs[Double]("repeat_factor") > big.getAs[Double]("repeat_factor"))
    assert(big.getAs[Long]("target_tokens") > small.getAs[Long]("target_tokens"))
    // exact values: weights 0.75/0.25 -> targets 750/250 over 81/9 tokens
    assert(big.getAs[Long]("target_tokens") == 750L)
    assert(small.getAs[Double]("repeat_factor") == math.rint(250.0 / 9 * 1e6) / 1e6)
  }

  test("packSequences produces the exact global prefix sum across chunk boundaries") {
    // tiny chunks (2 docs) force multi-chunk offsets; capacity 10 tokens
    val d = (0L until 7L).map(i => (i, Seq.fill(4)("w").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.packSequences(d, seqLen = 10, chunkDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_offset"), r.getAs[Long]("seq_no")))
    assert(out.toSeq == (0L until 7L).map(i => (i, i * 4, i * 4 / 10)).toSeq, out.mkString(","))
  }

  test("chunked prefix sum is exact across superchunk boundaries and doc_id gaps") {
    // chunkDocs=2 over sparse ids spread to 60: ~|ids|/2 chunks and
    // ~|ids|/4 superchunks, so the three-level recursion (in-chunk
    // window -> in-superchunk window -> supers window) is exercised
    // with UNEVEN chunks (id gaps leave some chunks half-full) — the
    // offsets must still reproduce the brute-force running sum
    val ids = (0L until 60L).filter(i => i % 7 != 3)
    val docs = ids.map(i => (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" ")))
    val d = docs.toDF("doc_id", "text")
    val out = Curation.packSequences(d, seqLen = 10, chunkDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_offset")))
    // brute-force running sum in doc_id order
    var acc = 0L
    val brute = docs.map { case (id, _) =>
      val r = (id, acc); acc += id % 5 + 1; r }
    assert(out.toSeq == brute, out.take(10).mkString(","))
  }

  test("chunked prefix plan census: exactly one unpartitioned window, over the supers frame only") {
    // the scale contract of the three-level prefix: the in-chunk and
    // in-superchunk prefix windows are PARTITIONED (parallel), and the
    // single unpartitioned window runs only over the superchunk totals
    // (1/chunkSize^2 of the corpus) — this guard fails if a global
    // window over a corpus-sized frame ever sneaks back in
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val d = (0L until 30L).map(i => (i, "w w w")).toDF("doc_id", "text")
    val plan = Curation.packSequences(d, seqLen = 10, chunkDocs = 2)
      .queryExecution.optimizedPlan
    val wins = plan.collect { case w: LogicalWindow => w }
    assert(wins.size == 3, s"expected 3 prefix windows, got ${wins.size}")
    assert(wins.count(_.partitionSpec.isEmpty) == 1,
      s"expected exactly 1 unpartitioned (supers) window: " +
        wins.map(_.partitionSpec).mkString(" | "))
  }

  test("packSegments slices straddling docs into per-sequence segments") {
    // capacity 10: doc 0 fills [0,8), doc 1 straddles [8,15) across
    // seqs 0 and 1, doc 2 is empty (no segments), doc 3 spans [15,40)
    // across seqs 1-3
    val d = Seq(
      (0L, Seq.fill(8)("w").mkString(" ")),
      (1L, Seq.fill(7)("w").mkString(" ")),
      (2L, ""),
      (3L, Seq.fill(25)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Curation.packSegments(d, seqLen = 10, chunkDocs = 2)
      .orderBy("seq_no", "doc_id").collect()
      .map(r => (r.getAs[Long]("seq_no"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("doc_token_start"), r.getAs[Long]("token_len")))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 8L),   // doc 0 whole
      (0L, 1L, 0L, 2L),   // doc 1 head fills seq 0 to capacity
      (1L, 1L, 2L, 5L),   // doc 1 tail
      (1L, 3L, 0L, 5L),   // doc 3 head fills seq 1
      (2L, 3L, 5L, 10L),  // doc 3 middle fills seq 2 exactly
      (3L, 3L, 15L, 10L)  // doc 3 tail fills seq 3 exactly
    ), out.mkString(","))
    // invariant: segments of a doc concatenate to the whole doc
    val sums = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(sums == Map(0L -> 8L, 1L -> 7L, 3L -> 25L))
    // invariant: no sequence exceeds capacity
    val seqSums = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(seqSums.values.forall(_ <= 10L), seqSums.toString)
  }

  test("tfidfTopTerms ranks rare terms above common ones, k rows per doc max") {
    val d = Seq(
      (1L, "common common common rare"),
      (2L, "common other other"),
      (3L, "common third")
    ).toDF("doc_id", "text")
    val out = Curation.tfidfTopTerms(d, topK = 2)
    // doc 1: 'rare' (df=1) outranks 'common' (tf=3, df=3): 1*3/1 = 3.0 vs 3*3/3 = 3.0
    // — tie at 3.0 breaks on term string: 'common' < 'rare'
    val doc1 = out.filter($"doc_id" === 1).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(doc1 == Seq("common", "rare"), doc1.toString)
    // doc 2: 'other' tf=2 df=1 -> 6.0 beats 'common' 1*3/3=1.0
    val doc2 = out.filter($"doc_id" === 2).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(doc2 == Seq("other", "common"), doc2.toString)
    assert(out.groupBy("doc_id").count().agg(max("count")).head().getLong(0) <= 2)
  }

  test("contaminationProfile grades overlap; decontaminateSoft thresholds it") {
    val corpus = Seq(
      // 10 tokens -> 3 distinct 8-grams; shares gram 1 of 3 with bench
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // identical to the bench doc -> overlap 1.0
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated words with no overlap at all here now")
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text")
    val prof = Curation.contaminationProfile(corpus, bench, n = 8)
      .orderBy("doc_id")
      .select("doc_id", "total_grams", "hit_grams", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(prof == Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 1L, 1L, 1.0),
      (3L, 3L, 0L, 0.0)), prof.toString)
    // threshold between 1/3 and 1: doc 1 (stock-phrase overlap) survives,
    // doc 2 (verbatim benchmark) is dropped
    val kept = Curation.decontaminateSoft(corpus, bench, maxOverlap = 0.5, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // maxOverlap = 0 degenerates to the hard variant
    val hard = Curation.decontaminate(corpus, bench, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val soft0 = Curation.decontaminateSoft(corpus, bench, maxOverlap = 0.0, n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(soft0 == hard)
  }

  test("sampleByTokenBudget (bucketed) matches the naive per-stratum running sum") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text")
    for (rate <- Seq(0.1, 0.5, 0.99)) {
      val naive = {
        val t = d
          .withColumn("__tc", TextStats.tokenCount($"text").cast("long"))
          .withColumn("__h", Curation.hashU32($"doc_id"))
        val w = Window.partitionBy($"source").orderBy($"__h", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t.withColumn("__before", coalesce(sum($"__tc").over(w), lit(0L)))
          .withColumn("__budget",
            sum($"__tc").over(Window.partitionBy($"source")).cast("double") * rate)
          .filter($"__before" < $"__budget")
          .select("doc_id").as[Long].collect().sorted.toSeq
      }
      val bucketed = Curation.sampleByTokenBudget(d, "source", rate)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(bucketed == naive, s"rate=$rate: ${bucketed.size} vs ${naive.size}")
    }
    // every non-empty stratum contributes at least one doc even at tiny rates
    val tiny = Curation.sampleByTokenBudget(d, "source", 1e-9)
    assert(tiny.select("source").distinct().count() ==
      d.select("source").distinct().count())
  }

  test("sampleByTokenBudget fills ~rate of each source's token mass") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text")
    val kept = Curation.sampleByTokenBudget(d, "source", 0.3)
      .withColumn("tc", TextStats.tokenCount($"text").cast("long"))
      .groupBy("source").agg(sum($"tc").as("kept_tokens"))
    val totals = d.withColumn("tc", TextStats.tokenCount($"text").cast("long"))
      .groupBy("source").agg(sum($"tc").as("total_tokens"))
    val fracs = kept.join(totals, "source")
      .select($"kept_tokens".cast("double") / $"total_tokens")
      .as[Double].collect()
    // budget fill overshoots by at most one doc's tokens
    assert(fracs.forall(f => f >= 0.3 && f < 0.45), fracs.mkString(","))
  }

  test("kmvDistinctByGroup estimates per-group distinct within sketch error") {
    val d = (0 until 3000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      // group a: 1000 distinct values; group b: 100 distinct values
      (g, if (g == "a") s"v${i % 2000}" else s"w${i % 200}")
    }.toDF("g", "v")
    val est = Curation.kmvDistinctByGroup(d, "g", col("v"), k = 64)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("kmv_estimate")).toMap
    assert(math.abs(est("a") - 1000) / 1000.0 < 0.35, s"a: ${est("a")}")
    assert(math.abs(est("b") - 100) / 100.0 < 0.35, s"b: ${est("b")}")
    // a group smaller than k reports its exact distinct count
    val exact = Curation.kmvDistinctByGroup(d.filter($"g" === "b").limit(40).distinct(), "g", col("v"), k = 64)
      .collect().head.getAs[Double]("kmv_estimate")
    assert(exact == exact.floor && exact <= 40, s"small group must be exact: $exact")
  }

  test("chunkByChars covers every char, with exact overlap between neighbours") {
    val d = Seq((1L, "a" * 500), (2L, "b" * 200), (3L, "c" * 10), (4L, ""))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkByChars(d, chunkLen = 200, overlap = 50)
      .orderBy("doc_id", "chunk_no")
      .select("doc_id", "chunk_no", "chunk_start", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    // 500 chars → chunks at 0/150/300 (len 200) — 1+ceil(300/150)=3;
    // exactly-chunkLen and tiny and empty docs each yield one chunk
    assert(chunks.count(_._1 == 1L) == 3)
    assert(chunks.count(_._1 == 2L) == 1)
    assert(chunks.filter(_._1 == 3L).map(_._4).toSeq == Seq("c" * 10))
    assert(chunks.filter(_._1 == 4L).map(_._4).toSeq == Seq(""))
    // reconstruction: stripping the 50-char overlap from every chunk
    // after the first rebuilds the document exactly
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    val rebuilt = doc1.head._4 + doc1.tail.map(_._4.drop(50)).mkString
    assert(rebuilt == "a" * 500)
    assert(doc1.map(_._3).toSeq == Seq(0L, 150L, 300L))
  }

  test("globalShuffle assigns a permutation matching the seeded hash order") {
    val d = (0L until 500L).toDF("doc_id")
    val out = Curation.globalShuffle(d, seed = 7L)
      .select("position", "doc_id").as[(Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == (0L until 500L), "positions must be 0..n-1")
    // oracle: a plain global sort on (md5(seed:id), id)
    val expected = d
      .withColumn("__h", md5(concat_ws(":", lit(7L), $"doc_id".cast("string"))))
      .orderBy($"__h", $"doc_id").select("doc_id").as[Long].collect()
    assert(out.sortBy(_._1).map(_._2).toSeq == expected.toSeq)
    // different seed ⇒ different order (with overwhelming probability)
    val other = Curation.globalShuffle(d, seed = 8L)
      .select("position", "doc_id").as[(Long, Long)].collect()
    assert(other.sortBy(_._1).map(_._2).toSeq != out.sortBy(_._1).map(_._2).toSeq)
  }

  test("trainOrderBudgeted: ⌊B/T⌋ full passes + hash-order fill per stream; dense permutation; zero budget empties a stream") {
    val a = (0L until 40L).toDF("seq_no")
      .withColumn("n_tokens", lit(10L) + $"seq_no" % 7)
    val b = (0L until 30L).toDF("seq_no")
      .withColumn("n_tokens", lit(5L) + $"seq_no" % 11)
    val ta = a.agg(sum("n_tokens")).head().getLong(0)
    val tb = b.agg(sum("n_tokens")).head().getLong(0)
    val budgets = Map("text" -> (2L * ta + ta / 2L), "mm" -> (tb / 3L))
    val out = Curation.trainOrderBudgeted(
      Seq("text" -> a, "mm" -> b), budgets, seed = 7L).collect()
    // dense global permutation over every emitted copy
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq ==
      (0L until out.length.toLong))
    // per-stream emitted tokens meet the budget, overshooting by less
    // than the boundary sequence (max tc: text 16, mm 15)
    val toks = out.groupBy(_.getAs[String]("modality"))
      .map { case (m, rs) => m -> rs.map(_.getAs[Long]("n_tokens")).sum }
    assert(toks("text") >= budgets("text") && toks("text") < budgets("text") + 16L,
      toks.toString)
    assert(toks("mm") >= budgets("mm") && toks("mm") < budgets("mm") + 15L,
      toks.toString)
    // 2.5 passes of text: every sequence 2 or 3 copies, both present
    val textCopies = out.filter(_.getAs[String]("modality") == "text")
      .groupBy(_.getAs[Long]("seq_no")).map(_._2.length).toSet
    assert(textCopies == Set(2, 3), textCopies.toString)
    // a third of mm: fill-only, each selected sequence exactly once
    val mmCopies = out.filter(_.getAs[String]("modality") == "mm")
      .groupBy(_.getAs[Long]("seq_no")).map(_._2.length).toSet
    assert(mmCopies == Set(1), mmCopies.toString)
    // deterministic end to end
    val again = Curation.trainOrderBudgeted(
      Seq("text" -> a, "mm" -> b), budgets, seed = 7L).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // a zero budget removes the stream from the epoch entirely
    val z = Curation.trainOrderBudgeted(
      Seq("text" -> a, "mm" -> b), Map("text" -> 0L, "mm" -> (tb / 3L)), 7L)
    assert(z.filter($"modality" === "text").count() == 0L)
    assert(z.filter($"modality" === "mm").count() > 0L)
    // a missing budget is a loud error, not a silently-starved stream
    intercept[IllegalArgumentException] {
      Curation.trainOrderBudgeted(Seq("text" -> a, "mm" -> b),
        Map("text" -> 10L), 7L)
    }
  }

  test("vocabTopK orders by count desc then term, and drops empty tokens") {
    val d = Seq((1L, "b b b a a c"), (2L, "a   c "), (3L, "")).toDF("doc_id", "text")
    val v = Curation.vocabTopK(d, topK = 2).as[(String, Long)].collect()
    assert(v.toSeq == Seq(("a", 3L), ("b", 3L))) // tie a/b → term asc
  }

  test("ngramTopK builds row-local bigrams; short and empty docs yield none") {
    val d = Seq(
      (1L, "a b c"),     // bigrams: "a b", "b c"
      (2L, "a b"),       // "a b"
      (3L, "solo"),      // 1 token < n → none
      (4L, "")           // empty → none
    ).toDF("doc_id", "text")
    val g = Curation.ngramTopK(d, n = 2, topK = 10).as[(String, Long)].collect()
    assert(g.toSeq == Seq(("a b", 2L), ("b c", 1L)))
    // trigrams from the same fixture
    val t3 = Curation.ngramTopK(d, n = 3, topK = 10).as[(String, Long)].collect()
    assert(t3.toSeq == Seq(("a b c", 1L)))
    // plan: grams are row-local (one agg exchange, then TakeOrdered)
    val plan = Curation.ngramTopK(docsSf001, 2, 50).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"ngram top-k must TakeOrdered:\n$plan")
  }

  test("native word_ngrams matches the composable rendition bit-for-bit on the corpus") {
    import org.apache.spark.sql.functions.{call_function, col, lit, split}
    for (n <- Seq(2, 3)) {
      val toks = split(TextDedup.normalize(col("text")), " ")
      val native = docsSf001.select(col("doc_id"), call_function("word_ngrams", toks, lit(n)).as("g"))
      val composed = docsSf001.select(col("doc_id"), Curation.ngramsComposable(toks, n).as("g"))
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        s"word_ngrams(n=$n) diverges from the composable rendition")
    }
    // split() never yields null tokens, so the corpus sweep above can't
    // exercise null handling — feed literal nulls directly: concat_ws
    // drops the element AND its separator ("a b", never "a  b").
    val withNulls = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', NULL) AS toks")
    for (n <- Seq(2, 3, 4)) {
      val native = withNulls.select(call_function("word_ngrams", col("toks"), lit(n)).as("g"))
      val composed = withNulls.select(Curation.ngramsComposable(col("toks"), n).as("g"))
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        s"word_ngrams(n=$n) diverges on null tokens")
    }
    assert(withNulls.select(call_function("word_ngrams", col("toks"), lit(2)).as("g"))
      .as[Seq[String]].head() == Seq("a", "b", "b"),
      "null tokens must be skipped concat_ws-style (element and separator)")
  }

  test("lmScore: boilerplate scores high, rare-token docs low; exact integer sums") {
    val d = Seq(
      (1L, "the the the"),   // cf(the)=4 → mean 4
      (2L, "the zzz"),       // (4 + 1) / 2 = 2.5
      (3L, "qqq")            // cf(qqq)=1 → mean 1
    ).toDF("doc_id", "text")
    val out = Curation.lmScore(d).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 3L, 12L, 4.0), (2L, 2L, 5L, 2.5), (3L, 1L, 1L, 1.0)))
    // the frequency join must broadcast the vocab, not shuffle the token stream twice
    val plan = Curation.lmScore(docsSf001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$plan")
  }

  test("plan shapes: chunking shuffle-free; shuffle two-level; vocab TakeOrdered") {
    val d = docsSf001
    // chunking is row-local — no Exchange anywhere in its plan
    val chunkPlan = Curation.chunkByChars(d.withColumnRenamed("text", "text"), 200, 50)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), s"chunking must not shuffle:\n$chunkPlan")
    // the shuffle's data-side window partitions on the hash-prefix
    // bucket; the ONLY single-partition step is the driver-sized
    // bucket-offset list (downstream of its aggregate)
    val shufflePlan = Curation.globalShuffle(d.select("doc_id"))
      .queryExecution.executedPlan.toString
    assert(shufflePlan.contains("hashpartitioning(__bucket"),
      s"data window must partition by bucket:\n$shufflePlan")
    assert("Exchange SinglePartition".r.findAllIn(shufflePlan).size == 1,
      s"exactly one driver-sized single-partition step allowed:\n$shufflePlan")
    // vocab top-k plans as TakeOrdered (per-task heaps), not a global sort
    val vocabPlan = Curation.vocabTopK(d, 50).queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrdered"), s"vocab must TakeOrdered:\n$vocabPlan")
  }

  test("sampleKPerGroup keeps exactly min(k, |stratum|) rows, stable under growth") {
    val d = (0 until 200).map(i => (i.toLong, if (i % 4 == 0) "web" else "book"))
      .toDF("doc_id", "source")
    val out = Curation.sampleKPerGroup(d, "source", k = 10)
    val sizes = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("web" -> 10L, "book" -> 10L))
    // a stratum smaller than k survives whole
    val tiny = Curation.sampleKPerGroup(d.filter($"doc_id" < 3), "source", k = 10)
    assert(tiny.count() == 3)
    // determinism + growth: adding docs only ever displaces by hash order
    val s1 = out.select("doc_id").as[Long].collect().toSet
    val grown = d.unionByName(Seq((100001L, "web")).toDF("doc_id", "source"))
    val s2 = Curation.sampleKPerGroup(grown, "source", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert((s1 diff s2).size <= 1, "one new doc displaces at most one old pick")
  }

  test("ccnetBuckets: per-language thirds by score cutoff, monotone in mean_cf") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val out = Curation.ccnetBuckets(docs).localCheckpoint(true)
    assert(out.count() == docs.count())
    // within each language, every head score >= every middle score >=
    // every tail score (cutoff assignment is monotone by construction)
    val ranked = out.withColumn("r",
      when(col("bucket") === "head", 2).when(col("bucket") === "middle", 1).otherwise(0))
    val viol = ranked.as("a").join(ranked.as("b"),
        col("a.predicted_lang") === col("b.predicted_lang") &&
          col("a.r") > col("b.r") && col("a.mean_cf") < col("b.mean_cf"))
      .count()
    assert(viol == 0, s"$viol bucket-order violations")
    // populations are thirds up to tie mass: no bucket may exceed half
    // of a language with >= 6 docs
    val skew = out.groupBy("predicted_lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("bucket") === "head", 1).otherwise(0)).as("h"))
      .filter(col("n") >= 6 && col("h") > col("n") / 2)
      .count()
    assert(skew == 0, "head bucket cannot exceed half a populated language")
  }

  test("epochMaterialize matches the naive per-source replay; positions are a dense shuffle") {
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "source")
    val budget = 300000L
    val out = Curation.epochMaterialize(src, budget).localCheckpoint(true)

    // positions form a dense permutation over all emitted copies
    val agg = out.agg(count(lit(1)), countDistinct($"position"), max($"position")).head()
    assert(agg.getLong(0) == agg.getLong(1) && agg.getLong(2) == agg.getLong(0) - 1,
      s"dense permutation violated: $agg")

    // naive driver replay of copies-per-doc: ⌊target/S⌋ everywhere +
    // one extra for docs first in (hash, id) order while before < rem
    val plan = Curation.epochPlan(src, budget).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("token_sum"), r.getAs[Long]("target_tokens")))).toMap
    val rows = src.select($"doc_id", $"source",
        graft.operators.TextStats.tokenCount($"text").cast("long").as("tc"),
        Curation.hashU32($"doc_id").as("h")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("tc"), r.getAs[Long]("h")))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (source, docs) =>
      val (s, target) = plan(source)
      val nfull = if (s > 0) math.floor(target.toDouble / s).toLong else 0L
      val rem = target - nfull * s
      var before = 0L
      docs.sortBy(d => (d._4, d._1)).map { case (id, _, tc, _) =>
        val extra = if (before < rem) 1L else 0L
        before += tc
        id -> (nfull + extra)
      }
    }.filter(_._2 > 0).toMap
    val actual = out.groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(actual == expected,
      s"copies diverge, e.g. ${(actual.toSet -- expected.toSet).take(3)} vs ${(expected.toSet -- actual.toSet).take(3)}")

    // packEpoch: the two-level prefix in position order equals the
    // naive global running sum, and sequences tile without gaps
    val packed = Curation.packEpoch(out, seqLen = 128).collect()
      .sortBy(_.getAs[Long]("position"))
    var run = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("start_offset") == run,
        s"prefix diverges at position ${r.getAs[Long]("position")}")
      assert(r.getAs[Long]("seq_no") == run / 128)
      run += r.getAs[Long]("token_count")
    }

    // copies of one doc scatter: some doc with >= 2 copies must not sit
    // at adjacent positions (the shuffle is per-copy, not per-doc)
    val multi = out.filter($"copy" >= 1).select("doc_id", "position")
      .as[(Long, Long)].collect().groupBy(_._1)
    if (multi.nonEmpty) {
      val adjacentEverywhere = out.select("doc_id", "position").as[(Long, Long)]
        .collect().groupBy(_._1).filter(_._2.length >= 2)
        .forall { case (_, ps) =>
          val sorted = ps.map(_._2).sorted
          sorted.zip(sorted.tail).forall { case (a, b) => b == a + 1 }
        }
      assert(!adjacentEverywhere, "per-copy shuffle must scatter repeats")
    }
  }

  test("epochMaterialize: a NULL-source stratum keeps its integer full passes") {
    // budgetKeyed/epochPlan deliberately treat NULL source as its own
    // bucket; before the struct-key join fix the integer-pass arm
    // null-rejected the NULL stratum (it got only its fractional fill),
    // silently under-emitting its target. Corpus: one named source and
    // one NULL source, budget sized so every stratum's ⌊T/S⌋ ≥ 1.
    val docs = Seq(
      (1L, "a b c d e f g h", "web"), (2L, "i j k l m n o p", "web"),
      (3L, "q r s t u v w x", null), (4L, "y z aa bb cc dd ee ff", null)
    ).toDF("doc_id", "text", "source")
    val out = Curation.epochMaterialize(docs, budgetTokens = 64L)
      .localCheckpoint(true)
    val plan = Curation.epochPlan(docs, 64L).collect()
      .map(r => Option(r.getAs[String]("source")) ->
        ((r.getAs[Long]("token_sum"), r.getAs[Long]("target_tokens")))).toMap
    val (sNull, tNull) = plan(None)
    val nfullNull = math.floor(tNull.toDouble / sNull).toLong
    assert(nfullNull >= 1, s"test corpus must force >=1 full pass, got $nfullNull")
    // every NULL-source doc appears at least nfull times
    val nullCopies = out.filter($"source".isNull).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(Set(3L, 4L).subsetOf(nullCopies.keySet), s"NULL docs missing: $nullCopies")
    assert(nullCopies.values.forall(_ >= nfullNull),
      s"NULL stratum lost its full passes: $nullCopies (nfull=$nfullNull)")
    // and the NULL stratum's emitted tokens hit its target exactly
    // (integer passes + boundary-inclusive fractional fill >= target)
    val nullTokens = out.filter($"source".isNull)
      .agg(sum($"token_count")).head().getLong(0)
    assert(nullTokens >= tNull && nullTokens <= tNull + 8,
      s"NULL stratum tokens $nullTokens vs target $tNull")
  }

  test("epochMaterialize emits a plan over the pinned profile, never re-tokenizing the corpus") {
    // The keyed (id, source, tokens, hash, bucket) profile is built in
    // ONE corpus scan and checkpointed; every downstream consumer (the
    // plan aggregate, the fill, the expansion, the shuffle) must read
    // THAT, not re-derive tokenCount from text. Before the single-scan
    // rework the emitted plan re-evaluated the tokenization regex in
    // ~6 subtrees — at corpus scale, 6 full scans. Guard the shape:
    // the final plan scans checkpointed RDDs and contains no trace of
    // the text column or the \s+ tokenizer.
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "source")
    val out = Curation.epochMaterialize(src, 300000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"epoch plan must read the pinned profile:\n$plan")
    assert(!plan.contains("split("), s"tokenizer leaked into the epoch plan:\n$plan")
    assert(!plan.contains("text#"), s"corpus text column leaked into the epoch plan:\n$plan")
    // packEpoch on the LIVE frame pins its input once: the prefix-sum
    // plan reads a checkpoint, not a second materialization
    val packPlan = Curation.packEpoch(out, seqLen = 128)
      .queryExecution.executedPlan.toString
    assert(!packPlan.contains("split("), s"pack plan re-derives the profile:\n$packPlan")
    assert(!packPlan.contains("text#"), s"pack plan re-reads the corpus:\n$packPlan")
  }
}
