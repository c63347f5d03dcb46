package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  /** Original docs + near-identical copies (id+100000, a short tail
    * appended) + one exact copy modulo case/whitespace (id+200000). */
  private def planted: DataFrame = {
    val near = docs.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), concat($"text", lit(" tail token")).as("text"))
    val exact = docs.filter($"doc_id" === 1)
      .select(($"doc_id" + 200000).as("doc_id"), upper(concat(lit("  "), $"text")).as("text"))
    docs.select("doc_id", "text").unionByName(near).unionByName(exact)
  }

  test("exact dedup finds case/whitespace-normalized duplicates, keeps min id") {
    val clusters = TextDedup.exactDupClusters(planted).collect()
    assert(clusters.length == 1)
    assert(clusters.head.getAs[Long]("dup_count") == 2L)
    assert(clusters.head.getAs[Long]("canonical_doc_id") == 1L)

    val deduped = TextDedup.dedupExact(planted)
    assert(deduped.count() == planted.count() - 1)
    assert(deduped.filter($"doc_id" === 200001L).count() == 0)
    assert(deduped.filter($"doc_id" === 1L).count() == 1)
  }

  test("shingles: distinct word n-grams; short text falls back to whole text") {
    val sh = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
      .select($"doc_id", TextDedup.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq("x y"))
  }

  test("minhash LSH finds planted near-dups (and the corpus's own)") {
    val pairs = TextDedup.nearDupPairsMinhash(planted, jaccardThreshold = 0.5)
    val rows = pairs.collect()
    val got = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val expected = docs.filter($"doc_id" % 5 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    // every planted near-pair found (tail barely moves 3-gram Jaccard on
    // 100+-token docs), plus the exact dup pair (jaccard 1)
    assert(got.intersect(expected) == expected, s"missed: ${expected.diff(got)}")
    assert(got.contains((1L, 200001L)))
    // the driver's synthetic corpus carries its OWN near-dup pairs
    // (e.g. 474~498 at jaccard 0.989, verified against DuckDB) — they
    // must be found too, and every reported pair clears the threshold
    assert(got.contains((474L, 498L)))
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash signature similarity estimates true jaccard") {
    import org.apache.spark.sql.functions._
    // two near-identical docs: signature agreement ratio ~ jaccard
    val pair = docs.filter($"doc_id" === 474 || $"doc_id" === 498) // known j=0.989 pair
      .select(TextDedup.minhashSignature(TextDedup.shingles($"text", 3), 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agree = pair(0).zip(pair(1)).count { case (a, b) => a == b } / 128.0
    assert(agree > 0.9, s"estimated jaccard $agree for a 0.989 pair")

    val far = docs.filter($"doc_id" === 0 || $"doc_id" === 1)
      .select(TextDedup.minhashSignature(TextDedup.shingles($"text", 3), 128).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agreeFar = far(0).zip(far(1)).count { case (a, b) => a == b } / 128.0
    assert(agreeFar < 0.3, s"unrelated docs estimated at $agreeFar")
  }

  test("near-dup plans are bucketed joins, never cartesian") {
    Seq(
      TextDedup.nearDupPairsMinhash(planted),
      TextDedup.nearDupPairsSimhash(planted),
      TextDedup.nearDupAgainst(
        planted.filter($"doc_id" < 30), planted.filter($"doc_id" >= 30))
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs plan:\n$plan")
    }
  }

  test("simhash: near-identical docs within small hamming distance, unrelated far apart") {
    val sigs = planted.select($"doc_id", TextDedup.simhash64($"text").as("sim"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sim")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    val nearIds = docs.filter($"doc_id" % 5 === 0).select("doc_id").collect().map(_.getLong(0))
    val avgNear = nearIds.map(id => ham(id, id + 100000)).sum.toDouble / nearIds.length
    assert(avgNear <= 8.0, s"avg hamming of planted near-dups: $avgNear")
    assert(ham(1L, 200001L) == 0) // case/space normalize to identical
    // two different random docs should be far apart on average
    val others = for (a <- nearIds.take(5); b <- nearIds.take(5) if a < b) yield ham(a, b)
    assert(others.sum.toDouble / others.length > 10.0)
  }

  test("degenerate bucket families are capped, reported, and never expand O(m²)") {
    // 5k identical docs: every banding scheme maps them into the same
    // buckets — uncapped, that is a 12.5M-pair expansion from single
    // aggregation buffers
    val degenerate = spark.range(5000).select($"id".as("doc_id"), lit("same text every time").as("text"))
      .unionByName(Seq((900001L, "a genuinely unique document about gardens"),
        (900002L, "a genuinely unique document about gardens and ponds")).toDF("doc_id", "text"))

    val mhPairs = TextDedup.nearDupPairsMinhash(degenerate, jaccardThreshold = 0.5, maxBucketSize = 100)
    val mhGot = mhPairs.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // the hot family is skipped, the genuine near-pair still found
    assert(!mhGot.exists(p => p._1 < 5000 && p._2 < 5000), s"degenerate pairs leaked: $mhGot")
    assert(mhGot.contains((900001L, 900002L)), s"genuine pair lost to the cap: $mhGot")
    val mhSkipped = TextDedup.skippedBucketsMinhash(degenerate, maxBucketSize = 100).collect()
    assert(mhSkipped.nonEmpty && mhSkipped.forall(_.getAs[Long]("member_count") == 5000L),
      s"skipped-bucket metric: ${mhSkipped.mkString(",")}")

    val shPairs = TextDedup.nearDupPairsSimhash(degenerate, maxHamming = 3, maxBucketSize = 100)
    val shGot = shPairs.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(!shGot.exists(p => p._1 < 5000 && p._2 < 5000), s"degenerate pairs leaked: $shGot")
    val shSkipped = TextDedup.skippedBucketsSimhash(degenerate, maxBucketSize = 100).collect()
    assert(shSkipped.length == 4 && shSkipped.forall(_.getAs[Long]("member_count") == 5000L),
      s"expected all 4 chunk buckets hot: ${shSkipped.mkString(",")}")
  }

  test("exact jaccard (prefix filtering) reproduces brute-force all-pairs exactly") {
    // completeness is the whole point: the prefix-filtered pair set
    // must EQUAL the cross-join truth, not approximate it
    val sh = planted.select($"doc_id", TextDedup.hashedShingles($"text", 3).as("sh"))
    def brute(t: Double) = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          size(array_union($"a.sh", $"b.sh"))).as("jaccard"))
      .filter($"jaccard" >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (t <- Seq(0.5, 0.8)) {
      val got = TextDedup.nearDupPairsJaccard(planted, threshold = t)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Double]("jaccard"))).toSet
      val exp = brute(t)
      assert(got == exp,
        s"t=$t missed=${exp.diff(got).take(5)} extra=${got.diff(exp).take(5)}")
      assert(exp.nonEmpty) // the fixture plants qualifying pairs
    }
  }

  test("exact jaccard finds a pair sitting exactly on the threshold") {
    // 1-gram shingles: J({a,b,c,d},{a,b,c,e}) = 3/5 = 0.6 exactly; >= is inclusive
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val got = TextDedup.nearDupPairsJaccard(df, shingleN = 1, threshold = 0.6).collect()
    assert(got.length == 1 && got.head.getAs[Double]("jaccard") == 0.6)
    assert(TextDedup.nearDupPairsJaccard(df, shingleN = 1, threshold = 0.61).isEmpty)
  }

  test("exact jaccard: hot prefix tokens are capped and reported, genuine pairs survive") {
    val degenerate = spark.range(5000).select($"id".as("doc_id"), lit("same text every time").as("text"))
      .unionByName(Seq((900001L, "a genuinely unique document about gardens"),
        (900002L, "a genuinely unique document about gardens and ponds")).toDF("doc_id", "text"))
    val pairs = TextDedup.nearDupPairsJaccard(degenerate, threshold = 0.5, maxBucketSize = 100)
    val got = pairs.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(!got.exists(p => p._1 < 5000 && p._2 < 5000), s"degenerate pairs leaked: ${got.take(5)}")
    assert(got.contains((900001L, 900002L)), s"genuine pair lost to the cap: $got")
    val skipped = TextDedup.skippedBucketsJaccard(degenerate, maxBucketSize = 100).collect()
    assert(skipped.nonEmpty && skipped.forall(_.getAs[Long]("member_count") == 5000L),
      s"skipped-token metric: ${skipped.take(3).mkString(",")}")
  }

  test("exact jaccard dedup agrees with minhash dedup where banding recall is 1") {
    val a = TextDedup.dedupNearJaccard(planted, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextDedup.dedupNearMinhash(planted, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, s"jaccard-only=${a.diff(b).take(5)} minhash-only=${b.diff(a).take(5)}")
    assert(a.contains(1L) && !a.contains(200001L))
  }

  test("exact jaccard plan is a bucketed join, never cartesian") {
    val plan = TextDedup.nearDupPairsJaccard(planted).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan:\n$plan")
  }

  test("simhash LSH bucketing finds hamming<=3 pairs") {
    val pairs = TextDedup.nearDupPairsSimhash(planted, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 200001L && p._3 == 0))
  }

  test("nearDupAgainst equals batch-global dedup restricted to the batch") {
    // split the planted corpus mid-way: tier ids precede batch ids, the
    // planted copies (+100000/+200000) all land in the batch, so every
    // cross-dup is a batch-vs-tier reconciliation
    val all = planted
    val tier = all.filter($"doc_id" < 30)
    val batch = all.filter($"doc_id" >= 30)
    val incremental = TextDedup.nearDupAgainst(tier, batch, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val global = TextDedup.dedupNearMinhash(all, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == global.intersect(batchIds),
      s"inc-only=${incremental.diff(global).take(5)} global-only=${global.intersect(batchIds).diff(incremental).take(5)}")
    // a planted copy of a TIER doc is dropped (cross reconciliation)...
    assert(!incremental.contains(100000L) && !incremental.contains(200001L))
    // ...a planted copy of a BATCH doc loses to its in-batch original
    assert(incremental.contains(35L) && !incremental.contains(100035L))
  }

  test("nearDupAgainst drops a batch doc chained to the tier through another batch doc") {
    // T(1) ~ A(10) ~ B(11), where B shares nothing with T directly:
    // global dedup puts {T, A, B} in one component -> A and B both drop.
    // A two-stage "cross then internal" rendition would keep B.
    // shingle-set construction: T = X, A = X+Y, B = X'+Y with X' the
    // first half of X and |X| = 2|Y|, giving J(T,A) ~ 2/3 (edge),
    // J(A,B) ~ 2/3 (edge), J(T,B) ~ 1/3 (NO direct edge)
    val xs = (0 until 62).map(i => s"tok$i")
    val ys = (0 until 32).map(i => s"alt$i")
    val tier = Seq((1L, xs.mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, (xs ++ ys).mkString(" ")),            // A ~ tier doc 1
      (11L, (xs.take(32) ++ ys).mkString(" ")),   // B ~ A only
      (12L, (200 until 260).map(i => s"far$i").mkString(" ")))  // unrelated
      .toDF("doc_id", "text")
    // fixture sanity: B really has no direct edge to the tier
    val direct = TextDedup.nearDupPairsMinhash(
      tier.unionByName(batch), jaccardThreshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(direct.contains((1L, 10L)) && direct.contains((10L, 11L)), direct.toString)
    assert(!direct.contains((1L, 11L)), direct.toString)
    val out = TextDedup.nearDupAgainst(tier, batch, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 ~ 1 (tier) and 11 ~ 10 ~ 1 transitively: both must drop
    assert(out == Set(12L), out.toString)
  }

  test("native minhash_band_keys matches the composable rendition bit-for-bit on the corpus") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    for ((bands, r) <- Seq((16, 4), (8, 8))) {
      val hs = TextDedup.hashedShingles(org.apache.spark.sql.functions.col("text"), 3)
      val native = d.select($"doc_id", explode(TextDedup.bandKeys(hs, bands, r)).as("bk"))
        .select($"doc_id", $"bk.band", $"bk.bucket")
        .as[(Long, Int, Long)].collect().toSet
      val composed = d.select($"doc_id", explode(TextDedup.bandKeysComposable(hs, bands, r)).as("bk"))
        .select($"doc_id", $"bk.band", $"bk.bucket")
        .as[(Long, Int, Long)].collect().toSet
      assert(native == composed, s"minhash_band_keys($bands,$r) diverges: " +
        s"${(native diff composed).take(3)} vs ${(composed diff native).take(3)}")
    }
    // empty-token edge: both renditions agree on the degenerate doc
    val edge = Seq((1L, ""), (2L, "one two three four")).toDF("doc_id", "text")
    val hs = TextDedup.hashedShingles(org.apache.spark.sql.functions.col("text"), 3)
    val ne = edge.select(explode(TextDedup.bandKeys(hs, 4, 2)).as("bk"))
      .select($"bk.band", $"bk.bucket").as[(Int, Long)].collect().toSet
    val ce = edge.select(explode(TextDedup.bandKeysComposable(hs, 4, 2)).as("bk"))
      .select($"bk.band", $"bk.bucket").as[(Int, Long)].collect().toSet
    assert(ne == ce)
  }

  test("native jaccard_long_sets matches the composable size-ratio bit-for-bit") {
    import org.apache.spark.sql.functions.{call_function, col}
    // corpus shingle sets: every candidate-pair shape the verify sees
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val sh = d.select(col("doc_id"), TextDedup.hashedShingles(col("text"), 3).as("sh"))
    val pairs = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        col("a_id") % 7 === col("b_id") % 7 && col("a_id") < col("b_id"))
    val diverged = pairs.filter(
      !(call_function("jaccard_long_sets", col("a_sh"), col("b_sh")) <=>
        TextDedup.jaccardComposable(col("a_sh"), col("b_sh")))).count()
    assert(diverged == 0, s"$diverged pairs diverge from the composable rendition")

    // handmade edges: duplicates in the arrays, empty vs non-empty, disjoint
    val edge = Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 3L, 4L)), // dups: distinct J = 2/4
      (Seq.empty[Long], Seq(1L, 2L)),              // 0/2
      (Seq(5L), Seq(6L))                           // disjoint 0/2
    ).toDF("a", "b")
    val got = edge.select(call_function("jaccard_long_sets", col("a"), col("b")))
      .as[Double].collect()
    assert(got.toSeq == Seq(0.5, 0.0, 0.0))
  }

  test("native contain_long_sets matches the composable distinct size-ratio bit-for-bit") {
    import org.apache.spark.sql.functions.{call_function, col, size => asize,
      array_distinct, array_intersect, greatest, lit}
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val sh = d.select(col("doc_id"), TextDedup.hashedShingles(col("text"), 3).as("sh"))
    val pairs = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        col("a_id") % 7 === col("b_id") % 7 && col("a_id") < col("b_id"))
    def composable(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      asize(array_intersect(array_distinct(a), array_distinct(b))).cast("double") /
        asize(array_distinct(a))
    val diverged = pairs.filter(
      !(call_function("contain_long_sets", col("a_sh"), col("b_sh")) <=>
        composable(col("a_sh"), col("b_sh")))).count()
    assert(diverged == 0, s"$diverged pairs diverge from the composable rendition")

    // handmade edges: dups in arrays, full containment, asymmetry
    val edge = Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 3L, 4L)), // distinct 2/3
      (Seq(1L, 2L), Seq(1L, 2L, 3L, 4L)),         // subset: 1.0
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),         // superset: 0.5
      (Seq(5L), Seq(6L))                          // disjoint: 0.0
    ).toDF("a", "b")
    val got = edge.select(call_function("contain_long_sets", col("a"), col("b")))
      .as[Double].collect()
    assert(got.toSeq == Seq(2.0 / 3.0, 1.0, 0.5, 0.0))
  }

  test("dupProfile: per-source totals, distinct contents, and rate; normalization folds dups") {
    val docs = Seq(
      (1L, "Hello  World", "web"),  // normalizes equal to doc 2
      (2L, "hello world", "web"),
      (3L, "something else", "web"),
      (4L, "unique per source", "book"),
      (5L, "unique per source", "book") // exact dup in book
    ).toDF("doc_id", "text", "source")
    val out = TextDedup.dupProfile(docs).orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("book", 2L, 1L, 1L, 0.5),
      ("web", 3L, 2L, 1L, 0.333333)))
  }

  test("dedupBlocks: global first-occurrence block dedup with reassembly hash") {
    val blockA = (0 until 20).map(i => s"a$i").mkString(" ")
    val blockB = (0 until 20).map(i => s"b$i").mkString(" ")
    val blockC = (0 until 7).map(i => s"c$i").mkString(" ")  // short tail block
    val blockD = (0 until 20).map(i => s"d$i").mkString(" ")
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    val docs = Seq(
      (1L, s"$blockA $blockB $blockC"),          // first occurrence of all 3
      (2L, s"$blockB $blockA"),                  // both blocks lost to doc 1
      (3L, s"$blockA $blockA $blockD"),          // in-doc repeat also dedups
      (4L, ""),                                  // empty: zero blocks
      (5L, null.asInstanceOf[String]),           // null: zero blocks
      (6L, "just a few tokens"),                 // single sub-size block
      (7L, "  just   a few\ttokens ")            // ws-canonical dup of doc 6
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupBlocks(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_blocks"), r.getAs[String]("clean_hash")))).toMap

    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)) // every doc gets a row
    assert(out(1L)._1 == 3L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._2 == hex(s"$blockA $blockB $blockC")) // reassembles verbatim
    assert(out(2L) == ((0L, emptyMd5)))  // exact-ish copy empties out
    assert(out(3L) == ((1L, hex(blockD)))) // only the novel block survives
    assert(out(4L) == ((0L, emptyMd5)))
    assert(out(5L) == ((0L, emptyMd5)))
    assert(out(6L) == ((1L, hex("just a few tokens"))))
    assert(out(7L) == ((0L, emptyMd5)))  // canonicalized dup of doc 6

    // plan: the first-occurrence race is a hash agg + semi join, no window
    val plan = TextDedup.dedupBlocks(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("stripCommonSegments removes boilerplate from EVERY occurrence, first included") {
    val header = (0 until 10).map(i => s"h$i").mkString(" ")   // one aligned segment
    val bodyA = (0 until 10).map(i => s"a$i").mkString(" ")
    val bodyB = (0 until 10).map(i => s"b$i").mkString(" ")
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    val md5d = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docsDf = Seq(
      (1L, s"$header $bodyA"),        // header common → stripped, body kept
      (2L, s"$header $bodyB"),
      (3L, header),                   // entirely boilerplate → empties out
      (4L, "short unique doc"),       // sub-size single segment, df=1 → kept
      (5L, ""),                       // empty: zero segments
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextDedup.stripCommonSegments(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_segments"), r.getAs[Long]("removed_segments"),
          r.getAs[String]("clean_hash")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(1L) == ((1L, 1L, hex(bodyA))))   // first occurrence removed too
    assert(out(2L) == ((1L, 1L, hex(bodyB))))
    assert(out(3L) == ((0L, 1L, emptyMd5)))
    assert(out(4L) == ((1L, 0L, hex("short unique doc"))))
    assert(out(5L) == ((0L, 0L, emptyMd5)))
    assert(out(6L) == ((0L, 0L, emptyMd5)))
    val plan = TextDedup.stripCommonSegments(docsDf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("stripCommonLines: df counts distinct docs; blank lines dropped; order kept") {
    val md5d = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docsDf = Seq(
      (1L, "common header\nunique one\n\n  unique two  \ncommon header"),
      (2L, "common header\nother body"),
      // a line repeated only WITHIN one doc: document frequency is 1,
      // so it is NOT boilerplate and both copies survive.
      (3L, "solo line\nsolo line")
    ).toDF("doc_id", "text")
    val out = TextDedup.stripCommonLines(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_segments"), r.getAs[Long]("removed_segments"),
          r.getAs[String]("clean_hash")))).toMap
    // doc 1: both header copies removed (df=2 across docs 1,2); the two
    // unique lines survive trimmed, in original order; blank line gone.
    assert(out(1L) == ((2L, 2L, hex("unique one\nunique two"))))
    assert(out(2L) == ((1L, 1L, hex("other body"))))
    assert(out(3L) == ((2L, 0L, hex("solo line\nsolo line"))))
  }

  test("stripRepeatedLines: keep-first within doc, order kept, shuffle-free") {
    val md5d = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docsDf = Seq(
      // 'a' and 'b' repeat within the doc (one copy each via trim);
      // blank line dropped; first occurrences keep original order
      (1L, "a\nb\na\n\n b \nb\nc"),
      (2L, "only line"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val byId = TextDedup.stripRepeatedLines(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_segments"), r.getAs[Long]("removed_segments"),
          r.getAs[String]("clean_hash")))).toMap
    assert(byId(1L) == ((3L, 3L, hex("a\nb\nc"))))
    assert(byId(2L) == ((1L, 0L, hex("only line"))))
    assert(byId(3L) == ((0L, 0L, hex(""))))
    // within-doc semantics never need a shuffle
    val plan = TextDedup.stripRepeatedLines(docsDf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("dedupNearByPriority keeps the highest-score member, ties to min id") {
    val base = (0 until 20).map(i => s"tok$i").mkString(" ")
    val longer = base + " extra trailing tokens here"
    val docs = Seq(
      (1L, base),            // cluster {1,2,3}: 2 is longest → survives
      (2L, longer),
      (3L, base),            // exact copy of 1 (tie on score with 1 — but 2 wins anyway)
      (9L, "completely different unrelated content words nothing shared at all")
    ).toDF("doc_id", "text")
    val kept = TextDedup.dedupNearByPriority(docs, length(col("text")),
      jaccardThreshold = 0.5).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 9L), s"got ${kept.toSeq}")
    // tie case: equal scores → minimum id survives
    val tied = Seq((5L, base), (4L, base)).toDF("doc_id", "text")
    val keptTied = TextDedup.dedupNearByPriority(tied, length(col("text")),
      jaccardThreshold = 0.5).select("doc_id").as[Long].collect()
    assert(keptTied.toSeq == Seq(4L))
  }

  test("dedupExactAgainst: tier hashes block batch rows; in-batch race keeps min id") {
    val tier = Seq((1L, "the curated document"), (2L, "another tier doc")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a brand new document"),
      (11L, "THE   curated document"),  // normalizes to tier row 1 → dropped
      (12L, "a brand new document"),    // in-batch dup of 10 → dropped
      (13L, "also novel content")
    ).toDF("doc_id", "text")
    val kept = TextDedup.dedupExactAgainst(tier, batch)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 13L))
    // idempotent: reconciling the survivors again changes nothing
    val again = TextDedup.dedupExactAgainst(tier,
      TextDedup.dedupExactAgainst(tier, batch)).select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == Seq(10L, 13L))
  }

  test("levenshtein near-dup: finds single-char edits, respects maxDist and block cap") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    // edits sit BEYOND the 24-char blocking prefix (an edit inside the
    // prefix is out of this detector's contract — different block)
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")), // distance 1 within slice
      (3L, base + " extended with a long different tail that pushes distance"),
      (4L, "completely different text that shares no prefix with the others"),
      (5L, base.replace("dog", "wolf")) // distance 4 — beyond maxDist 2
    ).toDF("doc_id", "text")
    val pairs = TextDedup.nearDupPairsLevenshtein(docs, sliceLen = 60, maxDist = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"edit pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unblocked doc leaked in")
    assert(!pairs.contains((1L, 5L)), "beyond-maxDist pair kept")

    // a degenerate block larger than the cap generates NO pairs — and
    // the skip metric must then REPORT that block with its population,
    // so "0 pairs" is never silently read as "no duplicates"
    val degenerate = (0L until 100L).map(i => (i, base)).toDF("doc_id", "text")
    assert(TextDedup.nearDupPairsLevenshtein(degenerate, maxBlockSize = 64).count() == 0)
    val skipped = TextDedup.skippedBlocksLevenshtein(degenerate, maxBlockSize = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(skipped.length == 1 && skipped.head._2 == 100L, skipped.toList.toString)
    // under-cap corpora report nothing
    assert(TextDedup.skippedBlocksLevenshtein(docs, maxBlockSize = 64).isEmpty)
  }

  test("duplicate spans: first occurrence wins, overlapping windows merge, strip keeps one copy") {
    // 30 shared tokens planted at different offsets in two docs
    val repeated = (1 to 30).map(i => s"rep$i").mkString(" ")
    val df = Seq(
      (1L, s"$repeated alpha beta gamma delta epsilon"),
      (2L, s"zeta eta theta iota kappa $repeated"),
      (3L, "completely unrelated text with no long repeats at all")
    ).toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(df, k = 20).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toList
    // doc 1 holds the first occurrence -> no spans there or in doc 3
    assert(spans == List(2L -> ((6, 35))))
    val clean = TextDedup.stripDuplicateSpans(df, k = 20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L).startsWith("rep1 "))            // first copy survives
    assert(clean(2L) == "zeta eta theta iota kappa") // second copy stripped
    assert(clean(3L) == "completely unrelated text with no long repeats at all")
  }

  test("duplicate spans: within-doc repetition flagged; doc shorter than k emits nothing") {
    val block = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"$block middle filler words here $block"),
      (2L, "short doc")
    ).toDF("doc_id", "text")
    val spans = TextDedup.duplicateSpans(df, k = 20).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // second in-doc copy: tokens 30..54 (25 tokens, windows 30..35 merge)
    assert(spans.toList == List((1L, 30, 54)))
    // strip returns a row for EVERY doc, including untouched ones
    assert(TextDedup.stripDuplicateSpans(df, k = 20).count() == 2)
  }

  test("winnowed spans: whole-doc clone detected at fingerprint density, both hash families") {
    val body = (1 to 50).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, body),
      (2L, body),                                       // exact clone
      (3L, "a wholly different short document here with many other words repeated nowhere")
    ).toDF("doc_id", "text")
    for (twin <- Seq(false, true)) {
      val spans = TextDedup.winnowedSpans(df, k = 20, w = 8, md5Twin = twin).collect()
        .map(r => (r.getLong(0), r.getInt(3)))
      // only the clone is flagged, as one span at least w+k-1 long
      assert(spans.map(_._1).toSet == Set(2L), s"twin=$twin: ${spans.toList}")
      assert(spans.forall(s => s._2 >= 27 && s._2 <= 50), s"twin=$twin: ${spans.toList}")
    }
    // fingerprint density: far fewer selections than the stride-1 grid
    val grid = TextDedup.duplicateSpans(df, k = 20).count()
    val fps = TextDedup.winnowedFingerprints(df, k = 20, w = 8)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(fps.forall(_ <= 31))   // P = 31 windows per 50-token doc
    assert(fps.forall(_ >= 2))    // and never degenerate-empty
    assert(grid >= 1)
  }

  test("winnow_positions kernel matches the composable selection bit-for-bit on the corpus") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val native = TextDedup.winnowedFingerprints(d, k = 20, w = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val hof = TextDedup.winnowedFingerprintsHof(d, k = 20, w = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == hof, s"native/HOF diverge: ${(native -- hof).take(3)} vs ${(hof -- native).take(3)}")
    assert(native.nonEmpty)
  }

  test("winnow_positions: rightmost tie, short-array global argmin, dedup") {
    import org.apache.spark.sql.functions.{call_function, typedLit, lit => slit}
    // repeated equal minima: rightmost within each window must win
    val ties = Seq((Seq(5L, 1L, 7L, 1L, 9L, 8L), 3)).toDF("hs", "w")
    val got = ties.select(call_function("winnow_positions", $"hs", slit(3)))
      .as[Seq[Int]].head()
    // windows: [5,1,7]->pos2, [1,7,1]->pos4 (rightmost), [7,1,9]->pos4, [1,9,8]->pos4
    assert(got == Seq(2, 4))
    // array shorter than w: single global argmin, rightmost tie
    val short = Seq(1).toDF("x")
      .select(call_function("winnow_positions", typedLit(Seq(3L, 2L, 2L)), slit(8)))
      .as[Seq[Int]].head()
    assert(short == Seq(3))
  }

  test("incremental spans equal the union replay restricted to the batch") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val tier = d.filter(col("doc_id") < 300)
    val batch = d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val incremental = TextDedup.duplicateSpansAgainst(
        TextDedup.spanIndex(tier), batch)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val unionReplay = TextDedup.winnowedSpans(tier.unionByName(batch))
      .filter(col("doc_id") >= 500000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(incremental == unionReplay,
      s"diverge: ${(incremental -- unionReplay).take(3)} vs ${(unionReplay -- incremental).take(3)}")
    assert(incremental.nonEmpty) // copies of tier docs must be flagged
  }

  test("containment: subset doc is contained, superset direction is not") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 8 shingles (n=3)
      (2L, "a b c d e"),           // 3 shingles, all inside doc 1
      (3L, "x y z w q r")          // disjoint
    ).toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((2L, 1L)))        // only "2 contained in 1"
    assert(pairs((2L, 1L)) == 1.0)
    // at a lower threshold the reverse direction appears with 3/8
    val loose = TextDedup.containmentPairs(df, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(loose((1L, 2L)) == 3.0 / 8.0)
  }

  test("containment: identical docs contain each other; minShingles suppresses tiny docs") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "one two three")  // single shingle, present in nothing else
    ).toDF("doc_id", "text")
    // identical docs contain each other, and doc 3's lone shingle
    // "one two three" is a shingle of BOTH 1 and 2, so 3 is fully
    // contained in each (the tiny-doc spam minShingles suppresses)
    val pairs = TextDedup.containmentPairs(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)))
    val withTiny = TextDedup.containmentPairs(df, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withTiny.contains((3L, 1L)) && withTiny.contains((3L, 2L)))
    // minShingles filters the 1-shingle doc out of BOTH sides
    val filtered = TextDedup.containmentPairs(df, threshold = 0.5, minShingles = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!filtered.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment: stop-shingle cap drops pairs observably, not silently") {
    // 40 docs sharing one boilerplate shingle; cap excludes it
    val df = (0L until 40L).map(i => (i, s"common shared boiler id$i tail$i end$i"))
      .toDF("doc_id", "text")
    val capped = TextDedup.containmentPairs(df, threshold = 0.1, maxPostings = 10)
    val skipped = TextDedup.skippedPostingsContainment(df, maxPostings = 10)
    assert(capped.isEmpty)            // the only shared shingle was capped
    assert(skipped.count() == 1)      // and the metric reports exactly it
    assert(skipped.head().getAs[Long]("member_count") == 40L)
  }

  test("containment size prefilter: impossible directions pruned at the join, output unchanged") {
    // doc 5 (12 words, 10 shingles) is windowed into ten 1-shingle docs
    // 11..20 — each window is wholly contained (C = 1, kept), while the
    // reverse direction 5 -> window is IMPOSSIBLE at t=0.9 (|B| = 1 <
    // ceil(0.9·10) = 9). Whatever hash order the prefix picks, doc 5's
    // 2 prefix shingles each live in exactly one window doc, so the
    // 5 -> window raw candidates FORM deterministically — and must all
    // be pruned by the size condition before the verify. Docs 3/4 pin
    // the boundary: C exactly = t must survive the epsilon guard.
    val windows = (1 to 10).map(k =>
      (10L + k, (k to k + 2).map(i => s"m$i").mkString(" ")))
    val df = (Seq(
      (3L, "p q r s t u v w x y z z1"), // 10 shingles
      (4L, "p q r s t u v w x y z q9"), // 10 shingles, 9 shared -> C = 0.9 both ways
      (5L, (1 to 12).map(i => s"m$i").mkString(" "))
    ) ++ windows).toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet ==
      (Set((3L, 4L), (4L, 3L)) ++ (1 to 10).map(k => (10L + k, 5L))), pairs.toString)
    assert(pairs((3L, 4L)) == 0.9 && pairs((4L, 3L)) == 0.9,
      "at-threshold pairs must survive the epsilon-guarded size cut")
    val stats = TextDedup.containmentPruningStats(df, threshold = 0.9).head()
    val (raw, pruned, kept) = (stats.getAs[Long]("raw_rows"),
      stats.getAs[Long]("pruned_rows"), stats.getAs[Long]("kept_rows"))
    assert(raw == pruned + kept)
    assert(pruned >= 2L, s"doc 5's two prefix witnesses must be measured as pruned: $stats")
    assert(kept > 0L)
  }

  test("containmentSummary: doc-bound rollup with (max DESC, id ASC) argmax; dedupContained drops the quote") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 8 shingles — the fullest text
      (2L, "a b c d e f g h i j"), // identical twin of 1
      (3L, "a b c d e"),           // 3 shingles, all inside 1 and 2 (the "quote")
      (4L, "x y z w q r")          // disjoint bystander
    ).toDF("doc_id", "text")
    val sum = TextDedup.containmentSummary(df, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_containers"), r.getAs[Double]("max_containment"),
          r.getAs[Long]("top_container")))).toMap
    // 3 is fully contained in BOTH 1 and 2: count 2, max 1.0, tie → smaller id
    assert(sum(3L) == ((2L, 1.0, 1L)), sum.toString)
    // the twins contain each other: one container each
    assert(sum(1L) == ((1L, 1.0, 2L)) && sum(2L) == ((1L, 1.0, 1L)))
    assert(!sum.contains(4L)) // uncontained docs have no row
    // summary row count is doc-bound even though 4 ordered pairs exist
    assert(sum.size == 3)

    // dedup: 3 is dominated by the bigger 1 and 2 (dropped); of the
    // equal-size twins the SMALLER id survives; the bystander stays
    val kept = TextDedup.dedupContained(df, threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), kept.toString)
  }
}
