package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("cosine on handmade vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f), 4L, Array(2.0f, 2.0f)),
      (5L, Array(1.0f, 0.0f), 6L, Array(-1.0f, 0.0f))
    ).toDF("a_id", "a", "b_id", "b")
      .select($"a_id", Similarity.cosine($"a", $"b").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df(1L) == 0.0)
    assert(math.abs(df(3L) - 1.0) < 1e-12)
    assert(df(5L) == -1.0)
  }

  test("topKExact: correct neighbors, self excluded, rank ordered") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val probes = vecs.filter($"vec_id" === 1L)
    val out = Similarity.topKExact(vecs, probes, 3).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 1L))
  }

  test("LSH bucket is deterministic and identical vectors share buckets") {
    val planted = emb.unionByName(
      emb.filter($"vec_id" % 50 === 0).select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label"))
    val b = planted.select($"vec_id", Similarity.lshBucket($"embedding", 8, 64).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    emb.filter($"vec_id" % 50 === 0).select("vec_id").collect().map(_.getLong(0))
      .foreach(id => assert(b(id) == b(id + 100000), s"copy of $id landed in a different bucket"))
  }

  test("null or dimension-mismatched embeddings bucket to NULL and never fabricate neighbors") {
    val vecs = Seq(
      (1L, Some(Array(1.0f, 0.0f))),
      (2L, Some(Array(0.9f, 0.1f))),
      (3L, None: Option[Array[Float]]),          // null embedding
      (4L, Some(Array(1.0f, 0.0f, 0.0f)))        // off-dimension
    ).toDF("vec_id", "embedding")
    val buckets = vecs.select($"vec_id",
      Similarity.lshBucket($"embedding", 8, 2).as("b"),
      Similarity.lshBucketMd5($"embedding", 8, 2).as("bm"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(buckets(1L) == ((false, false)) && buckets(2L) == ((false, false)))
    assert(buckets(3L) == ((true, true)), "null embedding must bucket to NULL, not bucket 0")
    assert(buckets(4L) == ((true, true)), "off-dim embedding must bucket to NULL, not bucket 0")
    // a null-embedding probe yields NO rows (the old HOF semantics)
    val out = Similarity.topKLsh(vecs, vecs.filter($"vec_id" >= 3L), 2, planes = 8)
    assert(out.collect().isEmpty, "broken rows fabricated neighbors")
  }

  test("literal-plane lshBucket matches the per-row expression rendition bit-for-bit") {
    val diff = emb.select(
      Similarity.lshBucket($"embedding", 8, 64).as("literal"),
      Similarity.lshBucketHof($"embedding", 8).as("hof"))
      .filter($"literal" =!= $"hof").count()
    assert(diff == 0, s"$diff rows bucketed differently by the literal-plane kernel")
  }

  test("md5-banded keys: identical vectors share every band bucket; md5 path matches seeded recall shape") {
    val copies = emb.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(copies)
    val top1 = Similarity.topKLshBanded(planted, copies, 1, bands = 4, planesPerBand = 8,
      md5Derived = true)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val probeIds = copies.select("vec_id").collect().map(_.getLong(0))
    val hits = probeIds.count(pid => top1.get(pid).contains(pid - 100000))
    assert(hits == probeIds.length, s"only $hits/${probeIds.length} twins found via md5 bands")
  }

  test("nearDupPairsCosine finds planted exact copies via bucketed join") {
    val copies = emb.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(copies)
    val pairs = Similarity.nearDupPairsCosine(planted, threshold = 0.999)
    val got = pairs.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val expected = emb.filter($"vec_id" % 50 === 0).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(expected.subsetOf(got), s"missed: ${expected.diff(got)}")

    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan:\n$plan")
  }

  test("IVF: identical copies share a centroid and are always found; recall beats chance") {
    val copies = emb.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(copies)
    val cents = Similarity.trainCentroids(planted, k = 8, iters = 2)
    assert(cents.length == 8 && cents.forall(_.length == 64))

    val top1 = Similarity.topKIvf(planted, copies, 1, cents, nprobe = 2)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val probeIds = copies.select("vec_id").collect().map(_.getLong(0))
    // a copy is bit-identical to its twin -> same argmax centroid -> the
    // twin is always in the probed cell and wins rank 1
    val hits = probeIds.count(pid => top1.get(pid).contains(pid - 100000))
    assert(hits == probeIds.length, s"only $hits/${probeIds.length} twins found")
  }

  test("banded LSH: recall vs exact baseline at least matches one 8-plane table, plan stays equi-join") {
    val probes = emb.filter($"vec_id" % 25 === 0)
    val exact = Similarity.topKExact(emb, probes, 3).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val single = recallOf(Similarity.topKLsh(emb, probes, 3, planes = 8))
    // 16 bands × 6 planes: band count drives recall while per-band
    // bucket space (2^6 × 16 keys) keeps occupancy low — measured 0.65
    // vs 0.05 for the single 256-bucket table on this corpus
    val banded = recallOf(Similarity.topKLshBanded(emb, probes, 3, bands = 16, planesPerBand = 6))
    assert(banded > single, s"banded recall $banded <= single-table $single")
    assert(banded >= 0.5, s"banded recall $banded unreasonably low")

    val plan = Similarity.topKLshBanded(emb, probes, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs plan:\n$plan")
  }

  test("cosine near-dup: degenerate identical family is capped and reported") {
    val one = emb.filter($"vec_id" === 0).select("embedding").collect().head.getSeq[Float](0)
    val degenerate = spark.range(3000).select($"id".as("vec_id"), typedLit(one).as("embedding"))
    val pairs = Similarity.nearDupPairsCosine(degenerate, threshold = 0.999, maxBucketSize = 100)
    assert(pairs.limit(1).collect().isEmpty, "degenerate bucket leaked pairs")
    val skipped = Similarity.skippedBucketsCosine(degenerate, maxBucketSize = 100).collect()
    assert(skipped.length == 8 && skipped.forall(_.getAs[Long]("member_count") == 3000L),
      s"expected all 8 band buckets hot: ${skipped.mkString(",")}")
  }

  test("nearDupAgainstCosine equals batch-global dedup restricted to the batch") {
    val e = emb.select("vec_id", "embedding")
    val n = e.count()
    val half = n / 2
    // copies of both tier and batch vectors land in the batch
    val copies = e.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val tier = e.filter($"vec_id" < half)
    val batch = e.filter($"vec_id" >= half).unionByName(copies)
    val incremental = Similarity.nearDupAgainstCosine(tier, batch, 0.999,
        tierIndex = Some(Similarity.vecBandIndex(tier)))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val global = Similarity.dedupNearCosine(e.unionByName(copies), 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(incremental == global.intersect(batchIds),
      s"inc-only=${incremental.diff(global).take(5)} global-only=${global.intersect(batchIds).diff(incremental).take(5)}")
    // a planted copy of a TIER vector is dropped (cross reconciliation)...
    assert(!incremental.contains(100000L))
    // ...a planted copy of a BATCH vector loses to its in-batch original
    assert(incremental.contains(250L) && !incremental.contains(100250L))
    // the tier is never modified: nothing in the output is a tier id
    assert(incremental.forall(id => id >= half))
  }

  test("topKLsh recovers planted near-identical neighbors for most probes") {
    val copies = emb.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(copies)
    val probes = copies
    val top1 = Similarity.topKLsh(planted, probes, 1, planes = 8)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = probes.select("vec_id").collect().map(_.getLong(0))
      .count(pid => top1.get(pid).contains(pid - 100000))
    // identical copies always share a bucket, so every probe must find its twin
    assert(hits == probes.count(), s"only $hits probes found their twin")
  }

  test("knnGraph: symmetric-candidate top-k per vector, self excluded, cap degrades to skip") {
    // planted twins (id, id+1000): every vector's rank-1 neighbor must
    // be its identical twin (cosine 1), in BOTH directions
    val planted = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + 1000).as("vec_id"), $"embedding"))
    val out = Similarity.knnGraph(planted, k = 1, bands = 4, planesPerBand = 8)
      .select($"src_id", $"neighbor_id", $"sim").collect()
    val rank1 = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = emb.count()
    // every vector appears as a source (twin guarantees a bucket-mate)
    assert(rank1.size == 2 * n, s"expected ${2 * n} sources, got ${rank1.size}")
    rank1.foreach { case (src, (nb, sim)) =>
      assert(nb == (if (src >= 1000) src - 1000 else src + 1000),
        s"src $src rank-1 neighbor was $nb, not its twin")
      assert(math.abs(sim - 1.0) < 1e-9)
    }

    // a degenerate corpus (one identical family larger than the cap)
    // yields no edges — REPORTED skip, never a quadratic task, and
    // never a silent one: the skip metric carries the hot buckets and
    // coverage shows every family member at degree 0
    val family = (0L until 100L).map(i => (i, Array(1.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val (g, skipped) = Similarity.knnGraphAndSkips(family, k = 3, maxBucketSize = 64)
    assert(g.count() == 0)
    val sk = skipped.collect()
    assert(sk.nonEmpty, "hot buckets past the cap must be reported, not silently dropped")
    assert(sk.forall(_.getAs[Long]("member_count") == 100L), sk.mkString(","))
    val cov = Similarity.knnCoverage(family, g).collect()
    assert(cov.length == 100 && cov.forall(_.getAs[Long]("degree") == 0L),
      "cap-starved anchors must surface as degree 0")
    // mutualKnn pipes the same reporter through
    val (mg, msk) = Similarity.mutualKnnAndSkips(family, k = 3, maxBucketSize = 64)
    assert(mg.count() == 0 && msk.count() == sk.length)
  }

  test("knnCoverage: degrees match the graph's own group-by; full corpus covered on the twin fixture") {
    val planted = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + 1000).as("vec_id"), $"embedding"))
    val g = Similarity.knnGraph(planted, k = 2, bands = 4, planesPerBand = 8, md5Derived = true)
      .localCheckpoint(true)
    val cov = Similarity.knnCoverage(planted, g).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("degree")).toMap
    assert(cov.size == planted.count())
    val byGraph = g.collect().groupBy(_.getAs[Long]("src_id")).view.mapValues(_.length.toLong).toMap
    byGraph.foreach { case (id, d) => assert(cov(id) == d, s"anchor $id: cov=${cov(id)} graph=$d") }
    // twins guarantee every anchor has a bucket-mate: no degree-0 rows here
    assert(cov.values.forall(_ >= 1L))
  }

  test("knnGraph plan: no broadcast-nested-loop, no cartesian — candidates stay equi-join") {
    val plan = Similarity.knnGraph(emb, k = 3, bands = 4, planesPerBand = 8, md5Derived = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"kNN graph must never go all-pairs:\n$plan")
  }

  test("mutualKnn equals the reciprocal-pair filter computed from knnGraph's own output") {
    val g = Similarity.knnGraph(emb, k = 3, bands = 4, planesPerBand = 8, md5Derived = true)
      .select($"src_id", $"neighbor_id", $"sim").collect()
    val edges = g.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = edges.keys
      .filter { case (a, b) => a < b && edges.contains((b, a)) }
      .map { case (a, b) => (a, b, edges((a, b))) }.toSet
    val got = Similarity.mutualKnn(emb, k = 3, bands = 4, planesPerBand = 8, md5Derived = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, s"mutual=${got.size} expected=${expected.size}")
    assert(expected.nonEmpty, "fixture must produce at least one mutual edge")
    // one-directional edges must NOT survive
    val oneWay = edges.keys.exists { case (a, b) => !edges.contains((b, a)) }
    assert(oneWay, "fixture must contain a one-directional edge for the filter to matter")
  }

  test("labelCentroids matches a driver-side exact mean per (label, dim)") {
    val rows = emb.select("label", "embedding")
      .as[(Int, Array[Float])].collect()
    val dim = rows.head._2.length
    val expected = rows.groupBy(_._1).flatMap { case (label, vs) =>
      (0 until dim).map { d =>
        // same arithmetic contract: exact (BigDecimal) sum, one double divide
        val s = vs.map(v => BigDecimal(v._2(d).toDouble)).sum
        (label, d, (s / vs.length).toDouble)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Similarity.labelCentroids(emb).orderBy("label", "dim")
      .as[(Int, Int, Double)].collect().toSeq
    assert(got.size == expected.size)
    got.zip(expected).foreach { case ((gl, gd, gv), (el, ed, ev)) =>
      assert(gl == el && gd == ed && math.abs(gv - ev) < 1e-12,
        s"label $gl dim $gd: $gv vs $ev")
    }
  }

  test("labelCentroids is run-to-run stable (order-free summation)") {
    val a = Similarity.labelCentroids(emb.repartition(7)).orderBy("label", "dim")
      .as[(Int, Int, Double)].collect().toSeq
    val b = Similarity.labelCentroids(emb.repartition(31)).orderBy("label", "dim")
      .as[(Int, Int, Double)].collect().toSeq
    assert(a == b, "centroids must not depend on partitioning")
  }

  test("topKQuantized: identical copies win rank 1; sims track the float baseline") {
    val copies = emb.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding", $"label")
    val planted = emb.unionByName(copies)
    // an exact copy quantizes to identical (mn, s, codes) → sim 1.0 → rank 1
    val top1 = Similarity.topKQuantized(planted, copies, 1)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val probeIds = copies.select("vec_id").collect().map(_.getLong(0))
    assert(probeIds.forall(pid => top1.get(pid).contains(pid - 100000)),
      "quantized search must find bit-identical twins at rank 1")
    // quantized sims approximate the exact cosine within quantization
    // error (64 dims × one-step-per-element error stays well under 0.05
    // on unit-scale vectors)
    val probes = emb.filter($"vec_id" % 25 === 0)
    val exact = Similarity.topKExact(emb, probes, 3).collect()
      .map(r => ((r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")), r.getAs[Double]("sim"))).toMap
    val quant = Similarity.topKQuantized(emb, probes, 3).collect()
      .map(r => ((r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")), r.getAs[Double]("sim"))).toMap
    val shared = exact.keySet.intersect(quant.keySet)
    assert(shared.nonEmpty, "quantized and exact top-3 share no pairs at all")
    shared.foreach { k =>
      assert(math.abs(exact(k) - quant(k)) < 0.05,
        s"pair $k: quantized ${quant(k)} vs exact ${exact(k)}")
    }
  }

  test("quantizeInt8: codes reconstruct within one step; degenerate vectors handled") {
    val d = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f, 0.25f)),
      (2L, Array(3.0f, 3.0f, 3.0f)),          // constant → all-zero codes
      (3L, Array.empty[Float]),               // empty → empty codes
      (4L, null.asInstanceOf[Array[Float]]),  // NULL through
      (5L, Array(-2.5f, 7.125f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d).orderBy("vec_id").collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    // exact endpoints: 0→0, 1→255 (exact division), 0.5→127 (127.5 floors)
    assert(byId(1L).getSeq[Int](3).toList == List(0, 255, 127, 63))
    assert(byId(2L).getSeq[Int](3).toList == List(0, 0, 0)
      && byId(2L).getAs[Double]("v_min") == 3.0)
    assert(byId(3L).getSeq[Int](3).toList == Nil && byId(3L).isNullAt(1))
    assert(byId(4L).isNullAt(3))
    // reconstruction: v_min + code*scale is within one step of the source
    val r5 = byId(5L)
    val (mn, mx) = (r5.getAs[Double]("v_min"), r5.getAs[Double]("v_max"))
    val scale = (mx - mn) / 255.0
    r5.getSeq[Int](3).toList.zip(List(-2.5, 7.125, 0.0)).foreach { case (c, v) =>
      assert(c >= 0 && c <= 255 && math.abs(mn + c * scale - v) <= scale,
        s"code $c rebuilds ${mn + c * scale}, want within $scale of $v")
    }
    // corpus-wide: every code in range, one row per vector
    val full = Similarity.quantizeInt8(emb)
    assert(full.count() == emb.count())
    assert(full.filter(exists(col("codes"), c => c < 0 || c > 255)).isEmpty)
  }

  test("semDedup: exact copies drop, dissimilar vectors all survive") {
    // orthogonal + antipodal vectors: every pairwise cosine is 0 or -1,
    // so regardless of cluster assignment nothing can dominate anything
    val basis = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f)),
      (5L, Array(-1f, 0f, 0f, 0f)))
    val clean = basis.toDF("vec_id", "embedding")
    val allKept = Similarity.semDedup(clean, tau = 0.9)
    assert(allKept.count() == 5)
    assert(allKept.filter(!col("kept")).isEmpty)

    // add exact copies under higher ids: a copy shares its original's
    // cluster bitwise (identical sign pattern) and must be dropped
    val withCopies = clean.unionByName(
      basis.map { case (id, v) => (id + 100, v) }.toDF("vec_id", "embedding"))
    val r = Similarity.semDedup(withCopies, tau = 0.9)
      .collect().map(row => row.getLong(0) -> (row.getLong(1), row.getBoolean(2))).toMap
    basis.foreach { case (id, _) =>
      assert(r(id)._2, s"original $id must survive")
      assert(!r(id + 100)._2, s"copy of $id must drop")
      assert(r(id)._1 == r(id + 100)._1, s"copy of $id must share its cluster")
    }
  }

  test("semDedup: domination is not transitive closure") {
    // chain a~b (cos .995), b~c (cos .995), a~c (cos .98): with tau
    // between a·c and 1, c is dominated by BOTH a and b here; with tau
    // above a·c but below a·b, c is still dominated by b even though
    // b itself dropped — dominated-by-earlier, not greedy-survivor
    val a = Array(1f, 0f)
    val b = Array(math.cos(0.1).toFloat, math.sin(0.1).toFloat)
    val c = Array(math.cos(0.2).toFloat, math.sin(0.2).toFloat)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    // cos(a,b)=cos(b,c)=cos(0.1)≈0.995; cos(a,c)=cos(0.2)≈0.980
    val r = Similarity.semDedup(df, tau = 0.99)
      .collect().map(row => row.getLong(0) -> row.getBoolean(2)).toMap
    // the md5 planes are deterministic: all three vectors land in one
    // cell (verified offline: bucket 30 for the 6-plane/2-dim family)
    val clusters = Similarity.semDedup(df, tau = 0.99)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(clusters(1L) == clusters(2L) && clusters(2L) == clusters(3L))
    assert(r(1L))       // nothing earlier
    assert(!r(2L))      // dominated by a (0.995 >= 0.99)
    assert(!r(3L))      // dominated by b (0.995 >= 0.99) though b dropped
  }

  test("semDedupKmeans: learned cells split the groups; within-cell near-dups drop keep-first") {
    // two tight groups far apart: k=2 Lloyd MUST split them; each
    // group's later near-copy drops, cross-group similarity ~0 so
    // nothing crosses cells; a null row passes through kept
    val df = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.999f, 0.01f, 0f)),
      (10L, Array(0f, 0f, 1f)), (11L, Array(0f, 0.01f, 0.999f)),
      (20L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val r = Similarity.semDedupKmeans(df, tau = 0.95, k = 2, iters = 2)
      .collect().map(row => row.getLong(0) ->
        ((if (row.isNullAt(1)) None else Some(row.getLong(1))), row.getBoolean(2))).toMap
    assert(r.keySet == Set(1L, 2L, 10L, 11L, 20L), "every input row comes back")
    assert(r(1L)._2 && !r(2L)._2, s"group A keeps first only: $r")
    assert(r(10L)._2 && !r(11L)._2, s"group B keeps first only: $r")
    assert(r(1L)._1 == r(2L)._1, "near-copies share their learned cell")
    assert(r(1L)._1 != r(10L)._1, "k=2 must separate the groups")
    assert(r(20L) == ((None, true)), "null embedding: kept, null cluster")
  }

  test("pqEncode: m codes in [0, ksub); identical vectors encode identically") {
    val books = Similarity.pqBooksMd5(4, 8, 16)
    assert(books.length == 4 && books.forall(_.length == 8)
      && books.forall(_.forall(b => b.length == 16 && b.forall(v => v >= 0 && v <= 255))))
    val planted = emb.select($"vec_id", $"embedding").unionByName(
      emb.filter($"vec_id" % 50 === 0).select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val codes = Similarity.pqEncode(planted, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](3)).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(v => v >= 0 && v < 8)))
    emb.filter($"vec_id" % 50 === 0).select("vec_id").collect().map(_.getLong(0))
      .foreach(id => assert(codes(id) == codes(id + 100000),
        s"identical copy of $id got different pq codes"))
  }

  test("trainPqBooks cuts reconstruction error vs random md5 codebooks") {
    // distortion = mean over vectors of the integer L2 between the
    // int8 codes and their PQ reconstruction; Lloyd rounds must beat
    // a uniform-random codebook on real data by a wide margin.
    def distortion(books: Seq[Seq[Seq[Int]]]): Double = {
      val q = Similarity.quantizeInt8(emb)
      val enc = Similarity.pqEncode(emb, books)
      q.join(enc.withColumnRenamed("v_min", "mn2").withColumnRenamed("v_max", "mx2"), "vec_id")
        .select($"vec_id", $"codes", $"pq_codes").collect().map { r =>
          val c = r.getSeq[Int](1); val pc = r.getSeq[Int](2)
          val rc = pc.zipWithIndex.flatMap { case (code, j) => books(j)(code) }
          c.zip(rc).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
        }.sum / 500.0
    }
    val md5D = distortion(Similarity.pqBooksMd5(4, 8, 16))
    val trainedD = distortion(Similarity.trainPqBooks(emb, m = 4, ksub = 8, iters = 2))
    assert(trainedD < md5D * 0.6,
      s"training should cut PQ distortion by ≥40%: trained=$trainedD md5=$md5D")
  }

  test("topKIvfPq: planted twins always come back at rank 1") {
    val planted = emb.select($"vec_id", $"embedding").unionByName(
      emb.filter($"vec_id" % 50 === 0).select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val cents = Similarity.trainCentroids(planted, k = 8, iters = 2)
    val books = Similarity.trainPqBooks(planted, m = 4, ksub = 8, iters = 2)
    val top1 = Similarity.topKIvfPq(planted, planted.filter($"vec_id" >= 100000), 3,
        cents, books, nprobe = 2)
      .filter($"rank" === 1)
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val probeIds = emb.filter($"vec_id" % 50 === 0).select("vec_id").collect().map(_.getLong(0))
    assert(probeIds.nonEmpty)
    probeIds.foreach(id => assert(top1(id + 100000) == id,
      s"probe ${id + 100000}: rank-1 was ${top1(id + 100000)}, expected twin $id"))
  }

  test("stored IVF-PQ tier: catalog round-trip + append-encode equals the inline path") {
    val base = emb.select($"vec_id", $"embedding").localCheckpoint(true)
    val cents = Similarity.trainCentroids(base, k = 8, iters = 2)
    val books = Similarity.trainPqBooks(base, m = 4, ksub = 8, iters = 2)
    val tbl = "test_emb_pq_index"
    graft.plans.Catalog.dropIfExists(spark, tbl)
    graft.plans.Catalog.overwriteTable(Similarity.pqIndex(base, cents, books), tbl)
    // a new batch append-encodes WITHOUT re-encoding the base tier
    val batch = base.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    graft.plans.Catalog.insertAppend(spark, tbl, Similarity.pqIndex(batch, cents, books))
    val full = base.unionByName(batch)
    // encode is row-local, so index(base) ∪ index(batch) ≡ index(full):
    // the stored read must be row-identical to the inline path
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val stored = rows(Similarity.topKIvfPqStored(spark.table(tbl), batch, 3,
      cents, books, nprobe = 2))
    val inline = rows(Similarity.topKIvfPq(full, batch, 3, cents, books, nprobe = 2))
    assert(stored == inline && stored.nonEmpty, s"stored=${stored.size} inline=${inline.size}")
    // refine tail from the stored tier: sims are exact, twins at rank 1
    val refined = Similarity.topKIvfPqStoredRefine(spark.table(tbl), full, batch, 3,
        cents, books, nprobe = 2, refine = 16)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    refined.foreach { case (p, n) => assert(n == p - 100000, s"probe $p rank-1 $n") }
    // the stored read plan scans codes, never the corpus embeddings:
    // the only float-vector work is the broadcast-probe side
    val plan = Similarity.topKIvfPqStored(spark.table(tbl), batch, 3,
      cents, books, nprobe = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"stored IVF-PQ read must stay an equi-join:\n$plan")
    graft.plans.Catalog.dropIfExists(spark, tbl)
  }

  test("knnGraphPq: compressed-domain graph off the index — twins at sim 1, hot cells reported") {
    val planted = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + 1000).as("vec_id"), $"embedding"))
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val books = Similarity.pqBooksMd5(4, 8, dim / 4)
    val idx = Similarity.pqIndexBy(planted, Similarity.lshBucketMd5(_, 4, dim), books)
      .localCheckpoint(true)
    val g = Similarity.knnGraphPq(idx, books, k = 1, maxCellSize = 4096)
      .collect()
    // identical twins share cell, codes, and scalars, so a sim-1
    // candidate exists for every anchor: rank-1 sim must be exactly 1
    val n = emb.count()
    assert(g.length == 2 * n, s"expected ${2 * n} anchors, got ${g.length}")
    g.foreach(r => assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9,
      s"anchor ${r.getAs[Long]("src_id")} rank-1 sim ${r.getAs[Double]("sim")}"))
    // the plan reads codes only — no float embedding survives into the join
    val plan = Similarity.knnGraphPq(idx, books, k = 1, maxCellSize = 4096)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PQ graph must stay an equi-join:\n$plan")

    // one identical family larger than the cap: no edges, REPORTED skip
    val family = (0L until 100L).map(i => (i, Array(1.0f, 0.0f, 0.5f, 0.2f)))
      .toDF("vec_id", "embedding")
    val fIdx = Similarity.pqIndexBy(family, Similarity.lshBucketMd5(_, 4, 4),
      Similarity.pqBooksMd5(2, 4, 2))
    val (fg, skipped) = Similarity.knnGraphPqAndSkips(fIdx,
      Similarity.pqBooksMd5(2, 4, 2), k = 3, maxCellSize = 64)
    assert(fg.count() == 0)
    val sk = skipped.collect()
    assert(sk.length == 1 && sk.head.getAs[Long]("member_count") == 100L, sk.mkString(","))
  }

  test("knnGraphPq over a CELL-BUCKETED stored tier: the self-join never shuffles the index") {
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val books = Similarity.pqBooksMd5(4, 8, dim / 4)
    val idx = Similarity.pqIndexBy(emb.select($"vec_id", $"embedding"),
      Similarity.lshBucketMd5(_, 4, dim), books)
    val tbl = "test_pq_idx_bucketed"
    graft.plans.Catalog.dropIfExists(spark, tbl)
    graft.plans.Catalog.ctasBucketed(idx, tbl, "cell", 8)
    // force the sort-merge path so the assertion is about DATA LAYOUT,
    // not about AQE happening to broadcast a small test fixture
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // unbucketed baseline: cell pre-count + the a×b self-join each
      // repartition the index by cell
      val inlinePlan = Similarity.knnGraphPq(idx, books, k = 1, maxCellSize = 4096)
        .queryExecution.executedPlan.toString
      assert(inlinePlan.contains("hashpartitioning(cell"),
        s"baseline should shuffle on cell:\n$inlinePlan")
      // bucketed tier: bucket layout satisfies every cell distribution —
      // pre-count, cap join, and the self-join all read buckets in place
      val g = Similarity.knnGraphPq(spark.table(tbl), books, k = 1, maxCellSize = 4096)
      val bucketedPlan = g.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("hashpartitioning(cell"),
        s"bucketed tier must not re-shuffle on cell:\n$bucketedPlan")
      // and the results are identical to the inline index
      val fromTable = g.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val fromInline = Similarity.knnGraphPq(idx, books, k = 1, maxCellSize = 4096)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(fromTable == fromInline && fromTable.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
    graft.plans.Catalog.dropIfExists(spark, tbl)
  }

  test("knnLabelAudit: majority vote flags the planted mislabel; ties go to the smaller label") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0.98f, 0.2f), 0),
      (3L, Array(0.96f, 0.28f), 1),  // mislabeled member of the 0-cluster
      (4L, Array(0f, 1f), 1),
      (5L, Array(0.1f, 0.99f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAudit(Similarity.topKExact(vecs, vecs, 2),
      vecs.select("vec_id", "label"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    // 3's two nearest are 1 and 2 (both label 0) -> majority 0, suspect
    assert(out(3L).getAs[Int]("knn_label") == 0 && out(3L).getAs[Boolean]("suspect"))
    assert(out(3L).getAs[Long]("votes") == 2L)
    // 4's neighbors are 5 (l1) and 3 (l1): consistent
    assert(!out(4L).getAs[Boolean]("suspect"))
    // tie case: 1's neighbors are 2 (l0) and 3 (l1) -> 1-1 tie, smaller label wins
    assert(out(1L).getAs[Int]("knn_label") == 0 && !out(1L).getAs[Boolean]("suspect"))
    // the tie-break must hold for NON-NUMERIC labels too (the former
    // struct-max negated the label — a silent null-cast on strings that
    // flipped ties to the LARGEST label)
    val sVecs = Seq(
      (1L, Array(1f, 0f), "alpha"),
      (2L, Array(0.98f, 0.2f), "alpha"),
      (3L, Array(0.96f, 0.28f), "beta"),
      (4L, Array(0f, 1f), "beta"),
      (5L, Array(0.1f, 0.99f), "beta")
    ).toDF("vec_id", "embedding", "label")
    val sOut = Similarity.knnLabelAudit(Similarity.topKExact(sVecs, sVecs, 2),
      sVecs.select("vec_id", "label"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(sOut(3L).getAs[String]("knn_label") == "alpha" && sOut(3L).getAs[Boolean]("suspect"))
    // 1's neighbors: 2 (alpha) and 3 (beta) -> tie, SMALLEST label wins
    assert(sOut(1L).getAs[String]("knn_label") == "alpha" && !sOut(1L).getAs[Boolean]("suspect"))
  }

  test("mineTriplets: hardest same/different-label picks; anchors missing a class drop") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0.99f, 0.14f), 0),   // nearest same-label to 1
      (3L, Array(0.9f, 0.44f), 1),    // nearest diff-label to 1
      (4L, Array(0f, 1f), 1),
      (5L, Array(-1f, 0f), 0)         // far-away same-label
    ).toDF("vec_id", "embedding", "label")
    val graph = Similarity.topKExact(vecs, vecs, 4) // all others are candidates
    val out = Similarity.mineTriplets(graph, vecs.select("vec_id", "label"))
      .collect().map(r => r.getAs[Long]("anchor_id") -> r).toMap
    val t1 = out(1L)
    assert(t1.getAs[Long]("positive_id") == 2L)
    assert(t1.getAs[Long]("negative_id") == 3L)
    assert(t1.getAs[Double]("pos_sim") > t1.getAs[Double]("neg_sim"))
    // every anchor here sees both classes among 4 candidates -> 5 triplets
    assert(out.size == 5)
    // k=1 graph: anchor 1's only candidate is same-label 2 -> dropped
    val k1 = Similarity.mineTriplets(Similarity.topKExact(vecs, vecs, 1),
      vecs.select("vec_id", "label")).collect()
      .map(_.getAs[Long]("anchor_id")).toSet
    assert(!k1.contains(1L))
  }

  test("topKIvfPqRefine: refined sims are the exact cosines, twins at rank 1") {
    val planted = emb.select($"vec_id", $"embedding").unionByName(
      emb.filter($"vec_id" % 50 === 0).select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
      .localCheckpoint(true)
    val probes = planted.filter($"vec_id" >= 100000)
    val cents = Similarity.trainCentroids(planted, k = 8, iters = 2)
    val books = Similarity.trainPqBooks(planted, m = 4, ksub = 8, iters = 2)
    val refined = Similarity.topKIvfPqRefine(planted, probes, 3, cents, books,
      nprobe = 2, refine = 16).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim")).toMap
    // every refined sim equals the direct float cosine of that pair
    val exact = Similarity.topKExact(planted, probes, 16).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim")).toMap
    refined.foreach { case (pair, s) =>
      exact.get(pair).foreach(e => assert(s == e, s"$pair: refined $s != exact $e"))
    }
    // and the twin invariant holds end-to-end
    val r1 = Similarity.topKIvfPqRefine(planted, probes, 1, cents, books,
      nprobe = 2, refine = 16).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    r1.foreach { case (p, n) => assert(n == p - 100000, s"probe $p rank-1 $n") }
  }

  test("topKIvfPq plan: candidates stay an equi-join on the cell id") {
    val planted = emb.select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(planted, k = 4, iters = 1)
    val plan = Similarity.topKIvfPq(planted, planted.limit(5), 3, cents,
      Similarity.pqBooksMd5(4, 8, 16), nprobe = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF-PQ must not degrade to a cartesian product")
  }

  test("knnGraphPqRefine: refined sims are the true cosines; twins at exact rank 1") {
    val planted = emb.select($"vec_id", $"embedding")
      .unionByName(emb.filter($"vec_id" % 10 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
      .localCheckpoint(true)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val books = Similarity.pqBooksMd5(4, 8, dim / 4)
    val idx = Similarity.pqIndexBy(planted, Similarity.lshBucketMd5(_, 4, dim), books)
    val refined = Similarity.knnGraphPqRefine(idx, planted, books, k = 1,
      refine = 8, maxCellSize = 4096).collect()
    // every planted anchor's refined rank-1 is its twin, with sim
    // exactly the float cosine (1 for identical vectors)
    refined.filter(_.getAs[Long]("src_id") >= 100000).foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("src_id") - 100000, r.toString)
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9, r.toString)
    }
    // and the refine tail never degrades the plan to a float corpus scan
    val plan = Similarity.knnGraphPqRefine(idx, planted, books, k = 1,
      refine = 8, maxCellSize = 4096).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"refine tail must stay id-keyed equi-joins:\n$plan")
  }

  test("knnGraphPqProbed: candidate superset of the same-cell graph; cross-cell neighbors appear") {
    val planted = emb.select($"vec_id", $"embedding")
      .unionByName(emb.filter($"vec_id" % 10 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
      .localCheckpoint(true)
    val cents = Similarity.trainCentroids(planted, k = 8, iters = 2)
    val books = Similarity.trainPqBooks(planted, m = 4, ksub = 8, iters = 2)
    val idx = Similarity.pqIndex(planted, cents, books).localCheckpoint(true)

    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("neighbor_id"))).toSet
    // with a big k both graphs return their FULL candidate sets: the
    // probed graph (assigned cell always probed + top recon cells)
    // must be a strict-or-equal superset of the same-cell graph
    val sameCell = pairs(Similarity.knnGraphPq(idx, books, k = 10000, maxCellSize = 4096))
    val probed = pairs(Similarity.knnGraphPqProbed(idx, cents, books, k = 10000,
      nprobe = 2, maxCellSize = 4096))
    assert(sameCell.subsetOf(probed),
      s"probed candidates must cover the same-cell graph; missing ${(sameCell -- probed).take(3)}")
    assert(probed.size > sameCell.size,
      "nprobe=2 should reach at least one cross-cell candidate on a natural corpus")

    // twin invariant through the exact re-rank tail: the twin shares
    // the assigned cell, is always proposed, and wins rank 1
    val top1 = Similarity.graphRefineExact(
        Similarity.knnGraphPqProbed(idx, cents, books, k = 8, nprobe = 2,
          maxCellSize = 4096), planted, k = 1)
      .filter($"src_id" >= 100000).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("src_id") - 100000, r.toString)
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9, r.toString)
    }

    // skipped-cell reporting carries over, and anchors STRANDED in a
    // skipped hot cell still reach neighbors through their other
    // probes (explicit centroids — fully deterministic cells): a
    // 100-member family lands in cell 0 (over cap 64, reported), the
    // lone cell-1 vector is every family anchor's cross-cell candidate
    val cents2 = Array(Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f))
    val books2 = Similarity.pqBooksMd5(2, 4, 2)
    val df2 = ((0L until 100L).map(i => (i, Array(1.0f, 0.05f, 0f, 0f))) :+
      ((200L, Array(0.1f, 1.0f, 0f, 0f)))).toDF("vec_id", "embedding")
    val idx2 = Similarity.pqIndex(df2, cents2, books2)
    val (g2, sk2) = Similarity.knnGraphPqProbedAndSkips(idx2, cents2, books2,
      k = 3, nprobe = 2, maxCellSize = 64)
    val sk2r = sk2.collect()
    assert(sk2r.length == 1 && sk2r.head.getAs[Long]("member_count") == 100L,
      sk2r.mkString(","))
    assert(g2.filter($"src_id" < 100).count() == 100,
      "every stranded family anchor must reach the cross-cell neighbor")
  }
}
