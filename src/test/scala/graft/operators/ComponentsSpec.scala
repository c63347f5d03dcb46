package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("a 10k-node chain resolves in O(log n) star rounds, all to component 0") {
    // the adversarial shape for label propagation: a path graph, where
    // propagation needs diameter (=10k) rounds; the star alternation
    // must stay logarithmic
    val chain = spark.range(10000).select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val (labels, rounds) = Components.connectedComponentsWithRounds(chain)
    assert(rounds <= 30, s"$rounds rounds on a 10k chain — not logarithmic")
    val agg = labels.agg(
      org.apache.spark.sql.functions.countDistinct($"component").as("c"),
      org.apache.spark.sql.functions.max($"component").as("m"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == 0L && agg.getLong(2) == 10001L,
      s"chain labels wrong: distinct=${agg.getLong(0)} max=${agg.getLong(1)} n=${agg.getLong(2)}")
  }

  test("star rounds converge to min-id components (chain, clique, isolated pair)") {
    // components: {1,2,3,4} (a chain — needs >1 round), {10,11,12} (a
    // clique), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("dedupNearMinhash keeps exactly one member per fuzzy cluster, untouched docs pass through") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // plant a 3-member fuzzy family of doc 0: the original + two
    // slightly-extended copies
    val fam = docs.filter($"doc_id" === 0)
    val planted = docs
      .unionByName(fam.select(($"doc_id" + 100000).as("doc_id"),
        org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit(" tail one")).as("text")))
      .unionByName(fam.select(($"doc_id" + 200000).as("doc_id"),
        org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit(" tail two")).as("text")))
    val kept = TextDedup.dedupNearMinhash(planted, jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(100000L) && !kept.contains(200000L),
      s"family not collapsed to its canonical: ${kept.filter(_ >= 100000)}")
    // corpus's own near-dup pairs (e.g. 474~498) collapse to the lower id
    assert(kept.contains(474L) && !kept.contains(498L))
  }
}
