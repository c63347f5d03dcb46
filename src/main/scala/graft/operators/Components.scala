package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the step that
  * turns near-duplicate PAIRS into dedup DECISIONS (one canonical
  * member per fuzzy-duplicate cluster).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14).
  * Each round rewrites the edge list so nodes point at ever-smaller
  * labels; a fixed point is a union of stars, each centered on its
  * component's minimum id — which doubles as a deterministic canonical
  * id. Convergence takes O(log n) rounds on ANY graph shape, where the
  * previous min-label-propagation rendition was O(diameter) — fine for
  * clique-shaped dup clusters, quadratic disaster on the chain-shaped
  * clusters web boilerplate produces (a 10k-long drift chain is 10k
  * rounds of propagation but ~25 star rounds; asserted in
  * ComponentsSpec).
  *
  * Scale shape: each round is two keyed shuffles over the EDGE list —
  * never the corpus. Lineage is truncated per round (localCheckpoint)
  * so the plan cannot grow with the iteration count; driver state is
  * one (count, isEmpty) check per round.
  */
object Components {

  /** `pairs` must carry two id columns; returns (id, component) for
    * every vertex that appears in at least one pair, with `component` =
    * min id of its connected component. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol)._1

  /** [[connectedComponents]] plus the number of star rounds run —
    * exposed so tests can assert the O(log n) bound. */
  def connectedComponentsWithRounds(pairs: DataFrame, aCol: String = "a_id",
                                    bCol: String = "b_id"): (DataFrame, Int) = {
    // ONE upstream evaluation: `pairs` is usually the output of a whole
    // near-dup pipeline (shingle → LSH → verify); materialize it once
    // and derive vertices/edges lazily from the checkpoint. (Round 4
    // checkpointed vertices AND the oriented edges separately — two
    // full evaluations of the upstream pipeline, which doubled
    // emb_dedup_near/doc_dedup_near wall time.)
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint(true)

    val vertices = p.select(col("a").as("id"))
      .unionByName(p.select(col("b").as("id")))
      .distinct()

    // canonical (big > small) orientation; self-pairs carry no
    // connectivity (their vertices resurface via the final vertex join)
    val initial = p
      .select(greatest(col("a"), col("b")).as("big"), least(col("a"), col("b")).as("small"))
      .filter(col("big") =!= col("small"))
      .distinct()

    // the pair graph is orders of magnitude smaller than the corpus it
    // came from. Checkpoint the oriented edge list ONCE and count the
    // cached blocks: the previous shape counted the un-checkpointed
    // distinct and then repartitioned it into a keyed exchange before
    // checkpointing — TWO full evaluations of the distinct plus one
    // shuffle whose partitioning no round reused (every round's
    // groupBys shuffle on their own keys, and AQE coalescing already
    // right-sizes those to the edge count — guide §2.4: remove
    // exchanges nothing downstream consumes).
    var edges = initial.localCheckpoint(true)
    var edgeCount = edges.count()
    var rounds = 0
    var converged = edgeCount == 0L
    while (!converged) {
      rounds += 1
      // Neighborhood minima are PARTIAL-AGGREGATING groupBys, not
      // window functions: a window partition buffers a node's whole
      // neighborhood in one task, and the minimum node of a web-scale
      // dup component has component-sized degree — the hub would become
      // a single-task spill. groupBy(min) combines map-side, skew-free.
      // large-star: every node u links each LARGER neighbor to
      // m(u) = min(N(u) ∪ {u})
      val adj = edges.select(col("big").as("u"), col("small").as("v"))
        .unionByName(edges.select(col("small").as("u"), col("big").as("v")))
      val m = adj.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // NOT checkpointed: both small-star branches consume the same
      // plan object, so the round's single action reuses the distinct's
      // Exchange (ReusedExchange) — one evaluation, no extra job. The
      // inputs (`edges`) are already checkpointed, so lineage stays flat.
      val large = adj.filter(col("v") > col("u"))
        .join(m, Seq("u"))
        .select(col("v").as("big"), col("m").as("small"))
        .distinct()
      // small-star: every node links its smaller neighbors (and itself)
      // to their collective minimum
      val mins = large.groupBy("big").agg(min(col("small")).as("m"))
      val next = large.join(mins, Seq("big"))
        .filter(col("small") =!= col("m"))
        .select(col("small").as("big"), col("m").as("small"))
        .unionByName(mins.select(col("big"), col("m").as("small")))
        .distinct() // AQE right-sizes these shuffles; no per-round repartition
        .localCheckpoint(true)
      val nextCount = next.count()
      // fixed point = identical edge set (count equal + no new edges):
      // the alternation's fixed points are exactly unions of min-rooted
      // stars, and its potential function strictly decreases until one
      // is reached, so this terminates
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("big", "small"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
    }

    // at the fixed point every edge is (member, componentMin)
    val starLabels = edges.select(col("big").as("id"), col("small").as("component"))
      .unionByName(edges.select(col("small").as("id"), col("small").as("component")))
      .groupBy("id").agg(min("component").as("component"))
    val labels = vertices.join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    (labels, rounds)
  }
}
