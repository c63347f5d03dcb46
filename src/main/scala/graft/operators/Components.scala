package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the step that
  * turns near-duplicate PAIRS into dedup DECISIONS (one canonical
  * member per fuzzy-duplicate cluster).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round every vertex takes the minimum of
  * its own label and its neighbors' labels; convergence when no label
  * changes. Labels converge to the minimum vertex id of each component,
  * which doubles as a deterministic canonical id.
  *
  * Scale shape: each round is one keyed shuffle (join on dst + groupBy
  * src) over the EDGE list — never the corpus; rounds = graph diameter.
  * Near-dup graphs are overwhelmingly tiny cliques (diameter ≤ ~3), so
  * this runs a handful of rounds regardless of corpus size. Lineage is
  * truncated per round (localCheckpoint) so the plan cannot grow with
  * the iteration count. Driver state is one Boolean per round.
  */
object Components {

  /** `pairs` must carry two id columns; returns (id, component) for
    * every vertex that appears in at least one pair, with `component` =
    * min id of its connected component. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val allEdges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    // the pair graph is orders of magnitude smaller than the corpus it
    // came from; right-size the iteration partitioning to the EDGE
    // count (one partition per ~100k edges) so each round costs work
    // proportional to the graph, not the session's shuffle width
    val parts = math.max(1, (allEdges.count() / 100000L).toInt)
    val edges = allEdges.repartition(parts, col("dst")).localCheckpoint(true)

    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)

    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("ncomp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("ncomp").as("ncomp"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
        .localCheckpoint(true)
      converged = updated
        .join(labels.select(col("id"), col("component").as("prev")), Seq("id"))
        .filter(col("component") =!= col("prev"))
        .isEmpty
      labels = updated
    }
    labels
  }
}
