package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * formation step a dedup pipeline runs AFTER pair generation: near-dup
  * pairs become clusters, and one keeper (the min id) survives per
  * cluster.
  *
  * Iterative min-label propagation: every node starts as its own label;
  * each round a node adopts the minimum label among itself and its
  * neighbors. Converges in O(component diameter) rounds — near-dup
  * clusters are dense and shallow (a dup cluster's diameter is ~2), so
  * 3-4 rounds settle real corpora; `maxIter` bounds the pathological
  * chain. Each round is one equi-join + one min-aggregate, both on the
  * node key — at scale the same hash partitioning serves every round,
  * and `localCheckpoint` truncates the growing lineage so round N+1's
  * plan doesn't replay rounds 1..N.
  *
  * (For graphs with genuinely long chains, alternate large-star/
  * small-star halves the diameter per round; near-dup graphs don't need
  * it and the simple form keeps every round AQE-optimizable.)
  */
object Components {

  /** (node, component) for every node that appears in `edges`; the
    * component id is the minimum node id of the component. Deterministic
    * regardless of partitioning (min is order-free).
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20
  ): DataFrame = {
    val sym = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint()
    // Fused round 1: min(u, min over direct neighbors) straight off the
    // symmetric edge list — the same single shuffle the plain distinct()
    // init would cost, but it already settles diameter-1 components
    // (near-dup clusters are cliques: every pair similar → all edges
    // present), so those exit the loop after one confirming round.
    var labels = sym.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("comp"))
      .localCheckpoint()
    // Labels only ever decrease, so the label sum is a strict convergence
    // witness: unchanged sum == fixpoint. One tiny agg job per round
    // instead of a join-back against the previous round.
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("comp"))).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = sym
        .join(labels.select(col("u").as("v"), col("comp")), Seq("v"))
        .select(col("u"), col("comp"))
      val next = labels.union(viaNeighbor)
        .groupBy(col("u")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      // superseded round's blocks are dead weight in the block manager —
      // a long-lived session (serving, repeated maintenance runs) would
      // accumulate them across invocations
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
