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

  /** Run `body` and afterwards free every RDD it left pinned in the block
    * manager. `Dataset.unpersist` does NOT release `localCheckpoint`
    * blocks (it only uncaches CacheManager entries, and a checkpointed
    * frame was never in the CacheManager), so iterative code that
    * truncates lineage via localCheckpoint strands one block set per
    * round until GC + ContextCleaner get around to it — in a long-lived
    * serving session that is unbounded block-manager growth. Diffing
    * `getPersistentRDDs` around the computation and unpersisting the
    * difference frees them deterministically (asserted in ComponentsSpec).
    */
  private def freeingCheckpoints[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally {
      val after = spark.sparkContext.getPersistentRDDs
      after.foreach { case (id, rdd) => if (!before.contains(id)) rdd.unpersist(blocking = false) }
    }
  }

  /** Build-if-absent the component map as a standing parquet artifact and
    * return the read — the form the catalog serves. The iteration's
    * checkpoints (including the final round's, which the in-memory form
    * must keep alive) are all freed once the write lands, so repeated
    * invocations leave the block manager exactly as they found it.
    */
  def ensureComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      path: String,
      maxIter: Int = 20
  ): DataFrame = {
    val spark = edges.sparkSession
    if (!graft.sources.StandingArtifact.exists(spark, path))
      freeingCheckpoints(spark) {
        connectedComponents(edges, aCol, bCol, maxIter)
          .write.mode("overwrite").parquet(path)
        graft.sources.RelationCache.invalidate(path)
      }
    graft.sources.RelationCache.parquet(spark, path)
  }

  /** (node, component) for every node that appears in `edges`; the
    * component id is the minimum node id of the component. Deterministic
    * regardless of partitioning (min is order-free).
    *
    * The returned frame is backed by the final round's localCheckpoint —
    * lineage is truncated, so the blocks must stay alive for as long as
    * the caller uses it. One-shot callers should prefer
    * [[ensureComponents]], which persists the result and frees every
    * checkpoint.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20
  ): DataFrame = {
    val spark = edges.sparkSession
    // localCheckpoint + tracked block ids: Dataset.unpersist can't free a
    // checkpointed frame's blocks (no CacheManager entry), so each round
    // records the RDD ids its checkpoint pinned and frees the superseded
    // round's ids explicitly.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, spark.sparkContext.getPersistentRDDs.keySet.toSet.diff(before))
    }
    def free(ids: Set[Int]): Unit = {
      val live = spark.sparkContext.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }
    val (sym, symIds) = checkpointTracked(
      edges.select(col(aCol).as("u"), col(bCol).as("v"))
        .union(edges.select(col(bCol).as("u"), col(aCol).as("v"))))
    // Fused round 1: min(u, min over direct neighbors) straight off the
    // symmetric edge list — the same single shuffle the plain distinct()
    // init would cost, but it already settles diameter-1 components
    // (near-dup clusters are cliques: every pair similar → all edges
    // present), so those exit the loop after one confirming round.
    var (labels, labelIds) = checkpointTracked(
      sym.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("comp")))
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
      val (next, nextIds) = checkpointTracked(
        labels.union(viaNeighbor)
          .groupBy(col("u")).agg(min(col("comp")).as("comp")))
      val nextSum = labelSum(next)
      // superseded round's blocks are dead weight in the block manager —
      // a long-lived session (serving, repeated maintenance runs) would
      // accumulate them across invocations
      free(labelIds)
      labels = next
      labelIds = nextIds
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    free(symIds)
    labels
  }
}
