package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
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
  * and a local checkpoint truncates the growing lineage so round N+1's
  * plan doesn't replay rounds 1..N.
  *
  * Checkpoint lifecycle: `Dataset.unpersist` cannot free a
  * localCheckpoint'd frame's blocks (they were never in the
  * CacheManager), so each round checkpoints through an EXPLICIT
  * `RDD[InternalRow]` and frees the superseded round's RDD directly.
  * Tracking the exact RDD — not a diff of the global persistent-RDD map —
  * keeps a concurrent serving thread's pinned blocks untouched (a global
  * diff would unpersist them, and for checkpointed RDDs that is an
  * unrecoverable block-not-found failure, not a recompute).
  *
  * (For graphs with genuinely long chains, alternate large-star/
  * small-star halves the diameter per round; near-dup graphs don't need
  * it and the simple form keeps every round AQE-optimizable.)
  */
object Components {

  /** Build-if-absent the component map as a standing parquet artifact and
    * return the read — the form the catalog serves. `edges` is BY NAME:
    * the warm path (artifact present) never forces it, so callers may
    * hand an edge frame whose very construction is expensive (e.g. the
    * semdedup pair graph runs centroid-seeding driver jobs just to build
    * the DataFrame — measured 13 → 40+ q/s under load once deferred).
    * The iteration's checkpoints (including the final round's, which the
    * in-memory form must keep alive) are all freed once the write lands,
    * so repeated invocations leave the block manager exactly as they
    * found it (asserted in ComponentsSpec). Build concurrency and
    * partial-write atomicity are [[graft.sources.StandingArtifact.ensureWith]]'s.
    */
  def ensureComponents(
      spark: org.apache.spark.sql.SparkSession,
      edges: => DataFrame,
      aCol: String,
      bCol: String,
      path: String,
      maxIter: Int = 20
  ): DataFrame =
    graft.sources.StandingArtifact.ensureWith(spark, path) { tmp =>
      val (labels, pinned) = connectedComponentsTracked(edges, aCol, bCol, maxIter)
      try labels.write.mode("overwrite").parquet(tmp)
      finally pinned.foreach(_.unpersist(blocking = false))
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
  ): DataFrame = connectedComponentsTracked(edges, aCol, bCol, maxIter)._1

  /** Core iteration; returns the converged labels plus the RDDs still
    * pinned on its behalf (the final round's checkpoint, which backs the
    * returned frame).
    */
  private def connectedComponentsTracked(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int
  ): (DataFrame, Seq[RDD[_]]) = {
    val spark = edges.sparkSession
    // Eager local checkpoint through an explicit RDD: same mechanics as
    // Dataset.localCheckpoint (copy the unsafe rows, persist, materialize,
    // rebuild a frame over the stored rows) but the pinned RDD is OURS to
    // free deterministically.
    // every RDD this build currently pins; a failure anywhere mid-build
    // unpersists ALL of them (see the finally below) — without it, one
    // thrown job strands checkpoint blocks in the block manager for the
    // session's lifetime, and repeated transient failures accumulate
    val live = scala.collection.mutable.Set.empty[RDD[InternalRow]]
    def checkpointTracked(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
      val rdd = df.queryExecution.toRdd.map(_.copy())
      rdd.localCheckpoint()
      live += rdd // BEFORE count: a failed materialization may have
      rdd.count() // cached some partitions already — they must release too
      (GraftColumnBridge.internalDataFrame(spark, rdd, df.schema), rdd)
    }
    def release(rdd: RDD[InternalRow]): Unit = {
      rdd.unpersist(blocking = false)
      live -= rdd
    }
    var ok = false
    try {
      val (sym, symRdd) = checkpointTracked(
        edges.select(col(aCol).as("u"), col(bCol).as("v"))
          .union(edges.select(col(bCol).as("u"), col(aCol).as("v"))))
      // Fused round 1: min(u, min over direct neighbors) straight off the
      // symmetric edge list — the same single shuffle the plain distinct()
      // init would cost, but it already settles diameter-1 components
      // (near-dup clusters are cliques: every pair similar → all edges
      // present), so those exit the loop after one confirming round.
      var (labels, labelsRdd) = checkpointTracked(
        sym.groupBy(col("u"))
          .agg(least(col("u"), min(col("v"))).as("comp")))
      // Labels only ever decrease, so the label sum is a strict convergence
      // witness: unchanged sum == fixpoint. One tiny agg job per round
      // instead of a join-back against the previous round. Coalesce: an
      // empty edge set (zero near-dup pairs) sums to NULL, not 0.
      def labelSum(df: DataFrame): Long =
        df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
      var prevSum = labelSum(labels)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val viaNeighbor = sym
          .join(labels.select(col("u").as("v"), col("comp")), Seq("v"))
          .select(col("u"), col("comp"))
        val (next, nextRdd) = checkpointTracked(
          labels.union(viaNeighbor)
            .groupBy(col("u")).agg(min(col("comp")).as("comp")))
        val nextSum = labelSum(next)
        // superseded round's blocks are dead weight in the block manager —
        // a long-lived session (serving, repeated maintenance runs) would
        // accumulate them across invocations
        release(labelsRdd)
        labels = next
        labelsRdd = nextRdd
        converged = nextSum == prevSum
        prevSum = nextSum
        i += 1
      }
      // hitting maxIter mid-propagation would return (and the ensure
      // wrapper would PERSIST) labels that split one real component into
      // several, each with its own "keeper" — silently wrong dedup output
      // forever. Min-label propagation needs O(component diameter)
      // rounds; near-dup clusters are near-cliques (diameter ~1-2), so a
      // non-converged run signals pathological input or a too-small
      // maxIter — fail LOUD and let the caller raise it.
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds — " +
            "component diameter exceeds the iteration budget; raise maxIter")
      release(symRdd)
      ok = true
      (labels, Seq(labelsRdd)) // labelsRdd stays pinned — the caller owns it
    } finally {
      // failure path only: the success path released everything except
      // the returned round, which must stay pinned for the caller.
      // Blocking: the failure path is rare and the caller (or a retry)
      // deserves a block manager that is ALREADY clean, not eventually.
      if (!ok) live.foreach(_.unpersist(blocking = true))
    }
  }
}
