package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering operators: spherical k-means assignment and
  * SemDeDup-style semantic deduplication (cluster first, then exact
  * cosine verification ONLY within clusters — Abbas et al. 2023's recipe
  * for making embedding dedup sub-quadratic).
  *
  * Scale shape: centroids are a tiny driver-held array (k × dim floats),
  * refined by Lloyd iterations that are each ONE scan with map-side
  * combined per-(cell, dim) partial means ([[Ivf.refineCentroids]]);
  * assignment is a codegen'd argmax-dot projection ([[Ivf.cellOf]] —
  * no shuffle); the SemDeDup pair join shuffles each vector ONCE on its
  * cluster key, and the quadratic cosine verification runs only inside
  * each cluster's partition (corpus-quadratic → cluster-quadratic).
  */
object Clustering {

  /** Refined centroid set: deterministic hash-ordered seed sample
    * ([[Ivf.centroids]]) + `iterations` spherical Lloyd steps.
    */
  def centroids(
      embeddings: DataFrame,
      k: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Array[Seq[Float]] =
    Ivf.refineCentroids(embeddings, Ivf.centroids(embeddings, k, idCol, vecCol),
      iterations, vecCol)

  /** K-means cluster assignment: (id, cluster). */
  def assign(
      embeddings: DataFrame,
      k: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    assignTo(embeddings, centroids(embeddings, k, iterations, idCol, vecCol), idCol, vecCol)

  /** Assignment against a precomputed centroid set. */
  def assignTo(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    embeddings.select(col(idCol), Ivf.cellOf(col(vecCol), cents).as("cluster"))

  /** Mean cosine of each vector to its assigned (unit-norm) centroid —
    * the spherical-k-means objective (higher is tighter). Driver-side
    * scalar, used by the convergence invariant test.
    */
  def meanAssignedCosine(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      dim: Int,
      vecCol: String = "embedding"
  ): Double = {
    val dots: Seq[Column] = cents.toIndexedSeq.map(c =>
      graft.vector.expressions.VectorExpressions.vecDot(col(vecCol), typedlit(c.toArray)))
    val nrm = Similarity.normFixed(col(vecCol), dim)
    embeddings
      .select((when(nrm === 0, lit(0.0))
        .otherwise(greatest(dots: _*) / nrm)).as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
  }

  /** SemDeDup: near-duplicate pairs (a_id < b_id, cosine ≥ τ) found by
    * exact cosine verification WITHIN k-means clusters only — each vector
    * soft-assigned to its `p` nearest cells (a pair co-buckets if ANY of
    * the p×p cell combinations overlap, rescuing near-threshold pairs
    * between two cells: measured recall 0.29 → 1.0 at p=2 on the
    * near-uniform testdata). Misses cross-cluster pairs by design —
    * recall against the all-pairs twin is bounded in ClusteringSpec;
    * precision is exact (every emitted pair is verified).
    */
  def semdedupPairs(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.45,
      k: Int = 16,
      iterations: Int = 2,
      p: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    semdedupPairsWith(embeddings, centroids(embeddings, k, iterations, idCol, vecCol),
      dim, threshold, p, idCol, vecCol)

  /** [[semdedupPairs]] against a precomputed centroid set — lets the
    * caller capture the exact centroid literals (the DuckDB oracle replays
    * the same soft assignment + within-cluster cosine against them).
    */
  def semdedupPairsWith(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      dim: Int,
      threshold: Double = 0.45,
      p: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // One scan: id, payload, norm, and the exploded top-p cells together.
    val base = embeddings.select(
        col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normFixed(col(vecCol), dim).as("nrm"),
        explode(Ivf.topCells(col(vecCol), cents, p)).as("cluster"))
    val a = base.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"), col("cluster"))
    val b = base.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"), col("cluster"))
    val cosine =
      when(col("a_n") * col("b_n") === 0, lit(0.0))
        .otherwise(Similarity.dotFixed(col("a_v"), col("b_v"), dim) / (col("a_n") * col("b_n")))
    // Equi-join on the cluster key (hash-partitioned, cluster-quadratic
    // only); the cheap id-ordering clause prunes half the pairs BEFORE the
    // dot-product kernel runs, then the cosine is materialized ONCE as a
    // column — structurally a single kernel evaluation per surviving pair,
    // instead of leaving filter/agg copies for optimizer CSE to merge.
    // The final aggregate dedups pairs that co-bucket in more than one
    // cell (the cosine is identical on every copy).
    a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("cos")).as("cosine"))
  }
}
