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
    pairsWithin(base, dim, threshold)
  }

  /** Exact-cosine pair verification within shared `cluster` values over a
    * prepared (id, v, nrm, cluster) frame.
    *
    * Equi-join on the cluster key (hash-partitioned, cluster-quadratic
    * only); the cheap id-ordering clause prunes half the pairs BEFORE the
    * dot-product kernel runs, then the cosine is materialized ONCE as a
    * column — structurally a single kernel evaluation per surviving pair,
    * instead of leaving filter/agg copies for optimizer CSE to merge.
    * The final aggregate dedups pairs that co-bucket in more than one
    * cell (the cosine is identical on every copy).
    */
  private def pairsWithin(base: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val a = base.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"), col("cluster"))
    val b = base.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"), col("cluster"))
    val cosine =
      when(col("a_n") * col("b_n") === 0, lit(0.0))
        .otherwise(Similarity.dotFixed(col("a_v"), col("b_v"), dim) / (col("a_n") * col("b_n")))
    a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("cos")).as("cosine"))
  }

  /** Depth cap for recursive cell splitting. Labels are path-encoded in a
    * Long base (k+1): depth-d labels occupy [(k+1)^(d-1), (k+1)^d), so
    * terminated cells from different depths can never collide; k=16 at
    * depth 14 stays under Long.MaxValue. The cap also terminates the one
    * unsplittable case — more than maxCell IDENTICAL vectors all argmax to
    * the same child forever (run exact dedup first; such a cell is
    * trivially all-pairs anyway).
    */
  private val MaxSplitDepth = 12

  /** Recursively split every cluster larger than `maxCell` with a k-way
    * argmax-dot partition around seeds sampled INSIDE the cluster
    * (deterministic: first k rows in xxhash64(id) order, unit-normalized).
    * With `softP` > 1 each member lands in its softP nearest child cells —
    * the same soft-assignment recall rescue the coarse level uses, pushed
    * down every split (a borderline pair straddling a child boundary still
    * co-buckets). Membership multiplies by ≤ softP per level, so soft
    * splitting is for pair generation (bounded depth); use softP=1 for a
    * partition (one label per id).
    *
    * Scale shape per level: one count aggregate (shuffle of (label, 1)
    * partials), one windowed seed sample over the still-oversized rows
    * only, one map-only relabel of those rows (broadcast seed map — at
    * most n/maxCell live oversized labels × k × dim floats on the driver,
    * e.g. 10^10 docs at maxCell 10^5 → 400 MB; beyond that, seeds would
    * move to a join). Levels ≈ log_k(n/maxCell), so total work is
    * O(n log(n/maxCell)) — the linear path the √n-cell form lacks.
    * Each level persists its frame and unpersists the previous one; all
    * caching is dropped before returning (callers get a plain lineage —
    * ≤ MaxSplitDepth map-only projections — with no pinned blocks).
    */
  private def splitOversized(
      start: DataFrame, maxCell: Int, k: Int, softP: Int = 1,
      maxDepth: Int = MaxSplitDepth
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2 to make progress, got $k")
    require(softP >= 1 && softP <= k, s"softP must be in [1, k], got $softP")
    val spark = start.sparkSession
    var cur = start
    var pinned: Option[DataFrame] = None
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      val oversized = cur.groupBy(col("cluster")).count()
        .filter(col("count") > maxCell)
        .select(col("cluster")).collect().map(_.getLong(0))
      if (oversized.isEmpty) done = true
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(xxhash64(col("id")), col("id"))
        val seeds: Map[Long, Array[Array[Float]]] = cur
          .filter(col("cluster").isin(oversized: _*))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("cluster"), col("v"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (label, rows) =>
            label -> rows.map { r =>
              val c = r.getSeq[Float](1)
              val n = math.sqrt(c.iterator.map(x => x.toDouble * x.toDouble).sum)
              (if (n == 0) c.map(_.toDouble) else c.map(_ / n)).map(_.toFloat).toArray
            }
          }
        val bc = spark.sparkContext.broadcast(seeds)
        val kk = k
        val sp = softP
        // top-softP child cells by dot, ties to the HIGHER seed index —
        // the same ordering as Ivf.cellOf/topCells
        val splitLabels = udf { (label: Long, v: scala.collection.Seq[Float]) =>
          val ss = bc.value(label)
          val dots = Array.tabulate(ss.length) { i =>
            val p = ss(i)
            var d = 0.0
            var j = 0
            val n = math.min(v.length, p.length)
            while (j < n) { d += v(j).toDouble * p(j).toDouble; j += 1 }
            d
          }
          (0 until ss.length).sortBy(i => (-dots(i), -i)).take(sp)
            .map(best => label * (kk + 1) + 1 + best)
        }
        val next = cur.withColumn("cluster",
          explode(when(col("cluster").isin(oversized: _*),
              splitLabels(col("cluster"), col("v")))
            .otherwise(array(col("cluster"))))).persist()
        next.count()
        pinned.foreach(_.unpersist(false))
        pinned = Some(next)
        cur = next
      }
      depth += 1
    }
    pinned.foreach(_.unpersist(false))
    cur
  }

  /** Fixed-cluster-size assignment: (id, cluster) where every cluster
    * holds at most `maxCell` vectors (identical-vector groups excepted —
    * see [[MaxSplitDepth]]). The SemDeDup paper's actual recipe: cluster
    * count scales with the corpus while cluster SIZE stays constant, so
    * within-cluster work is O(n·maxCell), not O(n^1.5).
    */
  def assignFixedSize(
      embeddings: DataFrame,
      maxCell: Int,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = Ivf.centroids(embeddings, k, idCol, vecCol)
    val start = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      (Ivf.cellOf(col(vecCol), cents).cast("long") + 1).as("cluster"))
    splitOversized(start, maxCell, k).select(col("id").as(idCol), col("cluster"))
  }

  /** Linear-path SemDeDup: soft top-p coarse assignment (recall rescue,
    * as in [[semdedupPairsWith]]), then recursive SOFT splitting of every
    * oversized cell to ≤ `maxCell` members (top-p child cells per member —
    * hard splits measurably cost recall on borderline pairs: 0.64 vs 1.0
    * at τ=0.45 on the sf0.01 testdata), then exact cosine verification
    * within leaf cells only. Verification work is O(n·maxCell·p^depth)
    * with depth ≈ log_k(n/maxCell) — near-linear in n for fixed maxCell,
    * vs the √n-cell [[semdedupPairs]]'s O(n^1.5); the p^depth membership
    * factor is the price of holding recall through the split tree and is
    * the tunable recall/cost knob. Recall vs the exact twin is re-bounded
    * (not assumed) in ClusteringSpec.
    */
  def semdedupPairsFixed(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.45,
      maxCell: Int = 512,
      k: Int = 16,
      iterations: Int = 2,
      p: Int = 2,
      softP: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = centroids(embeddings, k, iterations, idCol, vecCol)
    val soft = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normFixed(col(vecCol), dim).as("nrm"),
        explode(Ivf.topCells(col(vecCol), cents, p)).as("cell0"))
      .withColumn("cluster", col("cell0").cast("long") + 1)
      .drop("cell0")
    pairsWithin(splitOversized(soft, maxCell, k, softP = softP), dim, threshold)
  }
}
