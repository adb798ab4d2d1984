package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Baseline: brute-force cosine top-k — a single codegen'd projection over
  * the embeddings scan plus a global top-k (`orderBy.limit`, which Spark
  * executes as per-partition top-k + driver merge — no full sort, no
  * shuffle of the vectors).
  *
  * All hot-path arithmetic uses FIXED-DIMENSION folds of `element_at`
  * products: Spark's array higher-order functions (`aggregate`/`zip_with`)
  * run interpreted, while an unrolled scalar fold stays inside whole-stage
  * codegen. The fold is left-associated in ascending index order, so
  * results are bit-identical to an index-ordered sequential sum (and to
  * the HOF forms kept for dynamic-dimension callers).
  *
  * Scale path: LSH-bucketed ANN — random-hyperplane signatures prune the
  * scan to matching buckets before the exact re-rank. An IVF variant would
  * replace the random planes with k-means centroids; the plumbing is
  * identical (assign → co-partition by cell → local exact search).
  */
object Similarity {

  /** Bring a narrow input up to session parallelism — the sf-scale parquet
    * arrives in 1-4 splits, single-threading compute-dense per-row kernels.
    * A frame already at or above session width keeps its layout:
    * re-shuffling 100 TB to "parallelize" it would BE the bottleneck.
    *
    * Width = the STATIC `spark.sql.shuffle.partitions` (the core count),
    * not `numShufflePartitions`: under the r17 AQE posture the latter
    * reports `initialPartitionNum` (8× cores), and an explicit
    * REPARTITION_BY_NUM at that width is exempt from AQE coalescing —
    * the 8× headroom exists to be coalesced DOWN, never to pin 8 fixed
    * tasks per core onto a compute-dense kernel (measured r17: 256
    * one-ms tasks per stage across the discovery loop at sf0.1).
    */
  private[vector] def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val parts = df.sparkSession.sessionState.conf.defaultNumShufflePartitions
    if (df.rdd.getNumPartitions >= parts) df else df.repartition(parts)
  }

  // ---- dynamic-dimension (interpreted HOF) forms ----

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity of two float-array columns (0 when either is zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  // ---- native-kernel codegen'd forms ----
  // One static call per dot/norm (graft.vector.expressions): tiny generated
  // code regardless of dimension — an unrolled element_at fold blows the
  // JVM method limit inside join predicates past ~100 terms and silently
  // de-optimizes to interpreted evaluation.

  /** Codegen'd dot product (dim kept for API clarity; kernel loops). */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    graft.vector.expressions.VectorExpressions.vecDot(a, b)

  /** Codegen'd dot product against a constant query vector. */
  def dotLit(vec: Column, q: Seq[Float]): Column =
    graft.vector.expressions.VectorExpressions.vecDot(vec, typedlit(q.toArray))

  /** Codegen'd L2 norm. */
  def normFixed(a: Column, dim: Int): Column =
    graft.vector.expressions.VectorExpressions.vecNorm(a)

  /** Driver-side norm of a constant vector, same op order as [[normFixed]]. */
  def normLit(q: Seq[Float]): Double =
    math.sqrt(q.map(v => v.toDouble * v.toDouble).reduce(_ + _))

  /** Codegen'd cosine against a constant query vector. */
  def cosineLit(vec: Column, q: Seq[Float]): Column = {
    val nn = normFixed(vec, q.length) * lit(normLit(q))
    when(nn === 0, lit(0.0)).otherwise(dotLit(vec, q) / nn)
  }

  /** Codegen'd cosine of two vector columns of a known dimension. */
  def cosineFixed(a: Column, b: Column, dim: Int): Column = {
    val nn = normFixed(a, dim) * normFixed(b, dim)
    when(nn === 0, lit(0.0)).otherwise(dotFixed(a, b, dim) / nn)
  }

  /** Brute-force top-k neighbours of `query` (a constant vector) over an
    * embeddings frame. The query vector folds into codegen as literals —
    * no join, no broadcast needed for the single-query case.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      query: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    embeddings
      .select(col(idCol), cosineLit(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** Batch top-k: neighbours for every query row. Broadcast the (small)
    * query set against the big corpus, then per-query top-k via window
    * row_number — the standard "broadcast probes, rank per key" kNN-join.
    * Pass `dim` to use the codegen'd fixed-dimension kernel.
    */
  def topKJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = -1
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sim =
      if (dim > 0) cosineFixed(col(s"c.$vecCol"), col("qv"), dim)
      else cosine(col(s"c.$vecCol"), col("qv"))
    val joined = corpus.alias("c")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))))
      .filter(col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"), sim.as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The seeded random hyperplanes shared by the column and driver-side
    * signature paths (float weights so both sides multiply identically).
    */
  private def planes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits, dim)(rng.nextGaussian().toFloat)
  }

  /** The hyperplane family as exact float literals — the replay oracle
    * needs the weights spelled out (a Java RNG cannot be re-seeded in
    * SQL); bucket membership then reduces to sign-of-ordered-SUM.
    */
  def lshPlanes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] =
    planes(dim, bits, seed)

  /** Random-hyperplane LSH signature: bit i = sign(v · plane_i), one
    * native-kernel dot per plane.
    */
  def lshSignature(vec: Column, dim: Int, bits: Int = 16, seed: Long = 42L): Column = {
    val ps = planes(dim, bits, seed)
    val bitCols: Seq[Column] = ps.zipWithIndex.toSeq.map { case (p, i) =>
      val d = graft.vector.expressions.VectorExpressions.vecDot(vec, typedlit(p))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Driver-side signature of a constant vector — same op order as
    * [[lshSignature]], so buckets agree bit-for-bit.
    */
  def lshSignatureLocal(q: Seq[Float], bits: Int = 16, seed: Long = 42L): Long = {
    val ps = planes(q.length, bits, seed)
    ps.zipWithIndex.map { case (p, i) =>
      var d = 0.0
      var j = 0
      val n = math.min(q.length, p.length)
      while (j < n) { d += q(j).toDouble * p(j).toDouble; j += 1 }
      if (d >= 0) 1L << i else 0L
    }.sum
  }

  /** All buckets within `probeBits` bit flips of `sig` (inclusive of the
    * exact bucket and every intermediate flip count — flipping exactly
    * probeBits bits alone would skip the 1-flip buckets and silently lose
    * recall).
    */
  def probeBuckets(sig: Long, bits: Int, probeBits: Int): Seq[Long] =
    sig +: (1 to probeBits).flatMap(b =>
      (0 until bits).combinations(b).map(_.foldLeft(sig)((s, i) => s ^ (1L << i))))

  /** Margin-aware multi-probe bucket sequence (Lv et al. 2007 style): a
    * true neighbour's signature differs from the query's mostly on planes
    * where the query sits near the boundary (small |q·plane| margin), so
    * probing flip-sets in increasing total margin concentrates recall in
    * far fewer buckets than a blind hamming ball. Flip-sets are enumerated
    * best-first with the standard heap expansion (extend-with-next /
    * shift-to-next over margin-sorted planes), yielding the `maxProbes`
    * most probable buckets in O(maxProbes log maxProbes).
    */
  def marginProbeBuckets(
      q: Seq[Float],
      bits: Int,
      seed: Long = 42L,
      maxProbes: Int = 48
  ): Seq[Long] = {
    val ps = planes(q.length, bits, seed)
    val qSig = lshSignatureLocal(q, bits, seed)
    val margins = ps.zipWithIndex.map { case (p, i) =>
      var d = 0.0
      var j = 0
      while (j < q.length) { d += q(j).toDouble * p(j).toDouble; j += 1 }
      (math.abs(d), i)
    }.sortBy(_._1)
    def flip(set: Vector[Int]): Long =
      set.foldLeft(qSig)((s, r) => s ^ (1L << margins(r)._2))
    val cost = margins.map(_._1)
    implicit val ord: Ordering[(Double, Vector[Int])] =
      Ordering.by[(Double, Vector[Int]), Double](_._1).reverse
    val pq = scala.collection.mutable.PriorityQueue[(Double, Vector[Int])]()
    val out = scala.collection.mutable.ListBuffer(qSig)
    if (bits > 0) pq.enqueue((cost(0), Vector(0)))
    while (out.size < maxProbes && pq.nonEmpty) {
      val (c, set) = pq.dequeue()
      out += flip(set)
      val j = set.last
      if (j + 1 < bits) {
        pq.enqueue((c + cost(j + 1), set :+ (j + 1)))
        pq.enqueue((c - cost(j) + cost(j + 1), set.init :+ (j + 1)))
      }
    }
    out.toSeq
  }

  /** LSH-bucketed ANN: candidates share the query's bucket (or differ in
    * at most `probeBits` signature bits via multi-probe on the query side),
    * exact cosine re-rank inside. Falls back to fewer results when the
    * bucket is sparse — standard recall/latency trade.
    */
  def lshTopK(
      embeddings: DataFrame,
      query: Seq[Float],
      k: Int,
      bits: Int = 16,
      probeBits: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val dim = query.length
    val qSig = lshSignatureLocal(query, bits)
    val probes = probeBuckets(qSig, bits, probeBits)
    embeddings
      .withColumn("sig", lshSignature(col(vecCol), dim, bits))
      .filter(col("sig").isin(probes: _*))
      .select(col(idCol), cosineLit(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
