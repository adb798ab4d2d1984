package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Baseline: brute-force cosine top-k — a single codegen'd projection over
  * the embeddings scan (`aggregate`/`zip_with` dot products, no UDF) plus a
  * global top-k (`orderBy.limit`, which Spark executes as per-partition
  * top-k + driver merge — no full sort, no shuffle of the vectors).
  *
  * Scale path: LSH-bucketed ANN — random-hyperplane signatures prune the
  * scan to matching buckets before the exact re-rank, turning a 100 TB
  * full scan into a bucket-pruned one. An IVF variant would replace the
  * random planes with k-means centroids; the plumbing is identical
  * (assign → co-partition by cell → local exact search).
  */
object Similarity {

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

  /** Brute-force top-k neighbours of `query` (a constant vector) over an
    * embeddings frame. The query vector is a literal folded into codegen —
    * no join, no broadcast needed for the single-query case.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      query: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    embeddings
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch top-k: neighbours for every query row. Broadcast the (small)
    * query set against the big corpus, then per-query top-k via window
    * row_number — the standard "broadcast probes, rank per key" kNN-join.
    */
  def topKJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.alias("c")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))))
      .filter(col("query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("neighbor_id"),
        cosine(col(s"c.$vecCol"), col("qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: `planes` fixed pseudo-random vectors
    * (seeded, dimension `dim`); bit i = sign(v · plane_i). Pure column
    * algebra, deterministic across runs.
    */
  def lshSignature(vec: Column, dim: Int, bits: Int = 16, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rng.nextGaussian())
    val bitCols: Seq[Column] = planes.zipWithIndex.toSeq.map { case (p, i) =>
      val plane = array(p.map(lit).toSeq: _*)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed ANN: candidates share the query's bucket (or differ in
    * at most `probeBits` of the signature via multi-probe on the query
    * side), exact cosine re-rank inside. Falls back to fewer results when
    * the bucket is sparse — standard recall/latency trade.
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
    val q = array(query.map(v => lit(v)): _*)
    val qSigRow = embeddings.sparkSession.range(1)
      .select(lshSignature(q, dim, bits).as("sig")).collect()(0)
    val qSig = qSigRow.getLong(0)
    // multi-probe: query bucket plus all buckets within `probeBits` flips
    val probes = (0 until bits).combinations(probeBits).map(_.foldLeft(qSig)((s, b) => s ^ (1L << b))).toSeq :+ qSig
    embeddings
      .withColumn("sig", lshSignature(col(vecCol), dim, bits))
      .filter(col("sig").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
