package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding compression / summarization operators for training-data
  * pipelines: int8 scalar quantization (the storage/serving form of a
  * vector corpus) and per-group centroids (the summarization primitive
  * under cluster-balancing and semantic-dedup decisions).
  *
  * Numeric discipline (both ops are DuckDB-oracled): every arithmetic
  * step is IEEE-double deterministic — float→double casts are exact,
  * per-vector max is order-independent, `floor` is exact — and the one
  * order-SENSITIVE step (the centroid's double sum) is computed as an
  * explicit ascending-id sequential fold on both engines, the repo's
  * standard oracle-parity recipe for float reductions.
  */
object Quantize {

  /** Symmetric int8 scalar quantization, row form: (vec_id, dim_i, q)
    * with q = floor(v * 127 / max|v|) ∈ [-128, 127] (floor, not round:
    * round's half-way tie rule differs across engines; floor is exact).
    *
    * Shape: posexplode + a per-vector window max — the window partitions
    * by vector id, so the single exchange is the unavoidable hash
    * partition by id and every partition holds whole (64-element)
    * vectors. Zero vectors quantize to all-zero.
    */
  def int8Rows(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val ex = embeddings.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim_i", "v")))
    val mx = max(abs(col("v").cast("double"))).over(Window.partitionBy(col(idCol)))
    ex.withColumn("mx", mx)
      .select(col(idCol), col("dim_i").cast("long").as("dim_i"),
        when(col("mx") === 0, lit(0L))
          .otherwise(floor(col("v").cast("double") * (lit(127.0) / col("mx"))))
          .as("q"))
  }

  /** Per-label centroid, row form: (label, dim_i, centroid). The sum per
    * (label, dim) folds ascending by vec_id in double — bit-identical to
    * the oracle's `SUM(v ORDER BY vec_id)`; the scalable variant is a
    * plain `avg` (same value up to last-ulp reassociation).
    *
    * Shape: one shuffle keyed (label, dim_i); the collect_list holds one
    * double per corpus vector per group — for corpora where that bounds
    * badly, swap the fold for `avg` and accept ulp nondeterminism.
    */
  def labelCentroids(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"
  ): DataFrame =
    embeddings
      .select(col(labelCol), col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("dim_i", "v")))
      .groupBy(col(labelCol), col("dim_i"))
      .agg(collect_list(struct(col("_id"), col("v").cast("double").as("v"))).as("xs"),
        count(lit(1)).as("n"))
      .select(col(labelCol), col("dim_i").cast("long").as("dim_i"),
        (aggregate(array_sort(col("xs")), lit(0.0), (acc, x) => acc + x.getField("v"))
          / col("n")).as("centroid"))
}
