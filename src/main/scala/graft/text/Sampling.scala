package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Assignment is a pure function of the row id via md5 (stable across
  * runs, machines, partitionings, AND reproducible by any other engine —
  * unlike `rand(seed)`, which depends on partition layout). At 100 TB the
  * split is a codegen'd projection; writing `partitionBy(split)` gives
  * each consumer its slice by partition pruning.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's md5. */
  def hashBucket(id: Column, buckets: Int = 10): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets).cast("int")

  /** Named split assignment by cumulative bucket weights, e.g.
    * Seq("train" -> 8, "val" -> 1, "test" -> 1) over 10 buckets.
    */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[(String, Int)]): DataFrame = {
    val total = weights.map(_._2).sum
    val bucket = hashBucket(col(idCol), total)
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, w)) =>
        (when(bucket >= cum && bucket < cum + w, name).otherwise(acc), cum + w)
    }
    df.withColumn("split", expr0)
  }

  /** Deterministic fraction sample: keep ids whose bucket (out of 10k)
    * falls under fraction — same rows every run on any cluster.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), 10000) < (fraction * 10000).toInt)

  /** Stratified deterministic sampling: per-stratum keep fractions (the
    * quality-weighted downsampling step of a training-data mix). Same
    * md5-bucket mechanics as [[deterministicSample]], so the kept set is
    * a pure function of (id, stratum) — reproducible on any engine, and
    * a stratum's sample is a SUBSET of any larger fraction's sample
    * (bucket thresholds nest).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: Column,
      fractions: Seq[(String, Double)]
  ): DataFrame = {
    val bucket = hashBucket(col(idCol), 10000)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (name, f)) =>
      when(stratumCol === name, bucket < (f * 10000).toInt).otherwise(acc)
    }
    df.withColumn("stratum", stratumCol).filter(keep)
  }

  /** Token-budget shard packing: assign documents to training shards so
    * each shard holds ~`tokensPerShard` tokens. Documents are spread over
    * `buckets` independent packing streams by id hash (the parallel
    * dimension — each stream is one window partition, so packing scales
    * out with buckets), ordered deterministically by (md5, id) within a
    * stream, and cut greedily by running token count: a document starts a
    * new shard when its START offset crosses the budget. Shard id =
    * bucket * 2^32 + local shard index.
    */
  def packShards(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      tokensPerShard: Long,
      buckets: Int = 64
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = hashBucket(col(idCol), buckets).cast("long")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("bucket", bucket)
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("shard",
        (col("bucket") * lit(4294967296L) +
          ((col("_cum") - col(tokensCol)) / tokensPerShard).cast("long")).cast("long"))
      .drop("_cum")
  }
}
