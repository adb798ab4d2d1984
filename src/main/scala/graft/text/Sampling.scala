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
}
