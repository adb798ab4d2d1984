package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic constant-memory sketches: KMV (k-minimum-values)
  * distinct counting and bottom-k-sample percentiles.
  *
  * Spark's own `approx_count_distinct` / `percentile_approx` ride
  * internal HLL++/GK state that no other engine reproduces, so queries
  * built on them can only ever be rows-only checked. These sketches make
  * the opposite trade: the "randomness" is the engine's seeded xxhash64
  * (exactly replayable — see [[graft.functions.HashReplaySql]]), the
  * estimators are plain arithmetic with a pinned operation order, and no
  * libm call (ln/log2, which differ across platforms in the last ulp)
  * appears anywhere — so the DuckDB oracle matches the estimates
  * BIT-EXACTLY, not within tolerance.
  *
  * Scale shape: both sketches reduce to a per-group top-k by hash order.
  * The window form here sorts each group once (the same cost class as
  * the distinct it replaces); a streaming deployment would swap in a
  * bounded k-heap Aggregator without changing the estimate, since the
  * k smallest hashes are order-free.
  */
object Sketches {

  /** Signed column that orders like the UNSIGNED value of xxhash64(c):
    * flipping the sign bit maps unsigned order onto signed order, so
    * `ORDER BY u` ranks hashes uniformly in [0, 2^64).
    */
  private def unsignedOrderHash(c: Column): Column =
    xxhash64(c).bitwiseXOR(lit(Long.MinValue))

  private val Two63 = 9.223372036854775808e18 // exactly 2^63 in double
  private val Two64 = 1.8446744073709551616e19 // exactly 2^64 in double

  /** Per-`group` KMV distinct estimate of `key` plus interpolated
    * percentiles of `value` over a deterministic bottom-`kSample` row
    * sample (sampled by hash of `sampleId`). Output: (group,
    * kmv_distinct, p&lt;q&gt;... ) — one row per group.
    *
    * KMV: the k-th smallest of n uniform hashes sits near k/n of the
    * range, so n̂ = (k−1) / (v_k / 2^64); with fewer than k distinct
    * hashes the sketch holds them all and the count is exact.
    * Percentiles: exact interpolated order statistics OF THE SAMPLE —
    * pos = q·(m−1), linear between the two neighbouring sample values.
    */
  def eventSketch(
      df: DataFrame,
      group: Column,
      key: Column,
      value: Column,
      sampleId: Column,
      kDistinct: Int,
      kSample: Int,
      quantiles: Seq[Double]
  ): DataFrame = {
    require(kDistinct >= 2 && kSample >= 2, "sketch sizes must be >= 2")

    // ---- KMV distinct over distinct (group, hash) ----
    val hashed = df.select(group.as("g"), unsignedOrderHash(key).as("u")).distinct()
    val hw = Window.partitionBy(col("g")).orderBy(col("u"))
    val kmv = hashed.withColumn("r", row_number().over(hw))
      .groupBy(col("g"))
      .agg(max(col("r")).as("nh"),
        max(when(col("r") === kDistinct, col("u"))).as("vk"))
      .select(col("g"),
        when(col("nh") < kDistinct, col("nh").cast("double"))
          .otherwise(lit((kDistinct - 1).toDouble) /
            ((col("vk").cast("double") + lit(Two63)) / lit(Two64)))
          .as("kmv_distinct"))

    // ---- bottom-k row sample + interpolated percentiles ----
    val sw = Window.partitionBy(col("g"))
      .orderBy(unsignedOrderHash(col("sid")), col("sid"))
    val sampled = df.select(group.as("g"), value.as("v"), sampleId.as("sid"))
      .withColumn("sr", row_number().over(sw))
      .filter(col("sr") <= kSample)
    val vw = Window.partitionBy(col("g")).orderBy(col("v"))
    val ranked = sampled
      .withColumn("vr", row_number().over(vw))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("g"))))
    val pctCols = quantiles.map { q =>
      val pos = lit(q) * (col("m") - 1).cast("double")
      val lo = floor(pos)
      val frac = pos - lo
      val vLo = max(when(col("vr") === lo + 1, col("v")))
      val vHi = max(when(col("vr") === least(lo + 2, col("m").cast("double")), col("v")))
      // frac is constant within a group; max() is the cross-engine-safe
      // "any value" (DuckDB's first() is order-dependent)
      (vLo + (vHi - vLo) * max(frac))
        .as(s"p${(q * 100).round}_value")
    }
    val pcts = ranked.groupBy(col("g")).agg(pctCols.head, pctCols.tail: _*)

    kmv.join(pcts, Seq("g"))
  }
}
