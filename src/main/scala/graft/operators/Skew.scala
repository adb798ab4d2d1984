package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB fact-table cases AQE can't
  * always save: a handful of keys holding a large share of rows (hot
  * objects, hot pulses, boilerplate shingles).
  *
  *  - [[saltedCount]]: two-stage aggregation — partial counts on
  *    (key, salt) spread the hot key over `salts` reducers, a cheap
  *    second stage merges the partials. For algebraic aggregates only.
  *  - [[saltedJoin]]: replicate the (small) right side `salts` times and
  *    salt the left randomly, so one hot key's rows land on `salts`
  *    tasks instead of one.
  *  - [[hotKeys]]: sampled detector used to decide when to bother.
  */
object Skew {

  /** Approximate hot keys: keys whose sampled share exceeds `minShare`.
    * The sample total is the SUM of the grouped counts — derived with a
    * 1-row broadcast onto the grouped result (the same COUNT-plus-page
    * fusion pattern as Pagination), not a separate `count()` job that
    * would re-scan the sample a second time.
    */
  def hotKeys(df: DataFrame, key: Column, minShare: Double = 0.01,
      fraction: Double = 0.05, seed: Long = 42L): DataFrame = {
    val counts = df.sample(fraction, seed).groupBy(key.as("key")).count()
    val total = counts.agg(greatest(coalesce(sum(col("count")), lit(0L)), lit(1L)).as("_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("count") >= lit(minShare) * col("_total"))
      .select(col("key"), (col("count") / col("_total")).as("sampled_share"))
  }

  /** Two-stage salted count per key. Output: (key, n). */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("n"))

  /** Salted equi-join of a skewed-left frame against a small right frame.
    * Right side is exploded `salts` times (stays broadcast-sized for
    * dimension tables); left rows get a random salt, so a hot key fans
    * out over `salts` tasks. Result equals `left.join(right, leftKey ===
    * rightKey, "left")` row-for-row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int = 16): DataFrame = {
    // pmod is already non-negative for a negative dividend — no
    // (x % n + n) % n dance needed (that idiom repairs the signed `%`)
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(broadcast(saltedRight),
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"), "left")
      .drop("_salt")
  }
}
