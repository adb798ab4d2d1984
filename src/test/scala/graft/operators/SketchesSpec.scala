package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy and branch invariants for the deterministic sketches. The
  * bit-exactness of the estimates themselves is the correctness gate's
  * job (ev_sketch_det replays in DuckDB); here we bound the ESTIMATOR
  * against ground truth on the real testdata.
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def events = graft.model.Domain.events(spark, dir)

  private def sketch(kDistinct: Int) =
    Sketches.eventSketch(events, group = col("event_type"),
      key = col("user_id"), value = col("value"), sampleId = col("event_id"),
      kDistinct = kDistinct, kSample = 256, quantiles = Seq(0.5, 0.95))

  test("KMV estimate lands within the k=32 error envelope of exact distinct") {
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch(32).collect().foreach { r =>
      val (g, est) = (r.getString(0), r.getDouble(1))
      val n = exact(g).toDouble
      // KMV relative stderr ≈ 1/sqrt(k-2) ≈ 0.18; 3σ bound
      assert(math.abs(est - n) / n <= 0.55,
        s"$g: KMV estimate $est too far from exact $n")
    }
  }

  test("KMV with k above the true cardinality is exact") {
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch(kDistinct = 1024).collect().foreach { r =>
      assert(r.getDouble(1) === exact(r.getString(0)).toDouble,
        s"${r.getString(0)}: below-k group must count exactly")
    }
  }

  test("a group whose values are all null yields null percentiles, not a runtime error") {
    import spark.implicits._
    val df = Seq(("g1", 1L, Option.empty[Double], Option.empty[Long]),
        ("g1", 2L, None, None),
        ("g2", 3L, Some(5.0), Some(30L)))
      .toDF("grp", "key", "value", "sample_id")
    val out = Sketches.eventSketch(df, group = col("grp"), key = col("key"),
        value = col("value"), sampleId = col("sample_id"),
        kDistinct = 8, kSample = 8, quantiles = Seq(0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(out("g1").isEmpty, "empty sample must surface as NULL (the oracle's answer)")
    assert(out("g2").contains(5.0))
  }

  test("a NULL group key is a real group, not a dropped row") {
    import spark.implicits._
    // both aggregates emit a row for the NULL group; the join between
    // them is null-safe (<=>), so the group survives to the output — a
    // plain equi-join on the key would silently drop it
    val df = Seq((Option("g1"), 1L, 2.0, 10L),
        (Option.empty[String], 2L, 4.0, 20L),
        (Option.empty[String], 3L, 6.0, 30L))
      .toDF("grp", "key", "value", "sample_id")
    val out = Sketches.eventSketch(df, group = col("grp"), key = col("key"),
        value = col("value"), sampleId = col("sample_id"),
        kDistinct = 8, kSample = 8, quantiles = Seq(0.5))
      .collect()
    assert(out.length == 2, s"NULL group must survive: ${out.toSeq}")
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getDouble(1) === 2.0, "two distinct keys under the NULL group")
    assert(nullRow.getDouble(2) === 5.0, "p50 of {4.0, 6.0} interpolates to 5.0")
  }

  test("sampled percentiles are ordered and inside the value range") {
    val bounds = events.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    sketch(32).collect().foreach { r =>
      val (g, p50, p95) = (r.getString(0), r.getDouble(2), r.getDouble(3))
      val (lo, hi) = bounds(g)
      assert(p50 <= p95, s"$g: p50 $p50 > p95 $p95")
      assert(p50 >= lo && p95 <= hi, s"$g: percentiles escape [$lo, $hi]")
    }
  }
}
