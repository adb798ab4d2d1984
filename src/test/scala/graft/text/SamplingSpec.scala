package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    (1L to 1000L).toDF("id")
  }

  test("hash split is deterministic, total, and roughly proportioned") {
    val w = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val s1 = Sampling.hashSplit(df, "id", w).collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val s2 = Sampling.hashSplit(df, "id", w).collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(s1 == s2) // stable across runs
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test")) // total assignment
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 200)
  }

  test("deterministic sample is stable and close to the fraction") {
    val a = Sampling.deterministicSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size > 140 && a.size < 260)
    // monotone: a larger fraction strictly contains a smaller one
    val bigger = Sampling.deterministicSample(df, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger))
  }
}
