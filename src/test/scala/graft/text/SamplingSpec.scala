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

  test("stratified sample respects per-stratum fractions and nests across fractions") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "k")
    val kept = Sampling.stratifiedSample(docs, "id", col("k"),
        Seq("a" -> 1.0, "b" -> 0.2))
      .collect().map(r => (r.getLong(0), r.getAs[String]("stratum")))
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum("a") == 500, "fraction 1.0 keeps the whole stratum")
    assert(byStratum("b") > 60 && byStratum("b") < 140, s"~20% of 500: ${byStratum("b")}")
    // nesting: the 0.2 'b' sample is a subset of the 0.5 'b' sample
    val b02 = kept.filter(_._2 == "b").map(_._1).toSet
    val b05 = Sampling.stratifiedSample(docs, "id", col("k"), Seq("b" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    assert(b02.subsetOf(b05))
  }

  test("packShards: every shard except a stream's last holds >= the token budget at its cut") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, 10L + i % 90)).toDF("id", "toks")
    val packed = Sampling.packShards(docs, "id", "toks", tokensPerShard = 500L, buckets = 4)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard"), r.getAs[Long]("toks")))
    // shards are contiguous per bucket and sized near the budget: a shard
    // spans from its predecessor's end (≤ one doc past the boundary) to
    // its own last doc's end (≥ the next boundary), so every non-final
    // shard holds within one max-doc of the budget on either side
    val maxDoc = 99L
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val byShard = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val last = byShard.keys.max
      byShard.filter(_._1 != last).foreach { case (sh, tokens) =>
        assert(tokens >= 500L - (maxDoc - 1), s"non-final shard $sh too small: $tokens")
        assert(tokens < 500L + maxDoc, s"shard $sh overshoots by more than one doc: $tokens")
      }
    }
    // deterministic across runs
    def run() = Sampling.packShards(docs, "id", "toks", 500L, buckets = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"))).toSet
    assert(run() == run())
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
