package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  // 10k rows, 90% on one hot key
  private def skewed = {
    import spark.implicits._
    (1 to 10000).map(i => (if (i <= 9000) "hot" else s"k${i % 50}", i.toLong))
      .toDF("key", "v")
  }

  test("saltedCount equals plain count per key") {
    val plain = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("hotKeys detects the dominant key") {
    val hot = Skew.hotKeys(skewed, col("key"), minShare = 0.5)
      .collect().map(_.getString(0))
    assert(hot.toSeq == Seq("hot"))
  }

  test("saltedJoin equals a plain left join row-for-row") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val left = skewed
    val plain = left.join(dim, left("key") === dim("k"), "left")
      .groupBy("key").agg(count(col("tag")).as("n"), first(col("tag"), true).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(left, dim, "key", "k")
      .groupBy("key").agg(count(col("tag")).as("n"), first(col("tag"), true).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
