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

  test("AQE splits a skewed scan-to-scan join at runtime (the fact-join shape)") {
    // The engine's skew strategy is layered: (1) Dedup.capDf removes the
    // quadratic stop-shingle keys with a broadcast anti-join (rows never
    // shuffle — see its doc: OptimizeSkewedJoin does NOT match joins with
    // an aggregate between sort and shuffle, so that shape must be
    // avoided, not trusted to AQE); (2) hash aggregates absorb
    // aggregation skew map-side (partial_ rows); (3) scan-to-scan shuffle
    // joins — q3/q5's lineitem⨝orders after the broadcast-hint fix — ARE
    // covered by AQE's skew rewrite, verified here at runtime with
    // test-sized thresholds; (4) the salted utilities above remain for
    // the pathological remainder.
    // an ISOLATED session (own SessionState/SQLConf on the shared
    // context): suites run concurrently in this JVM, and flipping
    // autoBroadcastJoinThreshold/advisory sizes on the shared session
    // would warp every plan a concurrently running plan-pin suite builds
    val spark = SkewSpec.this.spark.newSession()
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      // incompressible payload: shuffle MapStatus sizes are of compressed
      // blocks, and a constant payload compresses below the skew threshold
      val rows = (1 to 30000)
        .map(i => (if (i <= 27000) "hot" else s"k$i", i.toLong,
          rnd.alphanumeric.take(120).mkString))
        .toDF("key", "id", "p")
      val dim = (1 to 30000).map(i => (if (i <= 100) "hot" else s"k$i", i.toLong))
        .toDF("key", "tag")
        .filter(col("tag") === 1L || col("key") =!= "hot")
      val joined = rows.join(dim, Seq("key")).select(col("key"), col("p"), col("tag"))
      joined.collect() // execute THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
