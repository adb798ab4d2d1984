package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  // SparkSpec.session is shared across the whole test JVM: always detach
  // the listener, or every later suite's events flow through it (the
  // lifetime leak QueryMetrics.uninstall exists to prevent)
  private def withListener(body: QueryMetricsListener => Unit): Unit = {
    val l = QueryMetrics.install(spark)
    try body(l) finally QueryMetrics.uninstall(spark, l)
  }

  test("listener credits task time, input rows and shuffle bytes to the measured scope") {
    withListener { l =>
      val dir = "/root/testdata/sf0.001"
      val expected = spark.read.parquet(s"$dir/region.parquet").count()

      // a scan + aggregate: input records come from the parquet scan, the
      // groupBy forces a (tiny) shuffle write
      QueryMetrics.measure(spark, "probe_region") {
        spark.read.parquet(s"$dir/region.parquet")
          .groupBy(col("r_regionkey")).count().collect()
      }
      val s = QueryMetrics.settled(l, "probe_region")
        .getOrElse(fail("no metrics credited to the scope"))
      assert(s.tasks >= 1, "at least one task must have run")
      assert(s.inputRecords == expected,
        s"scan rows ${s.inputRecords} must equal table rows $expected")
      assert(s.shuffleWriteBytes > 0, "the aggregate exchange must register shuffle writes")
      assert(s.taskTimeMs >= 0)

      // work outside any scope is not credited
      spark.read.parquet(s"$dir/nation.parquet").count()
      val after = QueryMetrics.settled(l, "probe_region").get
      assert(after.inputRecords == expected, "unscoped jobs must not leak into the scope")
    }
  }

  test("two scopes attribute independently") {
    withListener { l =>
      val dir = "/root/testdata/sf0.001"
      QueryMetrics.measure(spark, "scope_a") {
        spark.read.parquet(s"$dir/region.parquet").count()
      }
      QueryMetrics.measure(spark, "scope_b") {
        spark.read.parquet(s"$dir/nation.parquet").count()
      }
      val a = QueryMetrics.settled(l, "scope_a").get
      val b = QueryMetrics.settled(l, "scope_b").get
      assert(a.inputRecords == 5L, s"region is 5 rows, got ${a.inputRecords}")
      assert(b.inputRecords == 25L, s"nation is 25 rows, got ${b.inputRecords}")
    }
  }
}
