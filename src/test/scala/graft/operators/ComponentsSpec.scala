package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive pairs merge into one component under the min label") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges (propagation crosses the full diameter)") {
    val chain = (1L until 9L).map(i => (i, i + 1)) // path 1-2-...-9, diameter 8
    val got = cc(chain)
    assert(got.values.toSet == Set(1L), s"all nodes must reach label 1: $got")
    assert(got.keySet == (1L to 9L).toSet)
  }

  test("label choice is the component minimum regardless of edge order") {
    val got = cc(Seq((5L, 4L), (3L, 5L), (4L, 2L)))
    assert(got == Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("a FAILED build releases every checkpoint it pinned") {
    import spark.implicits._
    val boom = udf((x: Long) => {
      if (x == 3L) throw new RuntimeException("injected edge failure"); x
    })
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      .withColumn("b", boom(col("b")))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    intercept[Exception] {
      Components.connectedComponents(edges, "a", "b")
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert(after == before,
      s"a thrown build must not strand checkpoint blocks: ${after.diff(before)}")
  }

  test("ensureComponents leaves the block manager exactly as it found it") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val path = java.nio.file.Files.createTempDirectory("graft-cc").toString + "/cc"
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // First call builds (iterating with localCheckpoints), later calls read.
    val out1 = Components.ensureComponents(spark, edges, "a", "b", path).collect()
    val afterBuild = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert(afterBuild == before,
      s"build stranded checkpoint RDDs: ${afterBuild.diff(before)}")
    (1 to 3).foreach { _ =>
      Components.ensureComponents(spark, edges, "a", "b", path).count()
    }
    val afterServe = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert(afterServe == before,
      s"repeated serving grew the block manager: ${afterServe.diff(before)}")
    assert(out1.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }
}
