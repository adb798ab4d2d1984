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
}
