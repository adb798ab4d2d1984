package graft

/** Physical-plan regression guards: the optimizations the engine relies
  * on at 100 TB must be visible in the plan, not assumed. Each assertion
  * pins a property `.explain` shows today so a future refactor that
  * silently loses pushdown, broadcast, or top-k pushdown fails here.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Queries.catalog(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter reaches the parquet scan; unused columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan should not read join keys q1 never uses")
    assert(p.contains("HashAggregate"))
  }

  test("q3: dimension sides broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("q3_topk")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"), "no shuffle join should appear for dim joins")
  }

  test("records page: pulse-range predicate sits at the scan, keyset above the window") {
    val p = plan("be_records_page")
    assert(p.contains("PushedFilters: [IsNotNull(ts)]"))
    assert(p.contains("3600000000000) >= 473500"), "derived pulse bound must reach the scan filter")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("ann queries: vector math is native expressions, not UDFs") {
    val p = plan("ann_topk") + plan("dd_embed")
    assert(p.contains("vec_dot") || p.contains("VectorKernels") || p.contains("vec_norm"))
    assert(!p.contains("ScalaUDF"), "no UDF should appear in vector plans")
  }

  test("text expressions stay native in the plan") {
    val p = plan("txt_fingerprint")
    assert(p.contains("fnv_fingerprint"))
    assert(!p.contains("ScalaUDF"))
  }

  test("dedup exact: partial aggregation before the exchange") {
    val p = plan("dd_exact")
    assert(p.contains("partial_"), "map-side combine must be present")
  }

  test("exporter next: single-pulse side broadcast, no cartesian anywhere") {
    val p = plan("be_exporter_next")
    assert(!p.contains("CartesianProduct"))
  }
}
