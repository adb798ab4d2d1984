package graft

/** Pins the driver contract itself: `entry` is the sf0.001 smoke the
  * driver runs before anything else (rows > 0, non-empty schema), and the
  * adapter must expose exactly the catalog and oracle maps Verify dumps —
  * a drifted adapter would pass every other suite and still fail the
  * round gate.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on the sf0.001 smoke dataset") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.nonEmpty, "entry must have a schema")
    assert(df.count() > 0, "driver smoke-checks rows > 0 on sf0.001")
  }

  test("the adapter exposes the catalog and oracle maps unchanged") {
    assert(SparkEntry.queries.keySet == Queries.catalog.keySet)
    assert(SparkEntry.oracleSql.keySet == Queries.oracle.keySet)
  }
}
